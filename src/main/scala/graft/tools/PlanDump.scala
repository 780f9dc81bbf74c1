package graft.tools

import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` for the named driver-contract queries to
  * <outDir>/<name>_<tag>.txt — the before/after plan evidence the
  * optimization rounds commit under plans/rNN/. Dev tool, not part of the
  * driver contract.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.PlanDump plans/r13 before b1,b2,..."
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(outDir, tag, namesCsv) = args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val names = namesCsv.split(",").map(_.trim).filter(_.nonEmpty)
    for (n <- names) {
      val fn = graft.SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query $n"))
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${n}_$tag.txt"), plan)
      println(s"PLANDUMP $n -> $outDir/${n}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
