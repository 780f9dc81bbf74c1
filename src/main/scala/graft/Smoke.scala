package graft
import org.apache.spark.sql.SparkSession

/** Drives SparkEntry.entry the way the driver's smoke check does
  * (flagship query on sf0.001, asserts rows > 0) and prints the result.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"SMOKE entry rows=${rows.length}")
    rows.take(10).foreach(r => println(s"SMOKE $r"))
    assert(rows.nonEmpty, "entry() returned 0 rows")
    spark.stop()
  }
}
