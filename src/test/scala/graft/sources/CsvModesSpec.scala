package graft.sources

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S-18 companion to q115_badcsv: the PERMISSIVE side of malformed-CSV
  * handling — bad lines are quarantined into the corrupt-record
  * column, not silently dropped, and FAILFAST refuses the file.
  */
class CsvModesSpec extends AnyFunSuite with SparkFixture {

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("csv_modes").toString
    val clean = graft.Tables.table(spark, sf0001, "nation")
      .select(concat_ws(",", col("n_nationkey"), col("n_name"),
        col("n_regionkey"))).as[String].collect()
    spark.createDataset(
        clean.toSeq ++ Seq("not,a", "x,y,z", "99,BAD,notanint"))
      .coalesce(1).write.mode("overwrite").text(d)
    d
  }

  private val schema =
    "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT, _corrupt_record STRING"

  test("PERMISSIVE quarantines exactly the 3 crafted lines, keeps all clean rows") {
    val df = spark.read.schema(schema).option("mode", "PERMISSIVE").csv(dir)
      .cache() // corrupt-record accounting needs the full row materialized
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 3)
    assert(df.filter(col("_corrupt_record").isNull).count() == 25)
    df.unpersist()
  }

  test("FAILFAST throws on the first malformed line") {
    intercept[org.apache.spark.SparkException] {
      spark.read
        .schema("n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT")
        .option("mode", "FAILFAST").csv(dir).collect()
    }
  }
}
