package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the round-6 batch-13 queries; DuckDB value equality is
  * the ext_* contracts' job.
  */
class Batch13Spec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  test("velocity slope matches the closed form on a crafted series") {
    // weekly counts 1,2,3,4 over weeks 0..3 -> slope exactly 1
    val tmp = java.nio.file.Files.createTempDirectory("vel").toString
    val rows = for (wkI <- 0 to 3; i <- 0 until (wkI + 1))
      yield (7L, wkI * 7 + (i % 7))
    rows.toDF("user_id", "dd")
      .select(col("user_id"),
        (expr("timestamp '2024-01-01 00:00:00'") +
          expr("make_interval(0,0,0,dd,0,0,0)")).as("ts"),
        lit("click").as("event_type"), lit(1.0).as("value"),
        monotonically_increasing_id().as("event_id"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = ExtensionQueries13.extVelocity(spark, tmp).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Double]("slope") == 1.0)
  }

  test("tenure mix shares sum to one over the four buckets") {
    val rows = ExtensionQueries13.extTenureMix(spark, sf001).collect()
    assert(rows.map(_.getAs[Long]("tenure_wk")).forall(b => b >= 0 && b <= 3))
    val total = rows.map(_.getAs[Double]("event_share")).sum
    assert(math.abs(total - 1.0) < 1e-6, s"shares sum to $total")
  }

  test("mix drift is a bounded series over consecutive weeks") {
    val rows = ExtensionQueries13.extMixDrift(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getAs[Double]("jsd_next")
      assert(j >= 0.0 && j <= math.log(2) + 1e-9)
    }
  }

  test("behavioral entropy is bounded by ln(n_types)") {
    val rows = ExtensionQueries13.extSeqEntropy(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy")
      val k = r.getAs[Long]("n_types")
      assert(h >= -1e-9 && h <= math.log(k.toDouble) + 1e-6)
    }
  }

  test("power-law alpha is a finite positive exponent") {
    val r = ExtensionQueries13.extPowerLaw(spark, sf001).collect()(0)
    val a = r.getAs[Double]("alpha")
    assert(a > 1.0 && a < 10.0, s"alpha=$a implausible")
    assert(r.getAs[Long]("n_users") > 0)
  }
}
