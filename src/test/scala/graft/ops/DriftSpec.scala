package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DriftSpec extends AnyFunSuite with SparkFixture {

  test("ks: hand-computable two-sample statistic") {
    import spark.implicits._
    // ref = {1,2,3,4}, cur = {3,4,5,6}: ECDF gap peaks at v=2
    // (F_ref=0.5, F_cur=0) and stays 0.5 through v=4; argmax pins the
    // SMALLEST value attaining it.
    val df = Seq(
      (1.0, true), (2.0, true), (3.0, true), (4.0, true),
      (3.0, false), (4.0, false), (5.0, false), (6.0, false))
      .toDF("v", "r")
    val row = Drift.ks(df, col("v"), col("r")).collect()(0)
    assert(row.getLong(0) == 4 && row.getLong(1) == 4)
    assert(row.getDouble(2) == 2.0, s"argmax value ${row.getDouble(2)}")
    assert(row.getDouble(3) == 0.5)
  }

  test("ks: identical samples give D = 0") {
    import spark.implicits._
    val df = Seq((1.0, true), (2.0, true), (1.0, false), (2.0, false))
      .toDF("v", "r")
    val row = Drift.ks(df, col("v"), col("r")).collect()(0)
    assert(row.getDouble(3) == 0.0)
  }
}
