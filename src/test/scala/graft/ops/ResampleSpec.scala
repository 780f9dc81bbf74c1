package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** ops.Resample grid + forward-fill semantics on a hand-checked series. */
class ResampleSpec extends AnyFunSuite with SparkFixture {

  private def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")

  test("gridForwardFill densifies the span and carries values forward") {
    val obs = spark.createDataFrame(Seq(
      (1L, ts(0), 1.0), (1L, ts(3), 4.0),   // gap at hours 1, 2
      (2L, ts(5), 9.0)                       // single point
    )).toDF("k", "h", "v")
    val out = Resample.gridForwardFill(obs, "k", "h", "v", expr("interval 1 hour"))
      .orderBy("k", "h").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getHours, r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1L, 0, 1.0), (1L, 1, 1.0), (1L, 2, 1.0), (1L, 3, 4.0),
      (2L, 5, 9.0)))
  }

  test("gridInterpolate blends gaps linearly and clamps one-sided edges") {
    val obs = spark.createDataFrame(Seq(
      (1L, ts(0), 1.0), (1L, ts(3), 4.0),   // gap hours 1,2 -> 2.0, 3.0
      (2L, ts(4), 5.0), (2L, ts(6), 9.0)    // gap hour 5 -> 7.0
    )).toDF("k", "h", "v")
    val out = Resample.gridInterpolate(obs, "k", "h", "v", expr("interval 1 hour"))
      .orderBy("k", "h").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getHours, r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1L, 0, 1.0), (1L, 1, 2.0), (1L, 2, 3.0), (1L, 3, 4.0),
      (2L, 4, 5.0), (2L, 5, 7.0), (2L, 6, 9.0)))
    // observed slots always keep their exact value (interp is identity there)
    assert(out.filter(o => o._1 == 1L && o._2 == 3).head._3 == 4.0)
  }

  test("one output row per grid slot, count = span/step + 1 per key") {
    val obs = spark.createDataFrame(
      (0 until 10).map(i => (1L, ts(i * 2), i.toDouble))).toDF("k", "h", "v")
    val out = Resample.gridForwardFill(obs, "k", "h", "v", expr("interval 1 hour"))
    assert(out.count() == 19) // hours 0..18 inclusive
    assert(out.groupBy("k", "h").count().filter(col("count") > 1).count() == 0)
  }
}
