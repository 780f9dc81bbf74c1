package graft.ops

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the bucket-expansion band join and the floor-arithmetic
  * histogram (value equality vs DuckDB is ext_band_join/ext_histogram's
  * job; these pin the algebra on adversarial inputs).
  */
class BandJoinSpec extends AnyFunSuite with SparkFixture {

  test("joinWithin equals the naive band join, each pair exactly once") {
    val rng = new scala.util.Random(5L)
    // values clustered tightly around bucket boundaries to stress the
    // ±1 expansion (boundary multiples of the width, ± small jitter)
    val vals = (0 until 300).map { i =>
      (i.toLong, rng.nextInt(10) * 7.0 + (rng.nextDouble() - 0.5))
    }
    val df = spark.createDataFrame(vals).toDF("id", "v")
    val a = df.select(col("id").as("id_a"), col("v").as("v_a"))
    val b = df.select(col("id").as("id_b"), col("v").as("v_b"))
    for (width <- Seq(0.5, 1.0, 7.0)) {
      val banded = BandJoin.joinWithin(a, col("v_a"), b, col("v_b"), width,
          col("id_a") < col("id_b"))
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      val naive = a.crossJoin(b)
        .filter(abs(col("v_a") - col("v_b")) <= width && col("id_a") < col("id_b"))
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(banded.length == banded.distinct.length, s"duplicate pairs at width=$width")
      assert(banded.toSet == naive.toSet, s"pair set mismatch at width=$width")
    }
  }

  test("band join plans as an equi-join, not a nested loop") {
    val o = Tables.table(spark, sf0001, "orders")
    val a = o.select(col("o_orderkey").as("ok_a"), col("o_totalprice").as("tp_a"))
    val b = o.select(col("o_orderkey").as("ok_b"), col("o_totalprice").as("tp_b"))
    val plan = BandJoin.joinWithin(a, col("tp_a"), b, col("tp_b"), 1000.0,
      col("ok_a") < col("ok_b")).queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"band join degenerated to a nested loop:\n${plan.take(1500)}")
  }

  test("histogram covers all rows, buckets bounded, edges clamp") {
    val df = spark.createDataFrame(
      Seq((1L, -5.0), (2L, 0.0), (3L, 49999.9), (4L, 50000.0),
        (5L, 599999.9), (6L, 600000.0), (7L, 1e9))).toDF("id", "v")
    val h = Histogram.histogram(df, "v", 0.0, 600000.0, 12).collect()
    assert(h.map(_.getLong(3)).sum == 7)
    assert(h.forall(r => r.getLong(0) >= 1 && r.getLong(0) <= 12))
    val byBucket = h.map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(byBucket(1L) == 3)  // -5 (clamped), 0, 49999.9
    assert(byBucket(2L) == 1)  // 50000 opens bucket 2
    assert(byBucket(12L) == 3) // 599999.9 + two clamped highs
  }
}
