package graft.ops

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** E-468: DataSketches KLL quantile sketches — the mergeable quantile
  * counterpart of the exact A-8 ordered-set aggregates, and the third
  * leg of the incremental-rollup sketch family (HLL distinct E-81,
  * approx_top_k frequency A-16). Exact percentiles are NOT mergeable;
  * a 100 TB incremental rollup stores per-slice KLL state and merges.
  * Pinned properties (the SketchSpec pattern):
  *
  *  - accuracy: merged p50/p95 within 1% of the exact percentile_cont
  *    values (k=800 bounds rank error at ~0.35% @99% conf — an order
  *    of magnitude inside the gate on this distribution, so the
  *    randomized compaction can't flake the bound);
  *  - merge soundness: the slice→merge path lands within 1% of the
  *    single-pass sketch (merging re-compacts, so not bit-exact —
  *    same caveat as the HLL dense-mode union bound).
  */
class KllSketchSpec extends AnyFunSuite with SparkFixture {

  test("KLL merged p50/p95 within 1% of exact; slice-merge within 1% of single-pass") {
    val li = Tables.table(spark, sf001, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice").cast("double").as("price"))

    val exact = li.agg(
      expr("percentile_cont(0.5) within group (order by price)"),
      expr("percentile_cont(0.95) within group (order by price)"))
      .collect()(0)
    val (x50, x95) = (exact.getDouble(0), exact.getDouble(1))

    val single = li.agg(expr("kll_sketch_agg_double(price, 800)").as("sk"))
      .select(expr("kll_sketch_get_quantile_double(sk, 0.5)"),
        expr("kll_sketch_get_quantile_double(sk, 0.95)"))
      .collect()(0)
    val (s50, s95) = (single.getDouble(0), single.getDouble(1))

    val merged = li.withColumn("slice", pmod(col("l_orderkey"), lit(8)))
      .groupBy("slice").agg(expr("kll_sketch_agg_double(price, 800)").as("sk"))
      .agg(expr("kll_merge_agg_double(sk, 800)").as("mk"))
      .select(expr("kll_sketch_get_quantile_double(mk, 0.5)"),
        expr("kll_sketch_get_quantile_double(mk, 0.95)"))
      .collect()(0)
    val (m50, m95) = (merged.getDouble(0), merged.getDouble(1))

    assert(math.abs(m50 - x50) / x50 < 0.01, s"merged p50 $m50 vs exact $x50 drifts > 1%")
    assert(math.abs(m95 - x95) / x95 < 0.01, s"merged p95 $m95 vs exact $x95 drifts > 1%")
    assert(math.abs(m50 - s50) / s50 < 0.01, s"slice-merge p50 $m50 vs single-pass $s50 drifts > 1%")
    assert(math.abs(m95 - s95) / s95 < 0.01, s"slice-merge p95 $m95 vs single-pass $s95 drifts > 1%")
  }
}
