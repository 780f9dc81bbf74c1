package graft.ops

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** E-81: Datasketches HLL distinct-count sketches — the mergeable
  * approximate counterpart of IncrementalAgg's exact state (count
  * distinct is NOT mergeable exactly; the sketch is what a 100 TB
  * incremental rollup actually stores). Two properties:
  *
  *  - accuracy: estimate within 5% of the exact distinct count;
  *  - merge soundness: per-register max commutes, so a union of
  *    per-slice sketches estimates what the single-pass sketch does.
  *    NOT bit-exact here: at this cardinality the single-pass sketch
  *    still sits in the (near-exact) sparse/coupon representation,
  *    while hll_union_agg promotes to the dense HLL array and
  *    re-estimates — measured 1488 vs 1492 on this fixture. The merge
  *    bound is therefore the DENSE-mode error bound, pinned at 1%.
  */
class SketchSpec extends AnyFunSuite with SparkFixture {

  test("hll estimate within 5% of exact; slice-union equals single-pass exactly") {
    val o = Tables.table(spark, sf001, "orders")
    val exact = o.select(countDistinct("o_custkey")).collect()(0).getLong(0)
    val single = o
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(o_custkey))"))
      .collect()(0).getLong(0)
    assert(math.abs(single - exact).toDouble / exact < 0.05,
      s"estimate $single vs exact $exact drifts > 5%")
    val merged = o.withColumn("slice", col("o_orderkey") % 4)
      .groupBy("slice").agg(expr("hll_sketch_agg(o_custkey)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))"))
      .collect()(0).getLong(0)
    assert(math.abs(merged - single).toDouble / single < 0.01,
      s"sketch union ($merged) drifts > 1% from single-pass ($single)")
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"merged estimate $merged vs exact $exact drifts > 5%")
  }
}
