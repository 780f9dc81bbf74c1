package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 extension queries, batch 121: the mergeable QUANTILE sketch —
  * the third leg of the incremental-rollup sketch family (HLL distinct
  * E-81, approx_top_k frequency A-16, and now KLL rank/quantile state).
  * An exact percentile (A-8) is not mergeable: a 100 TB incremental
  * rollup stores per-slice KLL sketches and merges them, never re-sorts
  * raw values. Spark 4's DataSketches KLL surface
  * (`kll_sketch_agg_double` / `kll_merge_agg_double` /
  * `kll_sketch_get_quantile_double`) provides the state; this query
  * pins the discipline: slice → sketch → merge → query, audited in the
  * SAME row against the exact ordered-set aggregate.
  */
object ExtensionQueries121 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-468 mergeable KLL quantile sketch audit ----------------------------------
  // Per return flag: 8 hash-slices each build a KLL(k=800) sketch of
  // l_extendedprice, merged with kll_merge_agg_double — exactly the
  // shape an incremental rollup stores (the slice key stands in for a
  // file/partition/day). The merged sketch's p50/p95 are then audited
  // against the exact percentile_cont values computed in the same
  // query. OUTPUT contract (hash-stable by construction): the exact
  // percentiles (deterministic ordered-set aggregates, rounded 4 dp)
  // plus ok50/ok95 booleans gating the merged sketch IN RANK SPACE:
  // the exact pXX must lie between the sketch's quantiles at ranks
  // XX ± 0.01 (kll_sketch_get_rank needs a foldable rank, so the gate
  // brackets with two get_quantile calls — equivalent by monotonicity).
  // KLL compaction is randomized, so the estimate itself is not
  // hash-stable — but the k=800 guarantee is a RANK-error bound
  // (~0.35% at 99% conf), so a ±1% rank bracket is ~3× headroom
  // INDEPENDENT of the value distribution's local density (a
  // value-space gate would inherit the fixture's density around the
  // quantile — round-9 advisor note). The value-space accuracy itself
  // is pinned in KllSketchSpec (the SketchSpec pattern: estimate
  // accuracy + slice-merge ≈ single-pass soundness).
  def extKll(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"),
        col("l_extendedprice").cast("double").as("price"))
    val sliced = li
      .withColumn("slice", pmod(col("l_orderkey"), lit(8)))
      .groupBy("l_returnflag", "slice")
      .agg(expr("kll_sketch_agg_double(price, 800)").as("sk"))
    val merged = sliced
      .groupBy("l_returnflag")
      .agg(expr("kll_merge_agg_double(sk, 800)").as("sk"))
      .select(col("l_returnflag"),
        expr("kll_sketch_get_quantile_double(sk, 0.49)").as("e49"),
        expr("kll_sketch_get_quantile_double(sk, 0.51)").as("e51"),
        expr("kll_sketch_get_quantile_double(sk, 0.94)").as("e94"),
        expr("kll_sketch_get_quantile_double(sk, 0.96)").as("e96"))
    val exact = li
      .groupBy("l_returnflag")
      .agg(
        expr("percentile_cont(0.5) within group (order by price)").as("x50"),
        expr("percentile_cont(0.95) within group (order by price)").as("x95"),
        count(lit(1)).as("n"))
    exact.join(merged, Seq("l_returnflag"))
      .select(col("l_returnflag"),
        round(col("x50"), 4).as("p50"),
        round(col("x95"), 4).as("p95"),
        (col("x50") >= col("e49") && col("x50") <= col("e51")).as("ok50"),
        (col("x95") >= col("e94") && col("x95") <= col("e96")).as("ok95"),
        col("n"))
      .orderBy("l_returnflag")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_kll" -> (extKll _))

  // E-468 oracle: the exact ordered-set aggregates; the ok flags are
  // literal true — the sketch side must land inside the 1% RANK gate or
  // the hash mismatches (the tolerance-gated sketch-row discipline).
  val oracleSql: Map[String, String] = Map(
    "ext_kll" ->
      """select l_returnflag,
        |  round(percentile_cont(0.5) within group
        |    (order by cast(l_extendedprice as double)), 4) p50,
        |  round(percentile_cont(0.95) within group
        |    (order by cast(l_extendedprice as double)), 4) p95,
        |  true ok50, true ok95, cast(count(*) as bigint) n
        |from lineitem group by l_returnflag order by l_returnflag""".stripMargin)
}
