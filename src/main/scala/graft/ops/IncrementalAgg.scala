package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (E-74) — the materialized-view
  * pattern: keep a MERGEABLE per-key state (count, sum, min, max)
  * instead of the finished metrics, fold each new batch into it, and
  * derive the metrics (avg = sum∕count, …) only at read time. Because
  * every component is associative+commutative, `merge(state(old),
  * state(delta)) ≡ state(old ∪ delta)` — the algebra Spark itself uses
  * for partial aggregation, lifted to cross-batch persistence. This is
  * how a 100 TB daily rollup costs one pass over the DAY, not the
  * history: the state table is keys-sized, the delta aggregation is
  * map-side combined, and the merge is a keys-sized shuffle.
  *
  * Non-mergeable metrics (median, distinct count) need sketches in the
  * state (t-digest, HLL) — same pattern, approximate components.
  */
object IncrementalAgg {

  /** Aggregate `df` to the mergeable state: (k, n, s, mn, mx). */
  def state(df: DataFrame, key: Column, value: Column): DataFrame =
    df.groupBy(key.as("k"))
      .agg(count(lit(1)).as("n"), sum(value).as("s"),
        min(value).as("mn"), max(value).as("mx"))

  /** Fold another state into this one (outer on keys — new keys appear,
    * untouched keys pass through).
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("k")
      .agg(sum("n").as("n"), sum("s").as("s"),
        min("mn").as("mn"), max("mx").as("mx"))

  /** Derive the read-time metrics from a state. */
  def metrics(state: DataFrame): DataFrame =
    state.select(col("k"), col("n"), col("s"),
      (col("s") / col("n")).as("avg"), col("mn"), col("mx"))
}
