package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for the cases AQE's runtime skew-join split
  * doesn't reach (e.g. a broadcast-ineligible dimension with a few hot
  * keys, or aggregations over Zipfian keys like head words in a
  * corpus). Both helpers are semantics-preserving (property-tested
  * equal to the plain formulation).
  */
object Skew {

  /** Inner equi-join where `probe`'s hot keys are spread over `factor`
    * salt buckets and `build` is replicated `factor`× — each hot key's
    * rows land in `factor` different shuffle partitions instead of one.
    * Use when the build side is small enough to replicate but too big
    * to broadcast. Salt is derived from a per-row id, so the spread is
    * uniform regardless of the key distribution. NB the id depends on
    * partition layout, so a re-run on different partitioning
    * REDISTRIBUTES rows across salt buckets — the join RESULT is
    * unchanged (every salted probe row still meets every build replica
    * of its key); only the internal spread is layout-dependent.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      factor: Int): DataFrame = {
    require(factor > 1)
    val saltedProbe = probe.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(factor.toLong)).cast("int"))
    val replicatedBuild = build.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedProbe.join(replicatedBuild, Seq(key, "__salt"), "inner")
      .drop("__salt")
  }

  /** Two-level aggregation for skewed group keys: partial sums on
    * (key, salt) spread a hot key over `factor` reducers, then a final
    * (cheap — one row per key per salt) pass merges. Equivalent to
    * groupBy(key).agg(sum) — Spark's own partial aggregation already
    * does this per-partition; the explicit salt level helps when a
    * single map partition can't pre-aggregate enough (huge distinct
    * count per partition forces spilling partial maps).
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
      factor: Int): DataFrame = {
    require(factor > 1)
    df.withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(factor.toLong)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__partial"))
      .groupBy(key)
      .agg(sum("__partial").as(s"sum_$valueCol"))
  }
}
