package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Bloom-filter pre-filtered join — the classic semi-join reduction for
  * big-fact ⋈ selective-dim at 100 TB scale.
  *
  * Spark's own runtime row-level filtering (`spark.sql.optimizer.
  * runtimeFilter.bloomFilter.enabled`) only fires under cost heuristics
  * it controls; this operator is the explicit, always-on form. The dim
  * side's join keys are folded into a Bloom filter (one small aggregate,
  * map-side combined), the fact side is filtered by `might_contain`
  * BEFORE its shuffle, and the real join then removes the false
  * positives. No false negatives ⇒ result ≡ the plain join, which is
  * exactly what the ext_bloom_join oracle pins.
  *
  * Why it matters at scale: with a 1%-selective dim, the fact table's
  * shuffle writes shrink ~100× (modulo the Bloom false-positive rate,
  * ~1e-2 at the default sizing) while the filter itself is a broadcast
  * of a few MB of bits. The filter evaluates as a codegen'd expression
  * on xxhash64(key) — no UDF, no extra shuffle of the fact table.
  *
  * Uses Spark's own Catalyst `BloomFilterAggregate` /
  * `BloomFilterMightContain` expressions (public classes, internal
  * function names), registered here as `graft_bloom_agg` /
  * `graft_might_contain` via the same temp-function mechanism as the
  * graft native expressions.
  */
object BloomJoin {

  val bloomAggBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2,
      s"graft_bloom_agg expects (xxhash64 value, estimatedNumItems), got ${children.length}")
    require(children(1).foldable, "graft_bloom_agg: estimatedNumItems must be a literal")
    new BloomFilterAggregate(new XxHash64(Seq(children.head)),
      children(1).eval(null).asInstanceOf[Number].longValue())
      .toAggregateExpression()
  }

  val mightContainBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2,
      s"graft_might_contain expects (bloomBits, value), got ${children.length}")
    BloomFilterMightContain(children.head, new XxHash64(Seq(children(1))))
  }

  /** Idempotent-and-silent like [[graft.functions.GraftFunctions.register]]:
    * skip names already present instead of replace-with-WARN.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def once(name: String, builder: Seq[Expression] => Expression): Unit =
      if (!reg.functionExists(
          new org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    once("graft_bloom_agg", bloomAggBuilder)
    once("graft_might_contain", mightContainBuilder)
  }

  /** Builds a Bloom filter over `dim(dimKey)` and returns `fact` reduced
    * to rows whose `factKey` might be present. Superset of the exact
    * semi-join (false positives only), so `prefilter(...).join(dim, …)`
    * ≡ `fact.join(dim, …)`.
    *
    * The dim-side aggregate collapses to ONE row of serialized bits
    * (map-side combined, so the driver pull is a merge of
    * num-partitions filters, not the dim rows), which then rides into
    * the fact-side predicate as a binary literal —
    * `BloomFilterMightContain` requires a constant/scalar-subquery
    * filter side, and a literal also keeps the fact scan a pure
    * scan+filter with no join node at all. Same small-driver-collect
    * pattern as the IVF centroid table, and the bits are bounded (a few
    * MB) regardless of data scale.
    */
  def prefilter(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, expectedItems: Long = 1000000L): DataFrame = {
    val spark = fact.sparkSession
    register(spark)
    val bits = dim.agg(
      call_function("graft_bloom_agg", col(dimKey), lit(expectedItems))
        .as("bits")).head.getAs[Array[Byte]]("bits")
    fact.filter(call_function("graft_might_contain", lit(bits), col(factKey)))
  }

  /** The full reduced join: Bloom-prefilter `fact`, then the exact join
    * removes false positives. Result ≡ `fact.join(dim, fact(factKey) ===
    * dim(dimKey))` with the fact-side shuffle shrunk to ~the matching
    * rows.
    */
  def join(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
      expectedItems: Long = 1000000L): DataFrame = {
    // Qualify through the DataFrame references: bare col(factKey) ===
    // col(dimKey) is ambiguous (or a degenerate self-compare) whenever
    // the two frames share the key column name.
    val pre = prefilter(fact, factKey, dim, dimKey, expectedItems)
    pre.join(dim, pre(factKey) === dim(dimKey))
  }
}
