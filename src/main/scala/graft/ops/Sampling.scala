package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * All variants order by a cryptographic hash of a unique key instead of
  * an RNG: the selection is reproducible across engines, partitionings
  * and reruns (no seed plumbing, no sampleBy approximation), and
  * auditable — given the key you can prove membership. The hash order is
  * uniform, so these are uniform samples.
  *
  * Scale shapes: rate() is a pure scan+filter (pushdown-friendly, no
  * shuffle); exactK() plans as TakeOrderedAndProject (per-partition
  * top-k, no global sort); stratifiedK() is one window per stratum
  * partition — the standard "cap documents per language/domain" op.
  */
object Sampling {

  private def hashOf(key: Column): Column = sha2(key.cast("string"), 256)

  /** Keep ~rate of rows: sha256 hex prefix below the rate threshold.
    * Rate is quantized to 1/16ths by the first hex nibble for exact
    * cross-engine reproducibility (finer rates: compare more nibbles).
    */
  def rateNibble(df: DataFrame, key: Column, nibbles16: Int): DataFrame = {
    require(nibbles16 >= 1 && nibbles16 <= 16)
    val cut = java.lang.Integer.toHexString(nibbles16) // exclusive upper nibble
    df.filter(substring(hashOf(key), 1, 1) < cut)
  }

  /** Exactly k rows, uniform, deterministic (ties impossible: unique key). */
  def exactK(df: DataFrame, key: Column, k: Int): DataFrame =
    df.orderBy(hashOf(key), key).limit(k)

  /** Up to k rows per stratum, uniform within each stratum. */
  def stratifiedK(df: DataFrame, stratum: Column, key: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(hashOf(key), key)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Hash-derived uniform in (0,1): the first 60 bits of sha256(key),
    * centered (+0.5) so it can never hit 0 or 1 exactly. Same doubles on
    * any engine that can parse hex — the RNG-free uniform the weighted
    * sampler needs.
    */
  def hashUniform(key: Column): Column =
    (conv(substring(hashOf(key), 1, 15), 16, 10).cast("long").cast("double")
      + 0.5) / 1152921504606846976.0d // 2^60

  /** Weighted sample without replacement, k rows, inclusion probability
    * ∝ weight — Efraimidis–Spirakis A-Res with the deterministic
    * [[hashUniform]] in place of an RNG: rank key = ln(u)/w (the log form
    * of u^(1/w)), keep the k largest. Plans as TakeOrderedAndProject
    * like exactK — per-partition top-k, no global sort, no shuffle of
    * the losers.
    */
  def weightedK(df: DataFrame, key: Column, weight: Column, k: Int): DataFrame =
    df.withColumn("__wk", log(hashUniform(key)) / weight)
      .orderBy(desc("__wk"))
      .limit(k)
      .drop("__wk")

  /** Hash-ring negative pairing (E-92): each key is paired with its
    * successor on the sha256 ring (the last wraps to the first) — a
    * deterministic, RNG-free way to draw one "uniformly random" partner
    * per row for contrastive negatives, shuffling controls, or
    * A/B partner assignment, WITHOUT a cross join: the hash order is
    * uncorrelated with any data attribute, and successor-pairing makes
    * every key appear exactly once on each side.
    *
    * This exact form uses one global sort window (fine to ~10⁸ keys);
    * at 100 TB, ring within hash-bucket partitions — mod-N bucketing
    * preserves both uniformity and the exactly-once property per
    * bucket.
    *
    * @return (key, partner)
    */
  def ringPairs(df: DataFrame, key: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy("__h", "__k")
    val wAll = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    df.select(key.as("__k"), hashOf(concat(lit("ring:"), key)).as("__h"))
      .withColumn("partner",
        coalesce(lead(col("__k"), 1).over(w), first(col("__k")).over(wAll)))
      .select(col("__k").as("key"), col("partner"))
  }

  /** Deterministic k-fold assignment (E-122): fold = first 16 bits of
    * sha256(key) mod k. The standard cross-validation / train-holdout
    * split plumbing with the same guarantees as every sampler here —
    * reproducible across engines and reruns, auditable per key, and a
    * pure narrow projection (no shuffle, pushdown-friendly). 16 bits
    * mod small k gives ≤0.003% deviation from uniform fold weights.
    */
  def foldAssign(key: Column, k: Int): Column = {
    require(k >= 2 && k <= 1024)
    conv(substring(hashOf(key), 1, 4), 16, 10).cast("long") % k
  }
}
