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
}
