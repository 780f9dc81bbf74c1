package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain-mixture resampling (E-50): draw a training corpus with a
  * prescribed domain composition — "40% web, 30% code, 30% books" — the
  * final assembly step of every LLM data pipeline once per-domain
  * filtering is done.
  *
  * Each domain's quota is floor(total · w/Σw); rows are picked in
  * sha256-hash order of a caller-chosen key (the same RNG-free
  * discipline as [[Sampling]]), so the draw is reproducible across
  * engines, reruns, and partitionings, and composes with incremental
  * rebuilds (a doc's membership never depends on what else is in the
  * corpus).
  *
  * Scale shape: the weight table is tiny (broadcast), the per-domain
  * pick is one hash-ordered window rank — a single shuffle keyed by
  * domain. Domains are few and quotas are the output size, not the
  * input size; when a single domain's INPUT is pathologically skewed
  * the rank can be replaced by the two-phase quantile cut, but the
  * window form is exact and the default.
  */
object Mixture {

  /** Resample `df` to the target mixture. Domains absent from
    * `weights` are dropped; a domain with fewer rows than its quota
    * contributes everything it has (the mixture then under-fills —
    * callers can inspect per-domain counts on the result).
    *
    * @param total overall target row count (quotas are floors, so the
    *              result has <= total rows)
    */
  def resampleToMixture(df: DataFrame, domain: Column, key: Column,
      weights: Map[String, Double], total: Long): DataFrame = {
    val sumW = weights.values.sum
    val spark = df.sparkSession
    import spark.implicits._
    val quotas = weights.toSeq.toDF("graft_mix_dom", "graft_mix_w")
      .select(col("graft_mix_dom"),
        floor(lit(total) * col("graft_mix_w") / lit(sumW)).as("graft_mix_q"))
    val w = Window.partitionBy("graft_mix_dom")
      .orderBy(sha2(key.cast("string"), 256), key)
    df.withColumn("graft_mix_dom", domain)
      .join(broadcast(quotas), "graft_mix_dom")
      .withColumn("graft_mix_rn", row_number().over(w))
      .filter(col("graft_mix_rn") <= col("graft_mix_q"))
      .drop("graft_mix_dom", "graft_mix_q", "graft_mix_rn")
  }
}
