package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join via prefix filtering (the PPJoin
  * family) — the deterministic complement to the probabilistic MinHash
  * path in [[Dedup]]: every pair with Jaccard ≥ τ is returned, with no
  * banding miss probability, and still without the all-pairs cross
  * product.
  *
  * The filter: order each record's tokens by ascending GLOBAL frequency
  * (rarest first, ties by token), and emit only the first
  * p = n − ⌈τ·n⌉ + 1 tokens as join keys. Any two sets with
  * Jaccard ≥ τ share ≥ ⌈τ·max(n_a,n_b)⌉ tokens, so their prefixes must
  * intersect — candidates are complete. Rare-first ordering makes the
  * candidate lists small: the huge posting lists of stopword-like
  * tokens never become join keys.
  *
  * Scale shape (100 TB): the frequency table is one token-keyed
  * aggregate; the prefix rank is a per-record window (keyed by record
  * id — never a global sort); candidate generation is an equi-join on
  * the token with a size filter (τ·n_a ≤ n_b ≤ n_a∕τ) cutting
  * length-incompatible pairs before the verify. The exact-Jaccard
  * verify touches candidates only, and the τ comparison is integer
  * cross-multiplication (τ = num∕den), so the boundary never sits on a
  * float.
  */
object PrefixJoin {

  /** All pairs (id_a < id_b) with Jaccard(tokens_a, tokens_b) ≥ num/den.
    *
    * @param tokens distinct-element array column
    * @return (id_a, id_b, jaccard) with jaccard un-rounded
    */
  def selfJoin(df: DataFrame, idCol: String, tokens: Column,
      num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0 && num <= den)
    val docs = df.select(col(idCol).as("__id"), tokens.as("__s"))
      .withColumn("__n", size(col("__s")))
      .filter(col("__n") > 0)
    val toks = docs.select(col("__id"), col("__n"),
      explode(col("__s")).as("__t"))
    val freq = toks.groupBy("__t").agg(count(lit(1)).as("__f"))
    // prefix length p = n − ⌈num·n/den⌉ + 1, all-integer:
    // ⌈a/b⌉ = (a + b − 1) div b
    val p = col("__n") - ((col("__n") * num + (den - 1)) / den)
      .cast("long") + 1
    val ranked = toks.join(freq, "__t")
      .withColumn("__r", row_number().over(
        Window.partitionBy("__id").orderBy(col("__f"), col("__t"))))
      .filter(col("__r") <= p)
      .select(col("__t"), col("__id"), col("__n"), col("__r"))
      // persist barrier (measured): ranked feeds BOTH sides of the
      // candidate self-join; without it the token-frequency join and
      // the per-record rank window recompute twice under a 10M+-edge
      // downstream, a measured ~6x slowdown at sf0.1
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // PPJoin positional filter: Jaccard ≥ τ needs overlap ≥
    // ⌈num·(n_a+n_b)/(num+den)⌉, and a token matched at prefix ranks
    // (r_a, r_b) bounds the overlap by 1 + min(n_a−r_a, n_b−r_b) when
    // it is the pair's FIRST common token (zero common tokens precede
    // it). Every qualifying pair keeps its first-common-token edge, so
    // dropping edges that fail the bound loses no true pair — the
    // exact recheck below sees a smaller, still-complete candidate set.
    val cand = ranked.select(col("__t"), col("__id").as("__ida"),
        col("__n").as("__na"), col("__r").as("__ra"))
      .join(ranked.select(col("__t"), col("__id").as("__idb"),
        col("__n").as("__nb"), col("__r").as("__rb")),
        "__t")
      .filter(col("__ida") < col("__idb") &&
        col("__nb") * den >= col("__na") * num &&
        col("__na") * den >= col("__nb") * num &&
        (least(col("__na") - col("__ra"), col("__nb") - col("__rb")) + 1) *
          (num + den) >= (col("__na") + col("__nb")) * num)
      .select("__ida", "__idb").distinct()
    val verified = cand
      .join(docs.select(col("__id").as("__ida"), col("__s").as("__sa")), "__ida")
      .join(docs.select(col("__id").as("__idb"), col("__s").as("__sb")), "__idb")
      .withColumn("__i", size(array_intersect(col("__sa"), col("__sb"))).cast("long"))
      .withColumn("__u", size(array_union(col("__sa"), col("__sb"))).cast("long"))
      .filter(col("__i") * den >= col("__u") * num)
    val out = verified.select(col("__ida").as("id_a"), col("__idb").as("id_b"),
        (col("__i").cast("double") / col("__u")).as("jaccard"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize the (small: verified pairs only) result while ranked
    // is still cached, then release the big intermediate — without this
    // every selfJoin call leaked ranked's blocks for the session
    // lifetime. The persisted result is bounded by the true-pair count,
    // not the corpus.
    out.count()
    ranked.unpersist(blocking = false)
    out
  }
}
