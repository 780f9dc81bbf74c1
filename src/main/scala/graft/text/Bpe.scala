package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning (Sennrich/Haddow/Birch, ACL 2016
  * — the subword-tokenizer trainer behind the GPT/Llama-family
  * vocabularies). Classic word-level formulation: the corpus collapses
  * to a (word, freq) table, each word starts as its character sequence
  * plus an end-of-word marker, and each round merges the globally
  * most-frequent adjacent symbol pair (frequency-weighted by word
  * count; ties broken lexicographically so training is deterministic).
  *
  * Spark shapes:
  *  - the corpus is touched ONCE (tokenize → word counts); every merge
  *    round runs over the word TABLE (vocabulary-sized, not
  *    corpus-sized — the reason word-level BPE trains fast at any
  *    corpus scale);
  *  - a round = one explode-pairs + groupBy-sum + a 1-row argmax to
  *    the driver (the merge decision is inherently global and tiny),
  *    then one codegen'd higher-order-function projection applying the
  *    merge — greedy left-to-right via a fold whose merged symbol can
  *    never re-match its own left side, so overlapping occurrences
  *    ("aaa" under merge (a,a)) resolve exactly like the reference
  *    implementation;
  *  - lineage is truncated each round (localCheckpoint) so R rounds
  *    stay R jobs, not an R-deep plan.
  */
object Bpe {

  /** End-of-word marker (canonical `</w>`). */
  val Eow = "</w>"

  /** (word, freq, syms) — each word as its initial symbol sequence. */
  def wordTable(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .withColumn("syms",
        concat(split(col("w"), ""), array(lit(Eow))))

  /** Frequency-weighted adjacent-pair counts of the current symbol
    * table: (left_sym, right_sym, pair_count).
    */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("freq"), explode(zip_with(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        slice(col("syms"), lit(2), size(col("syms")) - 1),
        (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
      .groupBy(col("p.l").as("left_sym"), col("p.r").as("right_sym"))
      .agg(sum(col("freq")).as("pair_count"))

  /** One greedy left-to-right merge application: every non-overlapping
    * (l, r) adjacency becomes the fused symbol l+r. Pure fold — after
    * a merge the accumulator's last element is the fused symbol, which
    * cannot equal `l` again, so "aaa" under (a,a) yields [aa, a]
    * exactly like the reference greedy scan.
    */
  def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** Learn `rounds` merges. Returns (round, left_sym, right_sym,
    * pair_count) in learning order.
    */
  def learnMerges(docs: DataFrame, rounds: Int,
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = wordTable(docs, textCol).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val top = pairCounts(words)
        .orderBy(desc("pair_count"), asc("left_sym"), asc("right_sym"))
        .limit(1).collect()
      if (top.isEmpty) { exhausted = true }
      else {
        val l = top(0).getString(0); val r = top(0).getString(1)
        merges += ((round, l, r, top(0).getLong(2)))
        words = words
          .withColumn("syms", applyMerge(col("syms"), l, r))
          .localCheckpoint()
        round += 1
      }
    }
    merges.toSeq.toDF("round", "left_sym", "right_sym", "pair_count")
  }

  /** Encode documents with a learned merge list (applied in learning
    * order): (original columns..., bpe_syms, n_bpe_tokens).
    */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text"): DataFrame = {
    val words = merges.foldLeft(
      org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.filter(
          split(col(textCol), " "), w => w =!= ""),
        w => concat(split(w, ""), array(lit(Eow)))): Column) {
      case (c, (l, r)) =>
        org.apache.spark.sql.functions.transform(c, s => applyMerge(s, l, r))
    }
    docs
      .withColumn("bpe_syms", flatten(words))
      .withColumn("n_bpe_tokens", size(col("bpe_syms")).cast("long"))
  }
}
