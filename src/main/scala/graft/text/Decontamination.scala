package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Eval-set decontamination (E-47): flag training documents that share
  * any token n-gram with a benchmark/eval corpus — the standard guard
  * against test-set leakage when assembling LLM training data (13-gram
  * overlap in common practice; n is a parameter here).
  *
  * Scale shape: the eval corpus is small by construction (benchmarks are
  * thousands of documents, the training corpus is billions), so its
  * distinct n-gram set broadcasts and the check is a broadcast LEFT SEMI
  * join against the training n-gram explode — the 100 TB side is touched
  * once, shuffles nothing, and the filter composes with the scan. Only
  * the per-doc hit aggregation shuffles, keyed by doc id.
  */
object Decontamination {

  /** Overlapping token n-grams as space-joined strings — a pure
    * codegen'd projection (no shuffle, no UDF). Documents shorter than
    * `n` tokens yield an empty array.
    */
  def ngrams(text: Column, n: Int): Column = {
    val toks = filter(split(text, " "), t => t =!= "")
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Training docs sharing >= 1 n-gram with `evalDocs`: returns
    * (idCol, n_hit) where n_hit counts the doc's DISTINCT contaminated
    * n-grams. Clean docs are absent (filter semantics — anti-join this
    * result to keep the clean side).
    */
  def contaminated(train: DataFrame, evalDocs: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val trainNg = train.select(col(idCol),
      explode(array_distinct(ngrams(col(textCol), n))).as("g"))
    val evalNg = evalDocs
      .select(explode(array_distinct(ngrams(col(textCol), n))).as("g"))
      .distinct()
    trainNg
      .join(broadcast(evalNg), Seq("g"), "left_semi")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hit"))
  }
}
