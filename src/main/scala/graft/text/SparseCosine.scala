package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sparse TF-IDF cosine similarity between documents (E-56) — the
  * inverted-index formulation: instead of materializing dense vectors
  * and comparing all pairs, documents meet ONLY through tokens they
  * share. cos(a,b) = Σ_t w_a(t)·w_b(t) / (‖a‖‖b‖) computed as a
  * self-join of the posting list on token + one sum per pair — the
  * classic sparse all-pairs similarity (term-at-a-time) shape.
  *
  * Scale levers, both standard IR practice:
  *  - `dfCap`: tokens appearing in more than dfCap documents are
  *    dropped from the INDEX (not the norms... norms too — weights use
  *    the same pruned vocabulary, keeping cos a true cosine of the
  *    pruned vectors). A token with df=d contributes d² join rows —
  *    stopword-like tokens are quadratic poison at 100 TB and carry
  *    near-zero idf anyway. With dfCap ≥ max df the result is exact.
  *  - `minCos`: the emit threshold bounds the output.
  *
  * idf = ln(N/df) (no smoothing — every indexed token has df ≥ 1), so
  * the whole computation is engine-reproducible; the DuckDB oracle
  * replays it term for term.
  */
object SparseCosine {

  /** Document pairs with TF-IDF cosine ≥ minCos: (id_a, id_b, cos),
    * id_a < id_b.
    */
  def similarPairs(docs: DataFrame, dfCap: Long, minCos: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val tf = docs
      .select(col(idCol).as("id"),
        explode(filter(split(col(textCol), " "), t => t =!= "")).as("tok"))
      .groupBy("id", "tok").agg(count(lit(1)).as("tf"))
    val n = docs.select(countDistinct(col(idCol)).as("n"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
    val w = tf.join(df, "tok").crossJoin(broadcast(n))
      .select(col("id"), col("tok"),
        (col("tf") * log(col("n") / col("df"))).as("w"))
    val norms = w.groupBy("id")
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val dots = w.select(col("tok"), col("id").as("id_a"), col("w").as("wa"))
      .join(w.select(col("tok"), col("id").as("id_b"), col("w").as("wb")),
        "tok")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(sum(col("wa") * col("wb")).as("dot"))
    dots
      .join(norms.select(col("id").as("id_a"), col("nrm").as("na")), "id_a")
      .join(norms.select(col("id").as("id_b"), col("nrm").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("dot") / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= minCos)
  }
}
