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

  /** Geometry auto-selection between [[densePairs]] and
    * [[similarPairs]] — both compute the SAME TF-IDF cosine for a given
    * dfCap, so the choice is purely physical. One cheap map-side-
    * combined aggregation measures the post-cap vocabulary size:
    * a small vocabulary (≤ denseVocabMax) is the inverted index's worst
    * case (candidates degenerate to all pairs and the token join has
    * |vocab| keys — measured 125 s vs 5.7 s at sf0.1), so it takes the
    * block-pair dense path; a large (Zipfian) vocabulary takes the
    * posting-list join, whose fanout dfCap bounds. At 100 TB pass a
    * finite dfCap: stopword postings are quadratic poison in ANY
    * geometry, carry near-zero idf, and pruning them is mirrored in the
    * oracle. The decision agg costs one pass over (doc, token) pairs —
    * noise next to the pair join it sizes.
    */
  def autoPairs(docs: DataFrame, dfCap: Long, minCos: Double,
      denseVocabMax: Int = 256, nBlocks: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val vocabSize = docs
      .select(col(idCol).as("id"),
        explode(filter(split(col(textCol), " "), t => t =!= "")).as("tok"))
      .distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
      .count()
    if (vocabSize <= denseVocabMax)
      densePairs(docs, dfCap, minCos, nBlocks, idCol, textCol)
    else similarPairs(docs, dfCap, minCos, idCol, textCol)
  }

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

  /** The DENSE-corpus formulation of [[similarPairs]] — same TF-IDF
    * cosine semantics, different join geometry. The inverted index is
    * right when the vocabulary is Zipfian and dfCap bounds fanout; when
    * every document shares most of a SMALL vocabulary (this fixture:
    * 31 tokens) the candidate set degenerates to all pairs AND the
    * token join has only |vocab| distinct keys — parallelism collapses
    * (measured 125 s at sf0.1 vs 2 s for this path). Here documents
    * become dense weight vectors over the pruned vocabulary and meet
    * through a BLOCK-PAIR equi-join (nBlocks² ∕ 2 keys — the
    * parallelism knob, same geometry as `Similarity.blockTopPairs`),
    * with the codegen'd `cosine_sim` doing ascending-index double
    * accumulation — the exact oracle arithmetic.
    *
    * Requires a small post-cap vocabulary (the dense dimension); the
    * one-row vocab count is the only driver-side value.
    */
  def densePairs(docs: DataFrame, dfCap: Long, minCos: Double,
      nBlocks: Int = 8, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val tf = docs
      .select(col(idCol).as("id"),
        explode(filter(split(col(textCol), " "), t => t =!= "")).as("tok"))
      .groupBy("id", "tok").agg(count(lit(1)).as("tf"))
    val n = docs.select(countDistinct(col(idCol)).as("n"))
    val dfT = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
    val vocab = dfT.select(col("tok"),
      (row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy("tok")) - 1).as("idx"))
    val dim = vocab.count().toInt
    val weights = tf.join(broadcast(dfT), "tok").crossJoin(broadcast(n))
      .join(broadcast(vocab), "tok")
      .select(col("id"), col("idx"),
        (col("tf") * log(col("n") / col("df"))).as("w"))
    val dense = weights
      .groupBy("id")
      .agg(map_from_entries(collect_list(struct(col("idx"), col("w"))))
        .as("m"))
      .select(col("id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("m"), i), lit(0.0))).as("v"),
        pmod(xxhash64(col("id")), lit(nBlocks)).cast("int").as("blk"))
    val replicas = dense
      .select(col("id"), col("v"), col("blk"),
        explode(sequence(lit(0), lit(nBlocks - 1))).as("other"))
      .select(col("id"), col("v"), col("blk"),
        least(col("blk"), col("other")).as("lo"),
        greatest(col("blk"), col("other")).as("hi"))
    val a = replicas.filter(col("blk") === col("lo"))
      .select(col("lo"), col("hi"), col("id").as("id_a"), col("v").as("va"))
    val b = replicas.filter(col("blk") === col("hi"))
      .select(col("lo"), col("hi"), col("id").as("id_b"), col("v").as("vb"))
    // A cross-block pair meets exactly once, but which side each doc
    // lands on follows BLOCK order, not id order — normalize with
    // least/greatest. Same-block pairs (lo == hi) meet in both
    // orientations — keep one via id_a < id_b.
    a.join(b, Seq("lo", "hi"))
      .filter(col("lo") < col("hi") || col("id_a") < col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("ida"),
        greatest(col("id_a"), col("id_b")).as("idb"),
        call_function("cosine_sim", col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= minCos)
      .select(col("ida").as("id_a"), col("idb").as("id_b"), col("cos"))
  }
}
