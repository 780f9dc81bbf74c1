package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One (i,j) cell of the sparse co-occurrence matrix (GloVe stage 2). */
case class Cooc(i: Int, j: Int, x: Double)

/** GloVe stage 2: windowed co-occurrence (SURVEY T-4; canonical `cooccur`).
  *
  * Semantics: for tokens at positions p, q in the same document with
  * 0 < |p-q| <= window, X(w_p, w_q) += 1/|p-q| — symmetric window,
  * harmonic distance weighting (GloVe paper §4.2).
  *
  * Production kernel: a single typed `flatMap` pass per document emitting
  * both directions of each pair — O(n·window) work, NO self-join, and the
  * downstream `groupBy` gets map-side partial aggregation for free. This
  * is the 100 TB path: shuffle volume is the number of DISTINCT pairs per
  * partition, not the number of pair instances. The band-self-join
  * formulation (ContractQueries.b9Join) is kept as the oracle and the two
  * are property-tested equal.
  */
object Cooccurrence {

  /** Raw pair instances (w1, w2, wt=1/d) — one row per co-occurrence, both
    * directions. Matches the B9 oracle exactly (no empty-token filter:
    * `split` semantics are preserved end-to-end).
    *
    * `symmetric = false` selects the canonical toolkit's asymmetric mode
    * (`--symmetric 0`): only the LEFT context counts, i.e. each (focus,
    * context) pair is emitted once with the context word preceding the
    * focus word — exactly half the symmetric mass.
    */
  def wordPairs(documents: DataFrame, window: Int, textCol: String = "text",
      symmetric: Boolean = true): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(split(col(textCol), " ").as("toks"))
      .as[Seq[String]]
      .flatMap { toks =>
        val n = toks.length
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Double)]
        var i = 0
        while (i < n) {
          var d = 1
          while (d <= window && i + d < n) {
            val wt = 1.0 / d
            out += ((toks(i + d), toks(i), wt)) // focus ← left context
            if (symmetric) out += ((toks(i), toks(i + d), wt))
            d += 1
          }
          i += 1
        }
        out
      }
      .toDF("w1", "w2", "wt")
  }

  /** Aggregated word-level co-occurrence: (w1, w2, x = Σ 1/d, c = #instances). */
  def aggregated(documents: DataFrame, window: Int, textCol: String = "text"): DataFrame =
    wordPairs(documents, window, textCol)
      .groupBy("w1", "w2")
      .agg(sum("wt").as("x"), count(lit(1)).as("c"))

  /** Id-space sparse matrix for training: tokens outside `vocab` are
    * dropped (canonical `cooccur` behavior), ids from the broadcast vocab
    * map (word -> 0-based id). Window distances are measured over the
    * ORIGINAL token positions, before OOV filtering — matching the
    * canonical toolkit, which builds distances over the kept-token stream;
    * we follow the simpler and more common "distance over kept tokens"
    * variant used by faithful ports: OOV tokens are removed first, then
    * positions are re-measured. (Property-tested; documented deviation
    * candidates are noted in GloveSpec.)
    */
  /** Id-space matrix with a DISTRIBUTED vocabulary (the large-V path):
    * tokens join the vocab DataFrame (broadcast by Spark when small,
    * shuffled when not — never collected to the driver), per-document
    * sequences are rebuilt in original order with OOV removed, then the
    * same O(n·w) kernel runs over id arrays. Output ≡ [[matrix]]
    * (property-tested); use this when the vocab Map would not fit the
    * driver (V ≳ tens of millions).
    */
  def matrixViaJoin(
      documents: DataFrame,
      vocab: DataFrame, // columns: w (string), id0 (int, 0-based)
      window: Int,
      idCol: String = "doc_id",
      textCol: String = "text",
      symmetric: Boolean = true): Dataset[Cooc] = {
    val spark = documents.sparkSession
    import spark.implicits._
    val w = window
    documents
      .select(col(idCol).as("did"), posexplode(split(col(textCol), " ")).as(Seq("pos", "w")))
      .join(vocab.select(col("w"), col("id0")), "w")
      .groupBy("did")
      .agg(org.apache.spark.sql.functions.transform(
        array_sort(collect_list(struct(col("pos"), col("id0")))),
        e => e.getField("id0")).as("ids"))
      .select("ids")
      .as[Seq[Int]]
      .flatMap { ids =>
        val n = ids.length
        val out = scala.collection.mutable.ArrayBuffer.empty[Cooc]
        var i = 0
        while (i < n) {
          var d = 1
          while (d <= w && i + d < n) {
            val wt = 1.0 / d
            out += Cooc(ids(i + d), ids(i), wt)
            if (symmetric) out += Cooc(ids(i), ids(i + d), wt)
            d += 1
          }
          i += 1
        }
        out
      }
      .groupByKey(c => (c.i, c.j))
      .mapValues(_.x)
      .reduceGroups(_ + _)
      .map { case ((i, j), x) => Cooc(i, j, x) }
  }

  def matrix(
      documents: DataFrame,
      vocab: Map[String, Int],
      window: Int,
      textCol: String = "text",
      symmetric: Boolean = true): Dataset[Cooc] = {
    val spark = documents.sparkSession
    import spark.implicits._
    val bVocab = spark.sparkContext.broadcast(vocab)
    documents
      .select(split(col(textCol), " ").as("toks"))
      .as[Seq[String]]
      .flatMap { toks =>
        val v = bVocab.value
        val ids = toks.iterator.flatMap(v.get).toArray
        val n = ids.length
        val out = scala.collection.mutable.ArrayBuffer.empty[Cooc]
        var i = 0
        while (i < n) {
          var d = 1
          while (d <= window && i + d < n) {
            val wt = 1.0 / d
            out += Cooc(ids(i + d), ids(i), wt)
            if (symmetric) out += Cooc(ids(i), ids(i + d), wt)
            d += 1
          }
          i += 1
        }
        out
      }
      .groupByKey(c => (c.i, c.j))
      .mapValues(_.x)
      .reduceGroups(_ + _)
      .map { case ((i, j), x) => Cooc(i, j, x) }
  }
}
