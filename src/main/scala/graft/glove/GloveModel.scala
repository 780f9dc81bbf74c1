package graft.glove

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trained GloVe model: `embeddings` is (word STRING, id INT, vec
  * ARRAY<FLOAT>). API shaped like ml.feature.Word2VecModel for
  * familiarity: findSynonyms / analogy / transform / save-load.
  *
  * `params` carries the training hyperparameters (window, minCount, …)
  * as strings; [[save]] persists them with `dim` and the loss history so
  * [[GloveModel.load]] restores the full model from the path alone.
  */
class GloveModel(
    val embeddings: DataFrame,
    val dim: Int,
    val lossHistory: Seq[Double],
    val params: Map[String, String] = Map.empty) extends Serializable {

  /** Top-k cosine neighbors of `word` (excluding itself). */
  def findSynonyms(word: String, k: Int): DataFrame = {
    val probe = embeddings.filter(col("word") === word)
      .select(col("vec").as("probe_vec"))
    embeddings
      .crossJoin(broadcast(probe))
      .filter(col("word") =!= word)
      .select(col("word"), cosine(col("vec"), col("probe_vec")).as("similarity"))
      .orderBy(desc("similarity"), asc("word"))
      .limit(k)
  }

  /** Analogy: argmax_w cos(w, vec(a) − vec(b) + vec(c)), excluding a,b,c. */
  def analogy(a: String, b: String, c: String, k: Int = 1): DataFrame = {
    val byWord = embeddings.filter(col("word").isin(a, b, c))
      .select("word", "vec").collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1).toArray).toMap
    require(byWord.keySet == Set(a, b, c), s"missing words: ${Set(a, b, c) -- byWord.keySet}")
    val target = (0 until dim).map(i => byWord(a)(i) - byWord(b)(i) + byWord(c)(i)).toArray
    val spark = embeddings.sparkSession
    import spark.implicits._
    val probe = Seq(Tuple1(target)).toDF("probe_vec")
    embeddings
      .crossJoin(broadcast(probe))
      .filter(!col("word").isin(a, b, c))
      .select(col("word"), cosine(col("vec"), col("probe_vec")).as("similarity"))
      .orderBy(desc("similarity"), asc("word"))
      .limit(k)
  }

  /** Document vectors: average of word vectors over `textCol` tokens
    * (OOV tokens ignored; docs with no in-vocab token get null).
    * Implemented as explode + broadcast join + per-(doc, dimension)
    * average — fully relational, scales with the corpus AND with the
    * embedding dimension (plan size is constant in `dim`, unlike a
    * per-dimension aggregate-expression list, which bloats the plan at
    * dim ≥ a few hundred).
    */
  def transform(documents: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", outputCol: String = "doc_vec"): DataFrame = {
    val toks = documents.select(col(idCol), explode(split(col(textCol), " ")).as("word"))
    val joined = toks.join(broadcast(embeddings.select("word", "vec")), Seq("word"))
    val summed = joined
      .select(col(idCol), posexplode(col("vec")).as(Seq("pos", "v")))
      .groupBy(idCol, "pos")
      .agg(avg("v").as("m"))
      .groupBy(idCol)
      .agg(org.apache.spark.sql.functions.transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        e => e.getField("m")).as(outputCol))
    documents.join(summed, Seq(idCol), "left")
  }

  /** Persist embeddings + metadata: `path/embeddings` (parquet) and
    * `path/meta` (one-row parquet: dim, loss history, hyperparameters).
    */
  def save(path: String): Unit = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    embeddings.write.mode("overwrite").parquet(s"$path/embeddings")
    Seq(GloveModelMeta(dim, lossHistory, params)).toDS()
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Export in the canonical GloVe text interchange format — one line
    * per word, `word v1 … vd`, in vocabulary (frequency-rank) order,
    * as downstream embedding loaders expect. Floats use Spark's
    * shortest-round-trip rendering, so [[GloveModel.loadText]] restores
    * them bit-exactly. One sorted file: this is an export surface for a
    * (by nature driver-sized) vocabulary, not a compute path.
    */
  def saveText(path: String): Unit =
    embeddings.coalesce(1).sortWithinPartitions("id")
      .select(concat_ws(" ", col("word"), col("vec").cast("array<string>")))
      .write.mode("overwrite").text(path)
}

/** On-disk model metadata (parquet keeps the map/array types exact). */
case class GloveModelMeta(dim: Int, lossHistory: Seq[Double],
    params: Map[String, String])

object GloveModel {
  /** Restore a model saved by [[GloveModel.save]] — no caller-supplied
    * hyperparameters; everything round-trips from `path/meta`.
    */
  def load(spark: SparkSession, path: String): GloveModel = {
    import spark.implicits._
    val meta = spark.read.parquet(s"$path/meta").as[GloveModelMeta].head()
    new GloveModel(spark.read.parquet(s"$path/embeddings"),
      meta.dim, meta.lossHistory, meta.params)
  }

  /** Import the canonical text format ([[GloveModel.saveText]] or any
    * toolkit-produced `word v1 … vd` file). The format carries no ids
    * or loss history: ids are reassigned from line order (the format's
    * implicit vocabulary rank — textFile partitions are contiguous byte
    * ranges, so zipWithIndex yields global line numbers).
    */
  def loadText(spark: SparkSession, path: String): GloveModel = {
    import spark.implicits._
    val parsed = spark.sparkContext.textFile(path).zipWithIndex()
      .map { case (line, idx) =>
        val parts = line.split(" ")
        (parts(0), (idx + 1).toInt, parts.drop(1).map(_.toFloat))
      }.toDF("word", "id", "vec")
    val dim = parsed.select(size(col("vec"))).head().getInt(0)
    new GloveModel(parsed, dim, Nil, Map("format" -> "text"))
  }
}
