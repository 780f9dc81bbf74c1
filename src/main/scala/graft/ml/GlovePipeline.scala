package graft.ml

import graft.glove.{Glove, GloveModel}
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.SQLDataTypes
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable,
  Identifiable, MLReadable, MLReader, MLWritable, MLWriter}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared `Param`s for the GloVe estimator/model pair (SURVEY §3 entry
  * 3 — "MLlib + custom distributed training": this is the `spark.ml`
  * Pipeline face over [[graft.glove.Glove]], shaped like
  * `ml.feature.Word2Vec`/`Word2VecModel` so a `Pipeline(stages=...)`
  * user can slot GloVe in where Word2Vec sits today).
  *
  * The estimator consumes a raw text column (it owns tokenization, like
  * the underlying trainer) keyed by a document-id column, and the model
  * emits an `ml.linalg.Vector` document embedding — the type downstream
  * `spark.ml` stages (Normalizer, LogisticRegression, KMeans, …)
  * expect, unlike the engine-native `array<float>` surface.
  */
private[ml] trait GloveParams extends Params {

  final val inputCol = new Param[String](this, "inputCol",
    "raw text column to train on / transform")
  final val idCol = new Param[String](this, "idCol",
    "document id column (join key for the emitted doc vectors)")
  final val outputCol = new Param[String](this, "outputCol",
    "output ml.linalg.Vector document-embedding column")
  final val vectorSize = new IntParam(this, "vectorSize",
    "embedding dimension", ParamValidators.gt(0))
  final val windowSize = new IntParam(this, "windowSize",
    "co-occurrence window radius", ParamValidators.gt(0))
  final val minCount = new IntParam(this, "minCount",
    "minimum token frequency for vocabulary inclusion", ParamValidators.gt(0))
  final val maxIter = new IntParam(this, "maxIter",
    "AdaGrad iterations", ParamValidators.gt(0))
  final val stepSize = new DoubleParam(this, "stepSize",
    "initial AdaGrad learning rate", ParamValidators.gt(0.0))
  final val seed = new LongParam(this, "seed", "init seed")

  setDefault(inputCol -> "text", idCol -> "doc_id", outputCol -> "doc_vec",
    vectorSize -> 50, windowSize -> 5, minCount -> 5, maxIter -> 25,
    stepSize -> 0.05, seed -> 42L)

  def getInputCol: String = $(inputCol)
  def getIdCol: String = $(idCol)
  def getOutputCol: String = $(outputCol)

  protected def validateAndTransformSchema(schema: StructType): StructType = {
    require(schema($(inputCol)).dataType == StringType,
      s"inputCol ${$(inputCol)} must be string, got ${schema($(inputCol)).dataType}")
    require(schema.fieldNames.contains($(idCol)), s"missing idCol ${$(idCol)}")
    require(!schema.fieldNames.contains($(outputCol)),
      s"outputCol ${$(outputCol)} already exists")
    // nullable: a document with no in-vocabulary token has no embedding
    StructType(schema.fields :+
      StructField($(outputCol), SQLDataTypes.VectorType, nullable = true))
  }
}

/** `spark.ml` Estimator over the GloVe trainer. `fit` delegates to
  * [[graft.glove.Glove]] (which auto-selects the broadcast-loop or
  * block-partitioned path by vocabulary size), so Pipeline users get
  * the exact same training kernels as the native API.
  */
class GloveEstimator(override val uid: String)
    extends Estimator[GloveEmbeddingModel] with GloveParams
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("graft_glove"))

  def setInputCol(v: String): this.type = set(inputCol, v)
  def setIdCol(v: String): this.type = set(idCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  def setVectorSize(v: Int): this.type = set(vectorSize, v)
  def setWindowSize(v: Int): this.type = set(windowSize, v)
  def setMinCount(v: Int): this.type = set(minCount, v)
  def setMaxIter(v: Int): this.type = set(maxIter, v)
  def setStepSize(v: Double): this.type = set(stepSize, v)
  def setSeed(v: Long): this.type = set(seed, v)

  override def fit(dataset: Dataset[_]): GloveEmbeddingModel = {
    transformSchema(dataset.schema)
    val glove = new Glove(dim = $(vectorSize), window = $(windowSize),
      minCount = $(minCount).toLong, learningRate = $(stepSize),
      iterations = $(maxIter), seed = $(seed))
    val trained = glove.fit(dataset.toDF(), $(inputCol))
    copyValues(new GloveEmbeddingModel(uid, trained).setParent(this))
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)

  override def copy(extra: ParamMap): GloveEstimator = defaultCopy(extra)
}

object GloveEstimator extends DefaultParamsReadable[GloveEstimator] {
  override def load(path: String): GloveEstimator = super.load(path)
}

/** Fitted Pipeline stage: wraps the engine-native [[GloveModel]] and
  * emits `ml.linalg.Vector` doc embeddings (mean of in-vocab token
  * vectors — the broadcast-join plan of `GloveModel.transform`, then
  * `array_to_vector`; no per-row UDF).
  *
  * Persistence is self-contained: `write` stores the wrapped model via
  * its own parquet layout plus this stage's params as strings, so
  * `GloveEmbeddingModel.load(path)` (and therefore `PipelineModel`
  * save/load containing this stage) round-trips without the private
  * `DefaultParamsWriter` machinery.
  */
class GloveEmbeddingModel(
    override val uid: String,
    @transient val gloveModel: GloveModel)
    extends Model[GloveEmbeddingModel] with GloveParams with MLWritable {

  def setOutputCol(v: String): this.type = set(outputCol, v)

  /** Word2VecModel-style synonym lookup, exposed on the ml surface. */
  def findSynonyms(word: String, num: Int): DataFrame =
    gloveModel.findSynonyms(word, num)

  override def transform(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema)
    val arrCol = s"__glove_arr_${uid.takeRight(6)}"
    gloveModel
      .transform(dataset.toDF(), $(inputCol), $(idCol), arrCol)
      .withColumn($(outputCol),
        when(col(arrCol).isNotNull, array_to_vector(col(arrCol))))
      .drop(arrCol)
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)

  override def copy(extra: ParamMap): GloveEmbeddingModel =
    copyValues(new GloveEmbeddingModel(uid, gloveModel), extra)
      .setParent(parent)

  override def write: MLWriter = new GloveEmbeddingModel.Writer(this)
}

object GloveEmbeddingModel extends MLReadable[GloveEmbeddingModel] {

  private val stringParams =
    Seq("inputCol", "idCol", "outputCol")
  private val intParams =
    Seq("vectorSize", "windowSize", "minCount", "maxIter")

  private[ml] class Writer(instance: GloveEmbeddingModel) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      instance.gloveModel.save(s"$path/glove")
      val spark = SparkSession.active
      import spark.implicits._
      val params: Map[String, String] =
        instance.params
          .filter(p => instance.isSet(p) || instance.hasDefault(p))
          .map(p => p.name -> instance.getOrDefault(p).toString).toMap
      Seq((instance.uid, params)).toDF("uid", "params")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/mlmeta")
    }
  }

  override def read: MLReader[GloveEmbeddingModel] =
    new MLReader[GloveEmbeddingModel] {
      override def load(path: String): GloveEmbeddingModel = {
        val spark = SparkSession.active
        val row = spark.read.parquet(s"$path/mlmeta").head()
        val uid = row.getString(0)
        val params = row.getMap[String, String](1).toMap
        val m = new GloveEmbeddingModel(uid, GloveModel.load(spark, s"$path/glove"))
        stringParams.foreach(n => m.set(m.getParam(n), params(n)))
        intParams.foreach(n => m.set(m.getParam(n), params(n).toInt))
        m.set(m.stepSize, params("stepSize").toDouble)
        m.set(m.seed, params("seed").toLong)
        m
      }
    }

  override def load(path: String): GloveEmbeddingModel = super.load(path)
}
