package graft.glove

import graft.SparkFixture
import graft.ml.{GloveEstimator, GloveEmbeddingModel}
import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature.Normalizer
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY T-14: the `spark.ml` Pipeline face of GloVe (§3 entry 3 —
  * "MLlib + custom distributed training"). Gates:
  *  - a `Pipeline(stages = [GloveEstimator, Normalizer])` fits on the
  *    raw documents fixture and emits unit-norm `ml.linalg.Vector`
  *    doc embeddings — i.e. a STOCK downstream ml stage consumes our
  *    output with no glue;
  *  - the fitted stage round-trips through `MLWritable`/`MLReadable`
  *    (model data + params), transform-identical after reload;
  *  - the unfitted estimator round-trips via DefaultParams persistence.
  */
class GlovePipelineSpec extends AnyFunSuite with SparkFixture {

  private lazy val docs = graft.Tables.table(spark, sf0001, "documents")

  private lazy val fitted: PipelineModel = {
    val glove = new GloveEstimator()
      .setInputCol("text").setIdCol("doc_id").setOutputCol("emb")
      .setVectorSize(16).setWindowSize(5).setMinCount(5)
      .setMaxIter(5).setSeed(7L)
    val norm = new Normalizer().setInputCol("emb").setOutputCol("emb_n").setP(2.0)
    new Pipeline().setStages(Array(glove, norm)).fit(docs)
  }

  test("Pipeline(glove -> normalizer) fits and emits unit-norm vectors") {
    val out = fitted.transform(docs).select("doc_id", "emb", "emb_n")
    val rows = out.limit(50).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val emb = r.getAs[Vector]("emb")
      assert(emb != null && emb.size == 16, s"doc ${r.get(0)}: bad emb $emb")
      val n = math.sqrt(r.getAs[Vector]("emb_n").toArray.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-6, s"normalizer output not unit norm: $n")
    }
  }

  test("transform keeps every input row exactly once (left join semantics)") {
    val out = fitted.transform(docs)
    assert(out.count() == docs.count())
  }

  test("fitted model save/load round-trips params and vectors") {
    val stage = fitted.stages(0).asInstanceOf[GloveEmbeddingModel]
    val dir = java.nio.file.Files.createTempDirectory("graft_mlmodel_").toString
    stage.write.overwrite().save(dir)
    val back = GloveEmbeddingModel.load(dir)
    assert(back.uid == stage.uid)
    assert(back.getOutputCol == "emb")
    assert(back.getOrDefault(back.getParam("vectorSize")) == 16)
    // transform equivalence on a slice: same doc -> same vector
    val a = stage.transform(docs.limit(20)).select("doc_id", "emb")
      .collect().map(r => r.get(0) -> r.getAs[Vector](1)).toMap
    val b = back.transform(docs.limit(20)).select("doc_id", "emb")
      .collect().map(r => r.get(0) -> r.getAs[Vector](1)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) =>
      val w = b(k)
      assert(v.toArray.zip(w.toArray).forall { case (x, y) =>
        math.abs(x - y) < 1e-6 }, s"vector drift after reload for doc $k")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("unfitted estimator save/load round-trips params") {
    val est = new GloveEstimator().setVectorSize(12).setMaxIter(3)
      .setMinCount(2).setOutputCol("v")
    val dir = java.nio.file.Files.createTempDirectory("graft_mlest_").toString
    est.write.overwrite().save(dir)
    val back = GloveEstimator.load(dir)
    assert(back.getOrDefault(back.getParam("vectorSize")) == 12)
    assert(back.getOrDefault(back.getParam("maxIter")) == 3)
    assert(back.getOutputCol == "v")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("ml synonyms surface matches the native model's neighbors") {
    val stage = fitted.stages(0).asInstanceOf[GloveEmbeddingModel]
    val viaMl = stage.findSynonyms("spark", 3).select("word")
      .collect().map(_.getString(0)).toSeq
    val native = stage.gloveModel.findSynonyms("spark", 3).select("word")
      .collect().map(_.getString(0)).toSeq
    assert(viaMl == native)
  }
}
