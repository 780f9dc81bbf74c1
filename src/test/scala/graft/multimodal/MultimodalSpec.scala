package graft.multimodal

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkFixture {

  private lazy val media = Multimodal.syntheticFromText(
    Tables.table(spark, sf001, "documents"))

  test("synthetic media table has the contract schema") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val metaFields = schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSet
    assert(metaFields == Set("modality", "format", "width", "height", "durationMs"))
  }

  test("feature extraction: row-per-record, fixed feature width, deterministic") {
    val a = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val b = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(a.length == media.count())
    assert(a.forall(_.feature.length == 8))
    assert(a.zip(b).forall { case (x, y) => x.feature.toSeq == y.feature.toSeq })
    // entropy of word-soup text bytes is positive and < 8 bits
    assert(a.forall(f => f.byte_entropy > 0 && f.byte_entropy < 8))
    assert(a.forall(f => f.frames_sampled >= 1 && f.frames_sampled <= 8))
  }

  test("extraction stage is narrow: partition count preserved, no shuffle added") {
    val out = Multimodal.extractFeatures(media.repartition(7))
    assert(out.rdd.getNumPartitions == 7)
    // the only Exchange in the plan is the repartition's own round-robin;
    // the extraction stage itself must not introduce another
    val plan = out.queryExecution.executedPlan.toString
    val nExchanges = "(?m)^\\s*\\+?-? ?Exchange".r.findAllIn(plan).length
    assert(nExchanges <= 1, s"extraction added a shuffle:\n$plan")
  }

  test("extracted features join back relationally") {
    val feats = Multimodal.extractFeatures(media).toDF()
    val byModality = feats.groupBy("modality").agg(
      count(lit(1)).as("n"), avg("byte_entropy").as("h")).collect()
    assert(byModality.map(_.getString(0)).toSet == Set("image", "audio", "video"))
  }
}
