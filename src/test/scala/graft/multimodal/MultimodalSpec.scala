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

  test("resize stage: constant output shape, strided-sample kernel, narrow, " +
      "deterministic") {
    val out = Multimodal.resize(media, targetBytes = 64)
    val rows = out.collect().sortBy(_.media_id)
    assert(rows.length == media.count())
    // tensor-batching contract: EVERY payload is exactly targetBytes
    assert(rows.forall(_.payload.length == 64))
    // kernel spot-check: for a payload longer than the target, byte i
    // must equal source byte i*len/target (nearest-neighbor stride)
    val big = media.collect().filter(_.payload.length >= 64)
      .minBy(_.media_id)
    val resizedBig = rows.find(_.media_id == big.media_id).get
    assert((0 until 64).forall { i =>
      resizedBig.payload(i) ==
        big.payload((i.toLong * big.payload.length / 64).toInt)
    })
    // short payloads pass through zero-padded
    media.collect().filter(_.payload.length < 64).take(1).foreach { small =>
      val r = rows.find(_.media_id == small.media_id).get
      assert(r.payload.take(small.payload.length).toSeq == small.payload.toSeq)
      assert(r.payload.drop(small.payload.length).forall(_ == 0))
    }
    // metadata rewritten to the normalized shape; original size kept
    assert(rows.forall(r => r.meta.width <= 64 && r.meta.height <= 64))
    // narrow: partition count preserved
    assert(Multimodal.resize(media.repartition(5)).rdd.getNumPartitions == 5)
    // deterministic
    val again = Multimodal.resize(media, targetBytes = 64).collect()
      .sortBy(_.media_id)
    assert(rows.zip(again).forall { case (x, y) =>
      x.payload.toSeq == y.payload.toSeq })
  }

  test("extracted features join back relationally") {
    val feats = Multimodal.extractFeatures(media).toDF()
    val byModality = feats.groupBy("modality").agg(
      count(lit(1)).as("n"), avg("byte_entropy").as("h")).collect()
    assert(byModality.map(_.getString(0)).toSet == Set("image", "audio", "video"))
  }
}
