package graft.text

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite with SparkFixture {

  test("countOccurrences counts non-overlapping substring hits") {
    val df = spark.createDataFrame(Seq(Tuple1("the thin theme then"))).toDF("t")
    val got = df.select(
      TextAnalysis.countOccurrences(col("t"), "th"),
      TextAnalysis.countOccurrences(col("t"), "the")).collect()(0)
    assert(got.getDouble(0) == 4.0)
    assert(got.getDouble(1) == 3.0)
  }

  test("langId is deterministic and total on the fixture corpus") {
    val docs = Tables.table(spark, sf001, "documents")
    val out = docs.select(TextAnalysis.langId(col("text")).as("g")).collect()
    assert(out.forall(r => !r.isNullAt(0)))
    val langs = out.map(_.getString(0)).toSet
    assert(langs.subsetOf(TextAnalysis.langMarkers.map(_._1).toSet))
  }

  test("quality features are in range and score bounded") {
    val docs = Tables.table(spark, sf001, "documents")
    val f = TextAnalysis.qualityFeatures(docs)
      .select("stop_ratio", "distinct_ratio", "alnum_ratio", "quality").collect()
    f.foreach { r =>
      (0 until 4).foreach { i =>
        val v = r.getDouble(i)
        assert(v >= 0.0 && v <= 1.0001, s"col $i out of range: $v")
      }
    }
  }

  test("token counts: bpe-ish >= whitespace tokens on alnum text") {
    val docs = Tables.table(spark, sf001, "documents")
    val out = TextAnalysis.tokenCounts(docs).select("ws_tokens", "bpeish_tokens").collect()
    assert(out.forall(r => r.getLong(0) <= r.getInt(1)))
  }

  test("unigramLogScore ranks rare-token docs above common-token docs") {
    // 'common' appears everywhere; 'rare*' tokens once each
    val docs = spark.createDataFrame(
      (0L to 9L).map(i => (i, "common common common")) ++
        Seq((10L, "rare1 rare2 rare3"))).toDF("doc_id", "text")
    val scores = TextAnalysis.unigramLogScore(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(10L) > scores(0L),
      s"rare doc ${scores(10L)} should outscore common doc ${scores(0L)}")
    // score of the all-common docs = -ln(30/33); exact closed form
    assert(math.abs(scores(0L) - -math.log(30.0 / 33.0)) < 1e-9)
  }

  test("tokenSetFingerprint is order-insensitive, rollingHash is order-sensitive") {
    val df = spark.createDataFrame(Seq(
      (1L, "alpha beta gamma"), (2L, "gamma beta alpha"), (3L, "alpha beta delta")))
      .toDF("doc_id", "text")
    val fp = df.select(col("doc_id"), TextAnalysis.tokenSetFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
    val rh = df.select(col("doc_id"), TextAnalysis.rollingHash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rh(1L) != rh(2L))
  }
}
