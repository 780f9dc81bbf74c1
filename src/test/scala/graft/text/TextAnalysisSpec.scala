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

  test("bigrams pairs adjacent kept tokens, skipping empty splits") {
    val df = spark.createDataFrame(Seq(
      (1L, "a b  c"), (2L, "solo"), (3L, ""), (4L, "x y")))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextAnalysis.bigrams(col("text")).as("bg"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("a b", "b c"), s"double space must not break pairing: ${got(1L)}")
    assert(got(2L) == Seq())
    assert(got(3L) == Seq())
    assert(got(4L) == Seq("x y"))
  }

  test("bigramLogScore: per-head conditional, common bigram scores low") {
    // 'a b' occurs 3 times with head 'a' (total head count 4) -> doc 0's
    // only bigram scores -ln(3/4); 'a c' once -> -ln(1/4)
    val df = spark.createDataFrame(Seq(
      (0L, "a b"), (1L, "a b"), (2L, "a b"), (3L, "a c")))
      .toDF("doc_id", "text")
    val s = TextAnalysis.bigramLogScore(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(s(0L) - -math.log(3.0 / 4.0)) < 1e-9)
    assert(math.abs(s(3L) - -math.log(1.0 / 4.0)) < 1e-9)
  }

  test("normalize folds case/accents/punctuation and is idempotent") {
    val df = spark.createDataFrame(Seq(
      (1L, "  Héllo,,  Wörld! Ça và?  "),
      (2L, "already clean text"),
      (3L, "MiXeD   CaSe---dashes")))
      .toDF("doc_id", "text")
    val once = df.select(col("doc_id"), TextAnalysis.normalize(col("text")).as("n"))
    val got = once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "hello world ca va", s"got '${got(1L)}'")
    assert(got(2L) == "already clean text")
    assert(got(3L) == "mixed case dashes")
    // idempotence: normalizing a normalized string is the identity
    val twice = once.select(col("doc_id"), TextAnalysis.normalize(col("n")).as("n2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(twice == got)
  }

  test("tokenEntropy: closed-form values (uniform=ln k, constant=0)") {
    val df = spark.createDataFrame(Seq(
      (1L, "a a b b"),        // ln4 − (2ln2+2ln2)/4 = ln2
      (2L, "a b c d"),        // uniform over 4 → ln4
      (3L, "x x x")))         // single type → 0
      .toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L) == (4L, math.rint(math.log(2) * 1e4) / 1e4))
    assert(got(2L) == (4L, math.rint(math.log(4) * 1e4) / 1e4))
    assert(got(3L) == (3L, 0.0))
  }

  test("bm25: more query-term hits score higher; termless docs absent") {
    val df = spark.createDataFrame(Seq(
      (0L, "spark spark table pad pad"),
      (1L, "spark pad pad pad pad"),
      (2L, "pad pad pad pad pad")))
      .toDF("doc_id", "text")
    val s = TextAnalysis.bm25(df, Seq("spark", "table")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!s.contains(2L), "doc without query terms must not surface")
    assert(s(0L) > s(1L), s"two terms + higher tf must outscore: $s")
  }
}
