package graft.pipeline

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end corpus-preparation funnel over the fixture corpus: stage
  * counts are monotone, the planted near-duplicates die in the dedup
  * stage, caps hold, and the run is deterministic.
  */
class CorpusPipelineSpec extends AnyFunSuite with SparkFixture {

  private lazy val docs = Tables.table(spark, sf001, "documents")

  test("funnel counts are monotone and near-dups are removed") {
    val (out, r) = new CorpusPipeline(nearDupThreshold = 0.5).run(docs)
    assert(r.input == docs.count())
    assert(r.afterScrub == r.input)
    assert(r.afterLang <= r.afterScrub && r.afterQuality <= r.afterLang)
    assert(r.afterRepetition == r.afterQuality, "repetition stage off => counts equal")
    assert(r.afterLm == r.afterRepetition, "LM stage off => counts equal")
    assert(r.afterDecontam == r.afterLm, "decontam stage off => counts equal")
    assert(r.afterExactDedup <= r.afterDecontam && r.afterNearDedup <= r.afterExactDedup)
    assert(r.output == r.afterNearDedup)
    // the sf0.01 fixture plants 25 near-dup pairs (FIXTURES.md quirk 3);
    // at τ=0.5 with no other filters, at least the paired larger ids die
    assert(r.afterExactDedup - r.afterNearDedup >= 20,
      s"expected >=20 near-dups removed, got ${r.afterExactDedup - r.afterNearDedup}")
    // output still carries the text and the derived columns
    assert(out.columns.contains("text") && out.columns.contains("quality"))
  }

  test("language filter and per-language cap apply") {
    val langs = docs.select(graft.text.TextAnalysis.langId(col("text")).as("l"))
      .groupBy("l").count().collect().map(_.getString(0)).toSet
    val keep = Set(langs.head)
    val (out, r) = new CorpusPipeline(languages = keep,
      capPerLanguage = Some(5)).run(docs)
    assert(r.afterLang < r.input || langs.size == 1)
    assert(r.output <= 5 * keep.size)
    assert(out.select("__lang").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(keep))
  }

  test("pipeline is deterministic end to end") {
    val (a, ra) = new CorpusPipeline(nearDupThreshold = 0.5,
      capPerLanguage = Some(10)).run(docs)
    val (b, rb) = new CorpusPipeline(nearDupThreshold = 0.5,
      capPerLanguage = Some(10)).run(docs)
    assert(ra == rb)
    assert(a.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      b.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("span-dedup stage rewrites survivors' text without changing row counts") {
    import spark.implicits._
    // two docs sharing an 18-token span but with LOW token-set Jaccard
    // (disjoint filler dominates the union), so whole-doc near-dedup
    // keeps both — exactly the case the span stage exists for
    // letter-only filler: the funnel's scrub stage rewrites digits
    def w(p: String, n: Int): Seq[String] =
      (0 until n).map(i => p + ('a' + i / 26).toChar + ('a' + i % 26).toChar)
    val shared = w("sh", 18)
    val d1 = (w("a", 40) ++ shared).mkString(" ")
    val d2 = (shared ++ w("b", 40)).mkString(" ")
    val crafted = Seq((1L, d1), (2L, d2),
      (9L, "plain filler document about rivers and ducks and reeds"))
      .toDF("doc_id", "text")
    val (off, rOff) = new CorpusPipeline(nearDupThreshold = 0.9).run(crafted)
    val (on, rOn) = new CorpusPipeline(nearDupThreshold = 0.9,
      spanDedupMinTokens = Some(15)).run(crafted)
    assert(rOff.spanRewritten == 0L)
    assert(rOn.output == rOff.output && rOn.output == 3,
      "span stage is a rewrite, never a filter")
    assert(rOn.spanRewritten == 1L, s"one doc rewritten, got ${rOn.spanRewritten}")
    def text(df: org.apache.spark.sql.DataFrame, id: Long): String =
      df.filter(col("doc_id") === id).select("text").head().getString(0)
    assert(text(on, 1L) == text(off, 1L), "canonical copy untouched")
    assert(text(on, 2L) == w("b", 40).mkString(" "),
      "doc 2 must lose exactly the shared span")
    off.unpersist(); on.unpersist()
  }

  test("near-dedup is cluster-based: transitive chains keep only the minimum") {
    import spark.implicits._
    // 1 ~ 3 (jac 6/12 = 0.5) and 2 ~ 3 (0.5), but 1 !~ 2 (0.0): the
    // component {1,2,3} must collapse to doc 1. Greedy pair-dropping
    // (drop the larger id of each pair) would wrongly keep doc 2.
    val xs = (1 to 6).map("x" + _).mkString(" ")
    val ys = (1 to 6).map("y" + _).mkString(" ")
    val crafted = Seq((1L, xs), (2L, ys), (3L, s"$xs $ys"),
      (50L, "unrelated filler document about ducks and rivers"))
      .toDF("doc_id", "text")
    val (out, r) = new CorpusPipeline(nearDupThreshold = 0.5).run(crafted)
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 50L), s"expected cluster {1,2,3} -> keep 1, got $kept")
    assert(r.afterExactDedup - r.afterNearDedup == 2)
  }

  test("LM filter drops rare-token noise docs and only them") {
    import spark.implicits._
    // 10 docs share a vocabulary; one is random-token soup. Its mean
    // -ln p(token) under the corpus unigram distribution is far above
    // the normal docs' — a threshold between the two bands keeps
    // exactly the clean docs.
    val common = (0 until 10).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog again"))
    val noise = Seq((99L, "zqx wvu tsr qpo nml kji hgf edc ba9 876"))
    val crafted = spark.createDataFrame(common ++ noise).toDF("doc_id", "text")
    val scores = graft.text.TextAnalysis.unigramLogScore(crafted).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val cut = (scores(0L) + scores(99L)) / 2
    val (out, r) = new CorpusPipeline(maxLmScore = Some(cut)).run(crafted)
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(99L), "noise doc must be LM-filtered")
    assert(r.afterLm == 10 && r.afterQuality == 11)
    // without the filter the noise doc survives the funnel
    val (out2, r2) = new CorpusPipeline().run(crafted)
    assert(out2.select("doc_id").collect().map(_.getLong(0)).toSet.contains(99L))
    assert(r2.afterLm == r2.afterQuality)
  }

  test("repetition filter drops template text and only it") {
    import spark.implicits._
    // doc 99 is one 3-gram stamped out repeatedly (dup3_frac = 1); the
    // clean docs have all-distinct trigrams (dup3_frac = 0)
    val clean = (0 until 5).map(i =>
      (i.toLong, s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i"))
    val template = Seq((99L, "buy now click here buy now click here buy now click here"))
    val crafted = spark.createDataFrame(clean ++ template).toDF("doc_id", "text")
    val (out, r) = new CorpusPipeline(maxDup3Frac = Some(0.5)).run(crafted)
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(99L), "repetitive doc must be filtered")
    assert(r.afterRepetition == 5 && r.afterQuality == 6)
    val (out2, _) = new CorpusPipeline().run(crafted)
    assert(out2.select("doc_id").collect().map(_.getLong(0)).toSet.contains(99L))
  }

  test("docs too short to signal survive the repetition and LM filters") {
    import spark.implicits._
    // doc 1 has <3 tokens (no trigram -> no repetitionSignals row);
    // doc 2 is empty after tokenization (no unigramLogScore row). A
    // missing signal means "nothing to measure", never silent data loss.
    val crafted = Seq(
      (1L, "two words"),
      (2L, ""),
      (3L, "a normal document with plenty of distinct tokens inside it"))
      .toDF("doc_id", "text")
    val (out, r) = new CorpusPipeline(
      maxDup3Frac = Some(0.5), maxLmScore = Some(1e9)).run(crafted)
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L),
      s"short/empty docs must pass signal-less filter stages, got $kept")
    assert(r.afterRepetition == 3 && r.afterLm == 3)
  }

  test("decontamination drops docs overlapping the eval corpus and only them") {
    import spark.implicits._
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely unrelated words about rivers and ducks here"),
      (3L, "quick brown fox jumps over rocks near the river"))
      .toDF("doc_id", "text")
    val eval = Seq((100L, "watch the quick brown fox jumps far")).toDF("doc_id", "text")
    // 4-grams: doc1 shares "the quick brown fox"/"quick brown fox jumps";
    // doc3 shares "quick brown fox jumps"; doc2 is clean
    val (out, r) = new CorpusPipeline(evalCorpus = Some(eval),
      contamNgram = 4).run(train)
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L), s"expected only the clean doc, got $kept")
    assert(r.afterDecontam == 1 && r.afterLm == 3)
  }

  test("text stages execute exactly once (no recompute amplification)") {
    // A row-level accumulator in a typed filter directly under the source
    // counts every time a source row flows through the funnel's text
    // stages. With the Observation + persist design the source is scanned
    // once total across all three actions — the round-2 five-action
    // version scanned it ~5x.
    val n = docs.count()
    val acc = spark.sparkContext.longAccumulator("docScanRows")
    val counted = docs.filter((_: org.apache.spark.sql.Row) => {
      acc.add(1); true
    })
    val (_, r) = new CorpusPipeline(nearDupThreshold = 0.5).run(counted)
    assert(r.input == n)
    assert(acc.value == n,
      s"source rows flowed ${acc.value}x for $n input rows — text stages recomputed")
  }
}
