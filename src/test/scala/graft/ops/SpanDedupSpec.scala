package graft.ops

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** E-477 substring-level dedup action: planted-span surgery gates that
  * a DuckDB hash-compare can't express pointwise — who loses, who
  * keeps, and that the rewrite is exact token surgery.
  */
class SpanDedupSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  // deterministic "unique filler" words so no accidental 5-gram repeats
  private def words(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  test("pairwise: the larger doc_id loses exactly the planted span, the smaller keeps") {
    val shared = words("sh", 20) // 20-token planted span (>= 15)
    val d1 = (words("a", 10) ++ shared ++ words("b", 10)).mkString(" ")
    val d2 = (words("c", 7) ++ shared ++ words("d", 13)).mkString(" ")
    val docs = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val out = SpanDedup.removeSharedSpans(docs).orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == d1, "canonical (min doc_id) copy must be untouched")
    assert(out(2L) == (words("c", 7) ++ words("d", 13)).mkString(" "),
      "larger doc_id must lose exactly the planted 20-token span")
  }

  test("spans below the threshold are never removed") {
    val shared = words("sh", 10) // 10 tokens < 15: audit-only territory
    val d1 = (words("a", 10) ++ shared).mkString(" ")
    val d2 = (shared ++ words("d", 10)).mkString(" ")
    val docs = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val out = SpanDedup.removeSharedSpans(docs).orderBy("doc_id")
      .collect().map(_.getString(1))
    assert(out.toSeq == Seq(d1, d2))
  }

  test("cluster: one canonical copy survives per span cluster (min doc_id)") {
    val shared = words("sh", 18)
    val docs = Seq(
      (5L, (words("p", 6) ++ shared).mkString(" ")),
      (7L, (shared ++ words("q", 6)).mkString(" ")),
      (9L, (words("r", 3) ++ shared ++ words("s", 3)).mkString(" ")))
      .toDF("doc_id", "text")
    val kept = SpanDedup.removeSharedSpans(docs)
      .withColumn("has", col("text").contains(shared.mkString(" ")))
      .orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(kept == Map(5L -> true, 7L -> false, 9L -> false),
      s"exactly the minimum doc_id keeps the span: $kept")
  }

  test("overlapping spans from different partners merge before surgery") {
    // doc 9 shares tokens 1..20 with doc 1 and tokens 11..30 with doc 2;
    // the two removal intervals overlap and must merge to one 1..30 cut
    val s1 = words("x", 20)
    val s2 = s1.drop(10) ++ words("y", 10)
    val victim = (s1 ++ words("y", 10) ++ words("z", 8)).mkString(" ")
    val docs = Seq(
      (1L, (words("f", 5) ++ s1).mkString(" ")),
      (2L, (words("g", 5) ++ s2).mkString(" ")),
      (9L, victim)).toDF("doc_id", "text")
    val merged = SpanDedup.mergeSpans(
      SpanDedup.removalSpans(docs, "doc_id", "text"))
      .filter(col("doc_id") === 9L)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(merged.toSeq == Seq((1L, 30L)),
      s"expected one merged [1,30] interval, got ${merged.toSeq}")
    val out = SpanDedup.removeSharedSpans(docs)
      .filter(col("doc_id") === 9L).head().getString(1)
    assert(out == words("z", 8).mkString(" "))
  }

  test("fixture: rewrite audit is self-consistent and planted overlaps vanish") {
    val docs = Tables.table(spark, sf001, "documents")
    val merged = SpanDedup.mergeSpans(
      SpanDedup.removalSpans(docs, "doc_id", "text"))
    val res = SpanDedup.rewrite(docs, merged, "doc_id", "text")
    val rows = res.collect()
    assert(rows.nonEmpty, "fixture must contain removable shared spans")
    // audit identity: tokens_kept tokens in new_text, removed+kept = total
    rows.foreach { r =>
      val kept = r.getAs[Long]("tokens_kept")
      val txt = r.getAs[String]("new_text")
      val n = if (txt.isEmpty) 0 else txt.split(" ", -1).length
      assert(n == kept, s"doc ${r.getLong(0)}: new_text has $n tokens, audit says $kept")
    }
    // idempotence: a second pass over the rewritten corpus finds nothing
    // new at the same threshold among previously-cut docs paired with
    // themselves (their shared spans are gone)
    def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] =
      df.select("doc_id", "text").orderBy("doc_id")
        .collect().toSeq.map(r => (r.getLong(0), r.getString(1)))
    val once = SpanDedup.removeSharedSpans(docs)
    val twice = SpanDedup.removeSharedSpans(once)
    assert(canon(twice) == canon(once), "span removal must be idempotent")
  }
}
