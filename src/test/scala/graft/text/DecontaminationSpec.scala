package graft.text

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DecontaminationSpec extends AnyFunSuite with SparkFixture {

  test("ngrams: overlapping windows, short docs yield empty") {
    import spark.implicits._
    val got = Seq("a b c d", "a b", "").toDF("text")
      .select(Decontamination.ngrams(col("text"), 3).as("g"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(List("a b c", "b c d"), Nil, Nil))
  }

  test("contaminated: planted eval overlap is flagged, clean docs absent") {
    import spark.implicits._
    val train = Seq(
      (1L, "the quick brown fox jumps over the dog"), // shares 4-gram
      (2L, "totally unrelated text with no overlap at all"),
      (3L, "quick brown fox jumps again and again and again")) // shares too
      .toDF("doc_id", "text")
    val eval = Seq((100L, "the quick brown fox jumps high")).toDF("doc_id", "text")
    val got = Decontamination.contaminated(train, eval, n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc1 shares "the quick brown fox" and "quick brown fox jumps";
    // doc3 shares "quick brown fox jumps"; doc2 is clean
    assert(got == Map(1L -> 2L, 3L -> 1L))
  }

  test("repetitionSignals: crafted fractions are exact") {
    import spark.implicits._
    // doc 1: "a b a b a b" → 3-grams: "a b a","b a b","a b a","b a b"
    //   (n3=4, all duplicated → dup3=4); bigrams: a b, b a, a b, b a, a b
    //   (n2=5, top "a b" ×3)
    // doc 2: all distinct trigrams/bigrams → dup3=0, top2=1
    val df = Seq((1L, "a b a b a b"), (2L, "v w x y z")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionSignals(df)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toList
    assert(got == List(
      (1L, 4L, 4L, 1.0, 5L, 3L, 0.6),
      (2L, 3L, 0L, 0.0, 4L, 1L, 0.25)))
  }
}
