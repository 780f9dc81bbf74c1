package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** E-478/E-479 planted gates: repeat-length measurement and trim
  * surgery on hand-verified loops — cases a DuckDB hash compare can't
  * express pointwise.
  */
class SelfRepeatSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def trim(docs: org.apache.spark.sql.DataFrame) = {
    val r = ExtensionQueries128.extSelfrepeatTrimOn(docs)
    r.collect().map(x => x.getLong(0) ->
      (x.getAs[Long]("tokens_removed"), x.getAs[String]("new_text"))).toMap
  }

  test("degenerate loop collapses to one canonical copy, first occurrence kept") {
    // "a a a a a": all later copies' intervals chain-overlap and merge
    // to [2,5]; "x y z x y z": exact tandem repeat loses [4,6]
    val docs = Seq(
      (1L, "a a a a a"),
      (2L, "x y z x y z"),
      (3L, "plain words with no repeats here")).toDF("doc_id", "text")
    val out = trim(docs)
    assert(out(1L) == (4L, "a"), s"loop doc: ${out.get(1L)}")
    assert(out(2L) == (3L, "x y z"), s"tandem doc: ${out.get(2L)}")
    assert(!out.contains(3L), "untouched docs are not emitted")
  }

  test("separated repeats each lose only the later copy") {
    // distinct fillers so the only repeated 3-gram is "p q r" itself
    // (a shared filler word would extend the repeated span — the first
    // draft used "filler" twice and correctly lost "p q r filler")
    val d = "p q r alpha one p q r beta two p q r"
    val docs = Seq((7L, d)).toDF("doc_id", "text")
    val out = trim(docs)
    // later copies at tokens 6..8 and 11..13 are removed; the head copy
    // and fillers survive
    assert(out(7L)._2 == "p q r alpha one beta two",
      s"got '${out(7L)._2}'")
    assert(out(7L)._1 == 6L)
  }

  test("trim is idempotent and measurement-consistent on the fixture") {
    val docs = graft.Tables.table(spark, sf001, "documents")
    val once = ExtensionQueries128.extSelfrepeatTrimOn(docs)
    // every rewritten doc's new_text must contain no repeated 3-gram
    // above the cap floor — i.e. a second pass finds nothing
    val rewritten = once.select(col("doc_id"), col("new_text").as("text"))
    val twice = ExtensionQueries128.extSelfrepeatTrimOn(rewritten)
    assert(twice.isEmpty,
      s"second trim pass still found repeats: ${twice.collect().take(3).mkString}")
    // audit identity vs the E-478 measurement: exactly the docs with a
    // measured repeat >= 3 tokens are rewritten
    val measured = ExtensionQueries128.extSelfrepeat(spark, sf001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val trimmed = once.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(trimmed == measured,
      s"trimmed ${trimmed.size} docs != measured ${measured.size}")
  }
}
