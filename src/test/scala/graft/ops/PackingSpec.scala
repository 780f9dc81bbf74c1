package graft.ops

import graft.{SparkFixture, Tables}
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite with SparkFixture {

  private lazy val toks = TextAnalysis.tokenCounts(
      Tables.table(spark, sf001, "documents"))
    .select(col("doc_id"), col("ws_tokens").as("n_tokens"))

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.orderBy("doc_id").collect().map(_.toSeq).toSeq

  test("scalable prefix-sum packing is byte-identical to the window form") {
    val a = canon(Packing.packWindow(toks, capacity = 512))
    val b = canon(Packing.packScalable(toks, capacity = 512))
    assert(a == b)
    // also under a skewed partitioning of the input
    val c = canon(Packing.packScalable(toks.repartition(7), capacity = 512))
    assert(a == c)
  }

  test("every doc assigned once; bins contiguous and nondecreasing in id order") {
    val packed = Packing.packScalable(toks, capacity = 512)
    assert(packed.count() == toks.count())
    val rows = packed.orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
      assert(b._3 == a._3 + a._2, "cum_before must be the exclusive prefix sum")
      assert(b._4 >= a._4, "bins must be nondecreasing in id order")
    }
    // bin boundary law: bin = floor(cum_before / C)
    assert(rows.forall { case (_, _, cb, bin) => bin == cb / 512 })
  }

  test("a bin never starts mid-capacity: first doc of bin b has cum_before in [b*C, (b+1)*C)") {
    val packed = Packing.packScalable(toks, capacity = 512)
    val firsts = packed.groupBy("bin").agg(min("cum_before").as("cb"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(firsts.forall { case (b, cb) => cb >= b * 512 && cb < (b + 1) * 512 })
  }
}
