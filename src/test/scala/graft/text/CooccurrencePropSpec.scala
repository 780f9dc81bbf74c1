package graft.text

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck generator-driven properties for the co-occurrence kernel
  * (SURVEY §5.3) — corpora are generated (seeded, reproducible), not
  * fixture-derived, so the invariants hold on arbitrary token streams.
  * (The scalatest/scalacheck bridge artifact is not in the offline
  * cache, so generators are sampled directly.)
  */
class CooccurrencePropSpec extends AnyFunSuite with SparkFixture {

  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    nDocs <- Gen.choose(1, 15)
    docs <- Gen.listOfN(nDocs, for {
      n <- Gen.choose(0, 14)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e"))
    } yield toks.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g(Gen.Parameters.default, Seed(i.toLong)))

  test("pair mass equals the closed form on generated corpora") {
    for (docs <- samples(corpusGen, 6); w <- Seq(1, 3)) {
      val df = spark.createDataFrame(docs).toDF("doc_id", "text")
      val mass = Cooccurrence.wordPairs(df, w).agg(sum("wt")).collect()(0)
      val got = if (mass.isNullAt(0)) 0.0 else mass.getDouble(0)
      val expected = docs.map { case (_, text) =>
        val n = text.split(" ", -1).length // split keeps empties, as the kernel does
        2.0 * (1 to w).map(d => math.max(0, n - d) / d.toDouble).sum
      }.sum
      assert(math.abs(got - expected) < 1e-9, s"w=$w docs=${docs.take(2)}")
    }
  }

  test("aggregated matrix is symmetric on generated corpora") {
    for (docs <- samples(corpusGen, 6)) {
      val df = spark.createDataFrame(docs).toDF("doc_id", "text")
      val agg = Cooccurrence.aggregated(df, window = 2).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
      agg.foreach { case ((w1, w2), x) =>
        assert(math.abs(agg((w2, w1)) - x) < 1e-9, s"asymmetric at ($w1,$w2)")
      }
    }
  }
}
