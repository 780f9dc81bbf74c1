package graft.glove

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Quality gates for the block-partitioned (large-V) trainer — same
  * §5.3 contract as the broadcast path: loss decreases, finite, seeded
  * reproducibility, co-occurrence structure becomes neighborhood
  * structure. Float equality with the broadcast path is explicitly NOT
  * claimed (different update schedule, SURVEY §7.3.1).
  */
class GloveBlockSpec extends AnyFunSuite with SparkFixture {

  private lazy val corpus = {
    val rng = new scala.util.Random(11L)
    val docs = (0 until 120).map { i =>
      val pair = if (i % 2 == 0) Seq("aa", "bb") else Seq("xx", "yy")
      val toks = (0 until 10).flatMap(_ => rng.shuffle(pair))
      (i.toLong, toks.mkString(" "))
    }
    spark.createDataFrame(docs).toDF("doc_id", "text")
  }

  private def fit(iters: Int) =
    new Glove(dim = 8, window = 2, minCount = 1, iterations = iters,
      numPartitions = 4, seed = 42L, distributed = Some(true)).fit(corpus)

  test("block trainer: loss decreases, finite, and neighbors follow co-occurrence") {
    val m = fit(12)
    val l = m.lossHistory
    assert(l.nonEmpty && l.forall(x => !x.isNaN && !x.isInfinite))
    assert(l.last < l.head, s"loss did not decrease: ${l.head} -> ${l.last}")
    assert(m.embeddings.count() == 4)
    val nn = m.findSynonyms("aa", 1).collect()(0).getString(0)
    assert(nn == "bb", s"nearest neighbor of 'aa' was '$nn'")
  }

  test("block trainer: auto strategy picks broadcast for tiny vocab") {
    // default auto mode on a 4-word vocab must take the broadcast path
    // and still produce the same-shaped model
    val m = new Glove(dim = 8, window = 2, minCount = 1, iterations = 2,
      numPartitions = 4, seed = 42L).fit(corpus)
    assert(m.embeddings.columns.toSeq == Seq("word", "id", "vec"))
    assert(m.embeddings.count() == 4)
  }
}
