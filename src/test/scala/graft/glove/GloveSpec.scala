package graft.glove

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** T-6 quality gates (SURVEY §5.3) — property tests, never hash-matches
  * on trained floats: loss decreases, no NaN/Inf, seeded reproducibility
  * at fixed parallelism, co-occurring words become neighbors.
  */
class GloveSpec extends AnyFunSuite with SparkFixture {

  // Tiny synthetic corpus with strong structure: (a,b) and (x,y) always
  // adjacent, the two cliques never mix.
  private lazy val corpus = {
    val rng = new scala.util.Random(11L)
    val docs = (0 until 120).map { i =>
      val pair = if (i % 2 == 0) Seq("aa", "bb") else Seq("xx", "yy")
      val toks = (0 until 10).flatMap(_ => rng.shuffle(pair))
      (i.toLong, toks.mkString(" "))
    }
    spark.createDataFrame(docs).toDF("doc_id", "text")
  }

  private def fit(seed: Long = 42L, iters: Int = 15) =
    new Glove(dim = 8, window = 2, minCount = 1, iterations = iters,
      numPartitions = 4, seed = seed).fit(corpus)

  test("loss decreases and stays finite") {
    val m = fit()
    val l = m.lossHistory
    assert(l.nonEmpty && l.forall(x => !x.isNaN && !x.isInfinite))
    assert(l.last < l.head, s"loss did not decrease: ${l.head} -> ${l.last}")
  }

  test("seeded run is reproducible at fixed parallelism") {
    val a = fit().embeddings.orderBy("id").collect().map(_.getSeq[Float](2))
    val b = fit().embeddings.orderBy("id").collect().map(_.getSeq[Float](2))
    assert(a.zip(b).forall { case (u, v) => u == v })
  }

  test("co-occurring words are nearest neighbors") {
    val m = fit(iters = 30)
    val nn = m.findSynonyms("aa", 1).collect()(0).getString(0)
    assert(nn == "bb", s"nearest neighbor of 'aa' was '$nn', expected 'bb'")
    val nn2 = m.findSynonyms("xx", 1).collect()(0).getString(0)
    assert(nn2 == "yy", s"nearest neighbor of 'xx' was '$nn2', expected 'yy'")
  }

  test("asymmetric windows and maxVocab train to a working model") {
    val m = new Glove(dim = 8, window = 2, minCount = 1, iterations = 10,
      numPartitions = 4, symmetric = false, maxVocab = Some(3L)).fit(corpus)
    // 4 words in the corpus, cut to the top 3 ranks
    assert(m.embeddings.count() == 3)
    val l = m.lossHistory
    assert(l.last < l.head && l.forall(x => !x.isNaN && !x.isInfinite))
  }

  test("model save/load round-trips embeddings, dim, loss history and params") {
    val m = fit(iters = 5)
    val dir = java.nio.file.Files.createTempDirectory("glove").toString + "/model"
    m.save(dir)
    val loaded = GloveModel.load(spark, dir) // no dim argument
    assert(loaded.dim == m.dim)
    assert(loaded.lossHistory == m.lossHistory)
    assert(loaded.params == m.params && loaded.params("window") == "2")
    assert(loaded.embeddings.count() == m.embeddings.count())
    // behavioral equality, not just counts: same synonyms, same scores
    assert(loaded.findSynonyms("aa", 3).collect().toSeq ==
      m.findSynonyms("aa", 3).collect().toSeq)
  }

  test("canonical text format round-trips vectors bit-exactly in rank order") {
    val m = fit(iters = 5)
    val dir = java.nio.file.Files.createTempDirectory("glove_txt").toString + "/vectors"
    m.saveText(dir)
    val loaded = GloveModel.loadText(spark, dir)
    assert(loaded.dim == m.dim)
    val orig = m.embeddings.orderBy("id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getSeq[Float](2)))
    val back = loaded.embeddings.orderBy("id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getSeq[Float](2)))
    assert(back.map(_._1).toSeq == orig.map(_._1).toSeq, "rank order lost")
    assert(back.map(_._3).toSeq == orig.map(_._3).toSeq, "vectors not bit-exact")
    // and the loaded model behaves identically
    assert(loaded.findSynonyms("aa", 3).collect().toSeq ==
      m.findSynonyms("aa", 3).collect().toSeq)
  }

  test("transform produces doc vectors of the right shape") {
    val m = fit(iters = 5)
    val out = m.transform(corpus.limit(4))
    val rows = out.collect()
    assert(rows.length == 4)
    assert(rows.forall(r => r.getSeq[Double](r.fieldIndex("doc_vec")).length == 8))
  }
}
