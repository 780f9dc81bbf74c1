package graft.ops

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite with SparkFixture {

  private lazy val emb = Tables.table(spark, sf001, "embeddings")

  test("brute-force top-k: k rows per probe, self excluded, sims descending") {
    val out = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3), k = 5)
      .collect()
    def idOf(r: org.apache.spark.sql.Row, f: String): Long =
      r.getAs[Number](r.fieldIndex(f)).longValue()
    assert(out.length == 15)
    assert(out.forall(r => idOf(r, "vec_id") != idOf(r, "probe_id")))
    out.groupBy(idOf(_, "probe_id")).foreach { case (_, rows) =>
      val sims = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  /** Planted clusters: 40 cluster centers, 5 members each with small
    * perturbations — the regime ANN is for. LSH must keep high recall
    * vs brute force while examining far fewer pairs.
    */
  test("LSH ANN: high recall on clustered vectors, candidate set far smaller than n^2") {
    val dim = 16
    val rng = new scala.util.Random(5L)
    val vecs = (0 until 40).flatMap { c =>
      val center = Array.fill(dim)(rng.nextGaussian().toFloat)
      (0 until 5).map { m =>
        val v = center.map(x => x + 0.05f * rng.nextGaussian().toFloat)
        (c * 5 + m, v)
      }
    }
    val df = spark.createDataFrame(vecs).toDF("vec_id", "embedding").cache()
    val probes = df.filter(col("vec_id") % 5 === 0)

    val exact = Similarity.bruteForceTopK(df, probes, k = 3).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    val approx = Similarity.lshTopK(df, probes, dim, k = 3,
      bits = 16, radius = 3).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall $recall < 0.8")

    val nCands = Similarity.lshCandidates(df, probes, dim, bits = 16, radius = 3).count()
    val nBrute = df.count() * probes.count()
    assert(nCands < nBrute / 2, s"candidates $nCands not much smaller than $nBrute")
  }

  test("blocked top-pairs equals the all-pairs oracle for any block count") {
    val expected = Similarity.topSimilarPairs(emb, limit = 50).collect().toSeq
    for (b <- Seq(1, 3, 8)) {
      val got = Similarity.blockTopPairs(emb, limit = 50, nBlocks = b).collect().toSeq
      assert(got == expected, s"blockTopPairs(nBlocks=$b) diverged from all-pairs")
    }
  }

  test("blocked top-pairs plans with no join and a top-k sort (scale shape)") {
    val df = Similarity.blockTopPairs(emb, limit = 50, nBlocks = 8)
    val s = df.queryExecution.sparkPlan.toString
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin")
      && !s.contains("SortMergeJoin"),
      s"blocked path grew a join:\n${s.take(2000)}")
    assert(s.contains("TakeOrderedAndProject"),
      s"global top-k is not TakeOrderedAndProject:\n${s.take(2000)}")
  }

  test("hyperplane code is deterministic") {
    val a = emb.select(Similarity.hyperplaneCode(col("embedding"), 64, 16)).collect()
    val b = emb.select(Similarity.hyperplaneCode(col("embedding"), 64, 16)).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq)
  }

  test("native hyperplane_code expression is bit-equal to the composed spec form") {
    val rows = emb.orderBy("vec_id").select(
      Similarity.hyperplaneCode(col("embedding"), 64, 16).as("native"),
      Similarity.hyperplaneCodeComposed(col("embedding"), 64, 16).as("composed"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }
}
