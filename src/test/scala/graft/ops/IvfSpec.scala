package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvfSpec extends AnyFunSuite with SparkFixture {

  // planted clusters: IVF's home turf (same shape as the LSH ANN spec)
  private lazy val clustered = {
    val dim = 16
    val rng = new scala.util.Random(5L)
    val vecs = (0 until 40).flatMap { c =>
      val center = Array.fill(dim)(rng.nextGaussian().toFloat)
      (0 until 5).map { m =>
        val v = center.map(x => x + 0.05f * rng.nextGaussian().toFloat)
        (c * 5 + m, v)
      }
    }
    spark.createDataFrame(vecs).toDF("vec_id", "embedding").cache()
  }

  test("centroid training is deterministic and produces k centroids") {
    val a = Ivf.trainCentroids(clustered, k = 10, iters = 2).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).sortBy(_._1)
    val b = Ivf.trainCentroids(clustered, k = 10, iters = 2).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).sortBy(_._1)
    assert(a.length == 10)
    assert(a.toSeq == b.toSeq)
  }

  test("assignment covers the corpus exactly once") {
    val centroids = Ivf.trainCentroids(clustered, k = 10, iters = 2)
    val assigned = Ivf.assign(clustered, centroids)
    assert(assigned.count() == clustered.count())
    assert(assigned.select("vec_id").distinct().count() == clustered.count())
  }

  test("index save/load round-trip: search-after-load equals search-before") {
    val probes = clustered.filter(col("vec_id") % 7 === 0)
    val index = Ivf.buildIndex(clustered, kCentroids = 12, iters = 2)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
        .sortBy(x => (x._1, x._4)).toSeq
    val before = canon(Ivf.search(index, probes, k = 3, nProbe = 3))
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    Ivf.save(index, dir)
    val loaded = Ivf.load(spark, dir)
    // the persisted layout is the index structure itself: one
    // filesystem partition per inverted list
    val listDirs = new java.io.File(s"$dir/lists").listFiles()
      .filter(_.getName.startsWith("cid=")).map(_.getName).toSet
    assert(listDirs.size == index.lists.select("cid").distinct().count())
    val after = canon(Ivf.search(loaded, probes, k = 3, nProbe = 3))
    assert(before.nonEmpty && before == after)
  }

  test("IVF top-k: high recall vs brute force on clustered vectors") {
    val probes = clustered.filter(col("vec_id") % 5 === 0)
    val exact = Similarity.bruteForceTopK(clustered, probes, k = 3).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    val approx = Ivf.topK(clustered, probes, k = 3, kCentroids = 20, nProbe = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall < 0.8")
  }
}
