package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DBSCAN quality on CLUSTERED data (SURVEY E-426). The driver-fixture
  * oracle row (ext_dbscan) proves cross-engine exactness on uniform
  * unit vectors; this spec proves the algorithm finds real structure —
  * on the GenScale embeddings (10 planted clusters, within-distance
  * ≈ 2, between ≈ 7) DBSCAN at eps = 3 must recover the planted
  * partition exactly: 10 clusters, every member core, label-pure,
  * zero noise. Also pins the pivot-banding exactness on clustered
  * geometry (where the bands actually prune) against a brute-force
  * eps-edge count.
  */
class DbscanSpec extends AnyFunSuite with SparkFixture {

  private lazy val vecs =
    graft.tools.GenScale.embeddingsDf(spark, 500L).cache()

  test("recovers the 10 planted clusters exactly at eps=3") {
    val labeled = Dbscan.label(vecs, eps = 3.0, minPts = 4)
      .join(vecs.select("vec_id", "label"), Seq("vec_id"))
    val byCluster = labeled.groupBy("cluster")
      .agg(countDistinct("label").as("n_labels"),
        count(lit(1)).as("n"),
        sum(when(col("role") === "core", 1L).otherwise(0L)).as("n_core"))
      .collect()
    assert(byCluster.length == 10, s"expected 10 clusters, got ${byCluster.length}")
    byCluster.foreach { r =>
      assert(r.getLong(r.fieldIndex("n")) == 50L,
        s"cluster size ${r.getLong(r.fieldIndex("n"))} != 50")
      assert(r.getLong(r.fieldIndex("n_labels")) == 1L,
        "cluster mixes planted labels")
      assert(r.getLong(r.fieldIndex("n_core")) == 50L,
        "every member should be core at eps=3")
    }
    assert(labeled.filter(col("role") === "noise").count() == 0L)
  }

  test("pivot-banded eps-join is exact on clustered geometry") {
    // brute-force eps-edge count (fixture-sized) vs the banded join
    val v = vecs.select(col("vec_id"),
      org.apache.spark.sql.functions.transform(col("embedding"),
        x => x.cast("double")).as("emb"))
    val brute = v.as("a").join(v.as("b"),
        col("a.vec_id") < col("b.vec_id") &&
        graft.functions.VectorFunctions
          .euclideanSq(col("a.emb"), col("b.emb")) <= lit(9.0))
      .count()
    val banded = Dbscan.epsEdges(vecs, eps = 3.0).count()
    assert(banded == brute * 2, s"banded $banded != 2x brute $brute")
  }
}
