package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SemDedupSpec extends AnyFunSuite with SparkFixture {

  test("cluster-scoped pairs find planted exact copies and nothing else") {
    val base = graft.Tables.table(spark, sf0001, "embeddings")
      .select("vec_id", "embedding")
    val planted = base.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    val nPlanted = planted.count()
    val got = SemDedup.clusterScopedDupPairs(base.unionAll(planted),
        k = 4, iters = 2, tau = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == nPlanted, s"expected $nPlanted pairs, got ${got.length}")
    assert(got.forall { case (k, d, c) => d == k + 10000 && c > 0.9999 })
  }

  test("scoping really restricts comparisons to one cluster (pair count < all-pairs)") {
    // With tau = -1 every compared pair survives, so the result size IS
    // the number of comparisons: cluster-scoped must be well under n²/2.
    val base = graft.Tables.table(spark, sf0001, "embeddings")
      .select("vec_id", "embedding").limit(60).cache()
    val n = base.count()
    val compared = SemDedup.clusterScopedDupPairs(base, k = 4, iters = 2,
      tau = -1.0).count()
    assert(compared < n * (n - 1) / 2,
      s"scoped comparisons $compared not < all-pairs ${n * (n - 1) / 2}")
    base.unpersist()
  }
}
