package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Proves the SparkSessionExtensions injection path: a session built
  * with spark.sql.extensions=graft.functions.GraftExtensions has
  * cosine_sim available in SQL with no imperative registration.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("cosine_sim is injected via spark.sql.extensions") {
    // extensions apply at SparkSession CONSTRUCTION: clear the
    // active/default session (other suites share this JVM) so
    // getOrCreate builds a fresh session (reusing the SparkContext)
    // instead of returning one without the extension
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // NB: `.config("spark.sql.extensions", ...)` only works when the
      // SparkContext itself is new (it is a static conf read from the
      // context); `.withExtensions` is the per-session injection path
      // and runs the same GraftExtensions hook.
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val r = spark.sql(
        "select cosine_sim(array(3.0D,4.0D), array(3.0D,4.0D)) s").collect()(0)
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      // every injected native function resolves + evaluates in SQL
      val r2 = spark.sql(
        """select hyperplane_code(array(1.0F, -1.0F), 2, 4, 42L) hc,
          |       minhash_signature(array(7L, 8L, 9L), 4) ms,
          |       sorted_long_jaccard(array(1L,2L,3L), array(2L,3L,4L)) j,
          |       simhash64(array('a','b','a')) sh""".stripMargin).collect()(0)
      assert(!r2.isNullAt(0))
      assert(r2.getSeq[Long](1).length == 4)
      assert(math.abs(r2.getDouble(2) - 0.5) < 1e-12)
      assert(!r2.isNullAt(3))
      // the Bloom pair round-trips end-to-end in pure SQL: build bits
      // over 1..3, probe members and a non-member
      // the filter side must be a constant or scalar subquery —
      // BloomFilterMightContain rejects a plain column reference
      val r3 = spark.sql(
        """select graft_might_contain(
          |    (select graft_bloom_agg(x, 100)
          |     from (select explode(array(1L, 2L, 3L)) x)), 2L) hit,
          |  graft_might_contain(
          |    (select graft_bloom_agg(x, 100)
          |     from (select explode(array(1L, 2L, 3L)) x)), 999999L) miss""".stripMargin)
        .collect()(0)
      assert(r3.getBoolean(0), "bloom must contain an inserted key")
      assert(!r3.getBoolean(1), "bloom fp on the probe key")
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
