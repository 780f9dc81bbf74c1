package graft.ops

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the round-6 batch-11 queries on fixture invariants;
  * DuckDB value equality is the ext_* contracts' job.
  */
class Batch11Spec extends AnyFunSuite with SparkFixture {

  test("g2 keyness is non-negative and respects the top-k contract") {
    val rows = ExtensionQueries11.extG2(spark, sf001).collect()
    assert(rows.length == 20)
    rows.foreach(r => assert(r.getAs[Double]("g2") >= 0.0))
    val scores = rows.map(_.getAs[Double]("g2"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("ltv curves are cohort-monotone and cents-exact") {
    val rows = ExtensionQueries11.extLtv(spark, sf001)
      .orderBy("cohort", "wk").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[java.sql.Date]("cohort")).foreach { case (_, rs) =>
      val cums = rs.sortBy(_.getAs[Long]("wk")).map(_.getAs[Long]("cum_rev_cents"))
      assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    }
  }

  test("churn rates are valid shares; retained never exceeds active") {
    val rows = ExtensionQueries11.extChurn(spark, sf001).orderBy("wk").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_retained") <= r.getAs[Long]("n_active"))
      val c = r.getAs[Double]("churn_rate")
      assert(c >= 0.0 && c <= 1.0)
    }
    // final data-edge week churns 100% by construction
    assert(rows.last.getAs[Double]("churn_rate") == 1.0)
  }

  test("rank migration keeps exactly the H1 top-20 with valid sentinels") {
    val rows = ExtensionQueries11.extRankChurn(spark, sf001).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getAs[Int]("rank_h1")).toSeq == (1 to 20))
    rows.foreach { r =>
      val rk2 = r.getAs[Int]("rank_h2")
      assert(rk2 == -1 || rk2 >= 1)
      if (rk2 == -1) assert(r.getAs[Int]("delta") == 0)
    }
  }

  test("audience overlap covers every type pair with valid Jaccard") {
    val rows = ExtensionQueries11.extUserOverlap(spark, sf001).collect()
    val nTypes = Tables.table(spark, sf001, "events")
      .select("event_type").distinct().count().toInt
    assert(rows.length == nTypes * (nTypes - 1) / 2)
    rows.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
    }
  }
}
