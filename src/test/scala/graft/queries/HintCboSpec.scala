package graft.queries

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Plan gates for the hint surface (Q-HINT) and the ANALYZE TABLE /
  * cost-based-optimizer statistics path (PERF-CBO): hints must
  * actually steer the physical join strategy, and computed table
  * statistics must reach the optimizer — the two manual-override and
  * estimate-repair levers a 100 TB job leans on when default size
  * estimates go wrong.
  */
class HintCboSpec extends AnyFunSuite with SparkFixture {

  private def planOf(sql: String): String = {
    spark.sql(sql).queryExecution.sparkPlan.toString
  }

  private def withViews[A](body: => A): A = {
    graft.Tables.table(spark, sf001, "supplier")
      .createOrReplaceTempView("graft_hint_s")
    graft.Tables.table(spark, sf001, "nation")
      .createOrReplaceTempView("graft_hint_n")
    body
  }

  test("Q-HINT: BROADCAST / MERGE / SHUFFLE_HASH hints steer the join strategy") {
    withViews {
      val base = "FROM graft_hint_s s JOIN graft_hint_n n " +
        "ON s.s_nationkey = n.n_nationkey"
      val bc = planOf(s"SELECT /*+ BROADCAST(n) */ s.s_suppkey, n.n_name $base")
      assert(bc.contains("BroadcastHashJoin"), s"BROADCAST hint ignored:\n$bc")
      val smj = planOf(s"SELECT /*+ MERGE(n) */ s.s_suppkey, n.n_name $base")
      assert(smj.contains("SortMergeJoin"), s"MERGE hint ignored:\n$smj")
      val shj = planOf(
        s"SELECT /*+ SHUFFLE_HASH(n) */ s.s_suppkey, n.n_name $base")
      assert(shj.contains("ShuffledHashJoin"), s"SHUFFLE_HASH hint ignored:\n$shj")
    }
  }

  test("Q-HINT: the hinted driver query equals the unhinted plan's result") {
    val hinted = graft.ops.ExtensionQueries109.q134Hints(spark, sf001)
      .collect().map(_.toString).toSeq
    val plain = withViews {
      spark.sql(
        """SELECT n.n_name, COUNT(*) AS n_suppliers,
          |  SUM(CAST(ROUND(s.s_acctbal * 100) AS BIGINT)) AS bal_cents
          |FROM graft_hint_s s JOIN graft_hint_n n
          |  ON s.s_nationkey = n.n_nationkey
          |GROUP BY n.n_name ORDER BY n_suppliers DESC, n.n_name
          |LIMIT 15""".stripMargin).collect().map(_.toString).toSeq
    }
    assert(hinted == plain)
  }

  test("PERF-CBO: ANALYZE TABLE statistics reach the optimizer") {
    spark.sql("DROP TABLE IF EXISTS graft_cbo_nation")
    graft.Tables.table(spark, sf001, "nation")
      .write.mode("overwrite").saveAsTable("graft_cbo_nation")
    val n = spark.table("graft_cbo_nation").count()
    spark.sql("ANALYZE TABLE graft_cbo_nation COMPUTE STATISTICS")
    val withCbo =
      try {
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.table("graft_cbo_nation")
          .queryExecution.optimizedPlan.stats
      } finally spark.conf.set("spark.sql.cbo.enabled", "false")
    assert(withCbo.rowCount.contains(BigInt(n)),
      s"expected rowCount Some($n), got ${withCbo.rowCount}")
    assert(withCbo.sizeInBytes > 0)
    spark.sql("DROP TABLE IF EXISTS graft_cbo_nation")
  }
}
