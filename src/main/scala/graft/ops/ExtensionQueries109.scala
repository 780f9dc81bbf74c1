package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-8 extension queries, batch 109: the join-strategy HINT
  * surface (Q-HINT). Hints change the physical plan, never the
  * result — so the oracle gate pins the result while HintCboSpec
  * pins the plans (BROADCAST → BroadcastHashJoin, MERGE →
  * SortMergeJoin, SHUFFLE_HASH → ShuffledHashJoin) and the
  * ANALYZE TABLE / CBO statistics path.
  */
object ExtensionQueries109 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- Q-HINT join strategy hints ---------------------------------------------------
  // The ANSI-text hint surface, run through spark.sql so the hint
  // comments are what's tested: BROADCAST on the dim side of a
  // supplier rollup (what you'd write when the optimizer's size
  // estimate is wrong — the manual override every production job
  // eventually needs). Result must equal the unhinted oracle
  // byte-for-byte; the plan assertions live in HintCboSpec.
  def q134Hints(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "supplier").createOrReplaceTempView("graft_hint_s")
    t(s, dir, "nation").createOrReplaceTempView("graft_hint_n")
    s.sql(
      """SELECT /*+ BROADCAST(n) */ n.n_name,
        |  COUNT(*) AS n_suppliers,
        |  SUM(CAST(ROUND(s.s_acctbal * 100) AS BIGINT)) AS bal_cents
        |FROM graft_hint_s s JOIN graft_hint_n n
        |  ON s.s_nationkey = n.n_nationkey
        |GROUP BY n.n_name
        |ORDER BY n_suppliers DESC, n.n_name
        |LIMIT 15""".stripMargin)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q134_hints" -> (q134Hints _))

  val oracleSql: Map[String, String] = Map(
    "q134_hints" ->
      """select n.n_name, count(*) n_suppliers,
        |  cast(sum(cast(round(s.s_acctbal * 100) as bigint)) as bigint)
        |    bal_cents
        |from supplier s join nation n on s.s_nationkey = n.n_nationkey
        |group by n.n_name
        |order by n_suppliers desc, n.n_name limit 15""".stripMargin)
}
