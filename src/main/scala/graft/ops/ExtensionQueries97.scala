package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-8 extension queries, batch 97: ANSI SQL surface completions —
  * three constructs a reference SQL user reaches for that had no §2
  * row yet: NATURAL JOIN, inline VALUES relations, and the standard
  * `agg(...) FILTER (WHERE ...)` modifier. Each runs through
  * `spark.sql` so the TEXT is the operator under test (Spark parses,
  * plans and executes the same ANSI form DuckDB evaluates).
  */
object ExtensionQueries97 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- Q-NAT natural join -----------------------------------------------------------
  // nation NATURAL JOIN region after projecting the shared key name:
  // the implicit equi-join resolves on the common column and emits it
  // once. Plans exactly like the explicit JOIN (broadcast on the
  // 5-row side) — the construct is sugar, the row proves the parser
  // and the dedup-column semantics.
  def qNaturalJoin(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "nation").createOrReplaceTempView("graft_nat_n")
    t(s, dir, "region")
      .withColumnRenamed("r_regionkey", "n_regionkey")
      .createOrReplaceTempView("graft_nat_r")
    s.sql(
      """SELECT n_regionkey, r_name, count(*) AS n_nations,
        |  min(n_name) AS first_nation
        |FROM graft_nat_n NATURAL JOIN graft_nat_r
        |GROUP BY n_regionkey, r_name
        |ORDER BY n_regionkey""".stripMargin)
  }

  // ---- Q-VAL inline VALUES relation ---------------------------------------------------
  // A literal lookup table joined against a scan — the idiom for
  // small reference data embedded in query text (tier thresholds
  // here). VALUES plans as a LocalRelation: zero scan, broadcast side
  // by construction.
  def qValues(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("graft_val_c")
    s.sql(
      """SELECT t.tier, count(*) AS n_customers,
        |  cast(min(c.c_acctbal) as double) AS min_bal,
        |  cast(max(c.c_acctbal) as double) AS max_bal
        |FROM graft_val_c c
        |JOIN (VALUES ('negative', cast(-10000 as double), cast(0 as double)),
        |             ('low',      cast(0 as double),      cast(3000 as double)),
        |             ('mid',      cast(3000 as double),   cast(7000 as double)),
        |             ('high',     cast(7000 as double),   cast(100000 as double)))
        |  AS t(tier, lo, hi)
        |  ON c.c_acctbal >= t.lo AND c.c_acctbal < t.hi
        |GROUP BY t.tier
        |ORDER BY min_bal""".stripMargin)
  }

  // ---- Q-FIL aggregate FILTER clause ---------------------------------------------------
  // The SQL-standard per-aggregate predicate — one scan computing
  // differently-filtered aggregates side by side (the idiom that
  // replaces N scans or N CASE pyramids).
  def qFilterAgg(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("graft_fil_o")
    s.sql(
      """SELECT o_orderpriority,
        |  count(*) AS n_orders,
        |  count(*) FILTER (WHERE o_totalprice > 100000) AS n_large,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
        |  cast(sum(round(o_totalprice * 100)) FILTER (WHERE o_orderstatus = 'O')
        |    AS bigint) AS open_cents
        |FROM graft_fil_o
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q130_natural" -> (qNaturalJoin _),
    "q131_values" -> (qValues _),
    "q132_filteragg" -> (qFilterAgg _))

  val oracleSql: Map[String, String] = Map(
    // Q-NAT: DuckDB evaluates the same NATURAL JOIN over the same
    // renamed projection.
    "q130_natural" ->
      """with n as (select * from nation),
        |r as (select r_regionkey n_regionkey, r_name from region)
        |select n_regionkey, r_name, cast(count(*) as bigint) n_nations,
        |  min(n_name) first_nation
        |from n natural join r
        |group by n_regionkey, r_name
        |order by n_regionkey""".stripMargin,

    // Q-VAL: identical inline VALUES tier table.
    "q131_values" ->
      """select t.tier, cast(count(*) as bigint) n_customers,
        |  cast(min(c.c_acctbal) as double) min_bal,
        |  cast(max(c.c_acctbal) as double) max_bal
        |from customer c
        |join (values ('negative', cast(-10000 as double), cast(0 as double)),
        |             ('low',      cast(0 as double),      cast(3000 as double)),
        |             ('mid',      cast(3000 as double),   cast(7000 as double)),
        |             ('high',     cast(7000 as double),   cast(100000 as double)))
        |  t(tier, lo, hi)
        |  on c.c_acctbal >= t.lo and c.c_acctbal < t.hi
        |group by t.tier
        |order by min_bal""".stripMargin,

    // Q-FIL: identical FILTER-modified aggregates.
    "q132_filteragg" ->
      """select o_orderpriority,
        |  cast(count(*) as bigint) n_orders,
        |  cast(count(*) filter (where o_totalprice > 100000) as bigint) n_large,
        |  cast(count(*) filter (where o_orderstatus = 'F') as bigint) n_finished,
        |  cast(sum(round(o_totalprice * 100)) filter (where o_orderstatus = 'O')
        |    as bigint) open_cents
        |from orders
        |group by o_orderpriority
        |order by o_orderpriority""".stripMargin)
}
