package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 47: recommendations and service
  * quality — item-item collaborative cosine over binary co-purchase
  * vectors, the Apdex satisfaction score as an exact rational, and
  * SLO error-budget burn with integer cross-multiplied verdicts.
  */
object ExtensionQueries47 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-298 item-item collaborative similarity ----------------------------------
  // "Customers who bought X also bought Y": cosine between brands'
  // binary customer vectors — sim = co(a,b)/√(nₐ·n_b) from pure
  // co-occurrence counts (one pair join keyed on customer, 25-brand
  // item space so the pair fan-out is bounded by per-customer brand
  // breadth). The memory-based recsys baseline; top-10 pairs on the
  // rounded score.
  def extItemknn(s: SparkSession, dir: String): DataFrame = {
    val bought = t(s, dir, "orders")
      .join(t(s, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(t(s, dir, "part")),
        col("l_partkey") === col("p_partkey"))
      .select(col("o_custkey").as("c"), col("p_brand").as("b")).distinct()
    val nb = bought.groupBy("b").agg(count(lit(1)).as("n"))
    val co = bought.select(col("c"), col("b").as("ba"))
      .join(bought.select(col("c"), col("b").as("bb")), "c")
      .filter(col("ba") < col("bb"))
      .groupBy("ba", "bb").agg(count(lit(1)).as("co"))
    co.join(nb.select(col("b").as("ba"), col("n").as("na")), "ba")
      .join(nb.select(col("b").as("bb"), col("n").as("nbb")), "bb")
      .select(col("ba"), col("bb"), col("co"), col("na"), col("nbb"),
        round(col("co").cast("double") /
          sqrt(col("na").cast("double") * col("nbb")), 6).as("cosine"))
      .orderBy(desc("cosine"), asc("ba"), asc("bb"))
      .limit(10)
  }

  // ---- E-299 Apdex score ---------------------------------------------------------
  // The industry latency-satisfaction summary per event type (value
  // cents standing in for ms): satisfied ≤ 500, tolerating ≤ 2000,
  // Apdex = (2·sat + tol)/(2·n) — an exact rational, one settled
  // division, with the band counts beside it.
  def extApdex(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("ms"))
    e.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("ms") <= 500, 1L).otherwise(0L)).as("n_sat"),
        sum(when(col("ms") > 500 && col("ms") <= 2000, 1L).otherwise(0L))
          .as("n_tol"),
        sum(when(col("ms") > 2000, 1L).otherwise(0L)).as("n_frust"))
      .select(col("event_type"), col("n"), col("n_sat"), col("n_tol"),
        col("n_frust"),
        round((lit(2) * col("n_sat") + col("n_tol")).cast("double") /
          (lit(2) * col("n")), 6).as("apdex"))
      .orderBy("event_type")
  }

  // ---- E-300 SLO error-budget burn -----------------------------------------------
  // 95%-success SLO over the event stream ("failure" = value < $1):
  // cumulative failures against the cumulative 5% budget, the
  // over-budget verdict by INTEGER cross-multiply (20·cum_err >
  // cum_n), burn reported as the budget-consumed share. The last 10
  // days of the ledger — the on-call view of E-214's SLA attainment.
  def extErrorbudget(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("dy"))
      .agg(count(lit(1)).as("n"),
        sum(when(round(col("value") * 100) < 100, 1L).otherwise(0L))
          .as("errs"))
    val w = Window.orderBy("dy").rowsBetween(Window.unboundedPreceding, 0)
    daily
      .withColumn("cum_n", sum("n").over(w))
      .withColumn("cum_err", sum("errs").over(w))
      .select(col("dy").cast("string").as("dy"), col("n"), col("errs"),
        col("cum_n"), col("cum_err"),
        round(col("cum_err").cast("double") * 20 / col("cum_n"), 4)
          .as("budget_burned"),
        (col("cum_err") * 20 > col("cum_n")).as("over_budget"))
      .orderBy(desc("dy")).limit(10)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_itemknn" -> (extItemknn _),
    "ext_apdex" -> (extApdex _),
    "ext_errorbudget" -> (extErrorbudget _))

  val oracleSql: Map[String, String] = Map(
    // E-298: identical binary-vector cosine counts.
    "ext_itemknn" ->
      """with bought as (select distinct o_custkey c, p_brand b
        |  from orders join lineitem on o_orderkey = l_orderkey
        |  join part on l_partkey = p_partkey),
        |nb as (select b, cast(count(*) as bigint) n from bought group by b),
        |co as (select a.b ba, x.b bb, cast(count(*) as bigint) co
        |  from bought a join bought x on a.c = x.c and a.b < x.b
        |  group by a.b, x.b)
        |select ba, bb, co, na.n na, nbb.n nbb,
        |  round(cast(co as double) / sqrt(cast(na.n as double) * nbb.n), 6)
        |    cosine
        |from co join nb na on na.b = ba join nb nbb on nbb.b = bb
        |order by cosine desc, ba, bb limit 10""".stripMargin,

    // E-299: identical bands and rational Apdex.
    "ext_apdex" ->
      """with e as (select event_type,
        |    cast(round(value * 100) as bigint) ms from events)
        |select event_type, cast(count(*) as bigint) n,
        |  cast(sum(case when ms <= 500 then 1 else 0 end) as bigint) n_sat,
        |  cast(sum(case when ms > 500 and ms <= 2000 then 1 else 0 end)
        |    as bigint) n_tol,
        |  cast(sum(case when ms > 2000 then 1 else 0 end) as bigint)
        |    n_frust,
        |  round(cast(2 * sum(case when ms <= 500 then 1 else 0 end)
        |    + sum(case when ms > 500 and ms <= 2000 then 1 else 0 end)
        |    as double) / (2 * count(*)), 6) apdex
        |from e group by event_type order by event_type""".stripMargin,

    // E-300: identical cumulative ledger and cross-multiplied verdict.
    "ext_errorbudget" ->
      """with daily as (select cast(ts as date) dy,
        |    cast(count(*) as bigint) n,
        |    cast(sum(case when round(value * 100) < 100 then 1 else 0 end)
        |      as bigint) errs
        |  from events group by 1),
        |c as (select dy, n, errs,
        |    cast(sum(n) over (order by dy rows unbounded preceding)
        |      as bigint) cum_n,
        |    cast(sum(errs) over (order by dy rows unbounded preceding)
        |      as bigint) cum_err
        |  from daily)
        |select strftime(dy, '%Y-%m-%d') dy, n, errs, cum_n, cum_err,
        |  round(cast(cum_err as double) * 20 / cum_n, 4) budget_burned,
        |  cum_err * 20 > cum_n over_budget
        |from c order by dy desc limit 10""".stripMargin)
}
