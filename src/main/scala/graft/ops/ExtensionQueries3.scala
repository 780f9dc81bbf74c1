package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 extension queries, batch 3: the inferential-statistics and
  * time-series family a data-quality / experimentation team runs over
  * the warehouse — rank-sum tests, survival curves, autocorrelation,
  * changepoint scan, grouped jackknife error bars.
  *
  * Determinism discipline is SURVEY §5.2: every float is rounded
  * in-query on both sides, every ranking runs on the rounded value
  * with a unique tiebreak, and DuckDB integer aggregates are cast
  * back to BIGINT in the oracle (sum on ints is HUGEINT there).
  *
  * Scale notes (100 TB): the spec formulations below use global
  * windows over ALREADY-AGGREGATED frames (distinct ranks, daily
  * series, per-group rows) — thousands of rows after the big keyed
  * shuffle, never the raw table. The one exception, Mann-Whitney's
  * global rank over raw measurements, degrades gracefully: at corpus
  * scale the identical U statistic comes from binned counts (the test
  * only needs rank sums, which a value-histogram join reproduces), so
  * the production path is a two-pass bin + prefix-sum, not a sort.
  */
object ExtensionQueries3 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-100 Mann-Whitney U rank-sum test ----------------------------------
  // Nonparametric "are click values drawn from the same distribution
  // as view values": average ranks (ties shared), tie-corrected
  // variance, normal approximation. The tie term sums (t^3 - t) via
  // its per-row identity sum(cnt^2 - 1) so one aggregate produces the
  // whole statistic — no second pass, no 1-row cross join.
  def extMannWhitney(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .filter(col("event_type").isin("click", "view"))
      .select(when(col("event_type") === "click", 1L).otherwise(0L).as("g1"),
        col("value").as("v"))
    val ranked = ev
      .withColumn("rnk", rank().over(Window.orderBy("v")))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("v")))
      .withColumn("ar", col("rnk") + (col("cnt") - 1) / lit(2.0))
    ranked
      .agg(sum(when(col("g1") === 1, col("ar"))).as("r1"),
        sum(col("g1")).as("n1"),
        count(lit(1)).as("ntot"),
        sum(col("cnt") * col("cnt") - 1).as("tie"))
      .select(col("n1"), (col("ntot") - col("n1")).as("n2"),
        round(col("r1") - col("n1") * (col("n1") + 1) / lit(2.0), 2).as("u1"),
        round(
          (col("r1") - col("n1") * (col("n1") + 1) / lit(2.0)
            - col("n1") * (col("ntot") - col("n1")) / lit(2.0))
            / sqrt(col("n1") * (col("ntot") - col("n1")) / lit(12.0)
              * (col("ntot") + 1
                - col("tie") / (col("ntot") * (col("ntot") - lit(1.0))))),
          4).as("z"))
  }

  // ---- E-101 Kaplan-Meier survival curve -----------------------------------
  // Time-to-first-shipment per order; open orders (status 'O') are
  // right-censored at their observed duration. Risk table built
  // WITHOUT a self-join: group to distinct durations, then n_at_risk
  // is total minus the exclusive prefix count and the product-limit
  // estimator is exp(prefix-sum of ln(1 - d/n)) — an ordered window
  // over ~5k distinct-duration rows, not the raw order table. A
  // d = n tail (survival exactly 0) is guarded by a prefix max flag
  // because Spark ln(0) is NULL while DuckDB's is -inf.
  def extKaplanMeier(s: SparkSession, dir: String): DataFrame = {
    val firstShip = t(s, dir, "lineitem")
      .groupBy("l_orderkey").agg(min("l_shipdate").as("ship0"))
    val dur = t(s, dir, "orders")
      .join(firstShip, col("o_orderkey") === col("l_orderkey"))
      .select(
        datediff(to_date(col("ship0")), to_date(col("o_orderdate")))
          .cast("long").as("tt"),
        when(col("o_orderstatus") =!= "O", 1L).otherwise(0L).as("ev"))
    val byT = dur.groupBy("tt")
      .agg(sum("ev").as("d"), count(lit(1)).as("m"))
    val wPrev = Window.orderBy("tt").rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy("tt").rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy()
    byT
      .withColumn("n_risk",
        sum("m").over(wAll) - coalesce(sum("m").over(wPrev), lit(0L)))
      .withColumn("f", lit(1.0) - col("d") / col("n_risk"))
      .withColumn("zero_seen",
        max(when(col("f") === 0, 1).otherwise(0)).over(wCum))
      .withColumn("surv",
        when(col("zero_seen") === 1, lit(0.0))
          .otherwise(exp(sum(when(col("f") > 0, log(col("f")))).over(wCum))))
      .filter(col("d") > 0)
      .select(col("tt"), col("n_risk"), col("d"), round(col("surv"), 4).as("surv"))
      .orderBy("tt")
      .limit(25)
  }

  // ---- E-102 autocorrelation function (lags 1..7) --------------------------
  // ACF of the daily-revenue series: one pass builds deviations from
  // the series mean, seven lag columns feed a single aggregate, and
  // stack() unpivots the seven ratios. The window frame is the
  // 2.4k-row daily series — the raw table never sees a global sort.
  def extAcf(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(to_date(date_trunc("day", col("o_orderdate"))).as("dy"))
      .agg(sum("o_totalprice").as("x"))
    val wAll = Window.partitionBy()
    val w = Window.orderBy("dy")
    val dev = daily
      .withColumn("dev", col("x") - avg("x").over(wAll))
    val withLags = (1 to 7).foldLeft(dev) { (df, k) =>
      df.withColumn(s"l$k", lag("dev", k).over(w))
    }
    val agg = withLags.agg(
      sum(col("dev") * col("dev")).as("s0"),
      sum(col("dev") * col("l1")).as("s1"),
      sum(col("dev") * col("l2")).as("s2"),
      sum(col("dev") * col("l3")).as("s3"),
      sum(col("dev") * col("l4")).as("s4"),
      sum(col("dev") * col("l5")).as("s5"),
      sum(col("dev") * col("l6")).as("s6"),
      sum(col("dev") * col("l7")).as("s7"))
    agg.selectExpr(
      """stack(7,
        |  1L, round(s1/s0, 4), 2L, round(s2/s0, 4), 3L, round(s3/s0, 4),
        |  4L, round(s4/s0, 4), 5L, round(s5/s0, 4), 6L, round(s6/s0, 4),
        |  7L, round(s7/s0, 4)) as (lag_k, acf)""".stripMargin)
      .orderBy("lag_k")
  }

  // ---- E-103 CUSUM changepoint scan ----------------------------------------
  // Where did the daily event volume shift? Cumulative sum of
  // deviations from the series mean; the top-|CUSUM| days locate the
  // change. Ranking runs on the ROUNDED statistic with the day as
  // tiebreak so ulp noise cannot reorder the cut.
  def extCusum(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(to_date(date_trunc("day", col("ts"))).as("dy"))
      .agg(count(lit(1)).as("n"))
    val wAll = Window.partitionBy()
    val w = Window.orderBy("dy")
    daily
      .withColumn("mu", avg(col("n").cast("double")).over(wAll))
      .withColumn("cusum", round(sum(col("n") - col("mu")).over(w), 4))
      .orderBy(abs(col("cusum")).desc, col("dy").asc)
      .limit(5)
      .select(col("dy"), col("n"), col("cusum"))
  }

  // ---- E-104 grouped jackknife standard error ------------------------------
  // Delete-one-nation jackknife for the mean customer balance: each
  // leave-one-out mean comes from the group sums (no re-scan), and the
  // jackknife SE over the G group estimates lands as a constant column
  // so the whole diagnostic is one relation. The windows run over the
  // 25-row per-nation frame.
  def extJackknife(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum("c_acctbal").as("sg"), count(lit(1)).as("ng"))
    val wAll = Window.partitionBy()
    per
      .withColumn("theta",
        (sum("sg").over(wAll) - col("sg")) / (sum("ng").over(wAll) - col("ng")))
      .withColumn("gcnt", count(lit(1)).over(wAll))
      .withColumn("tbar", avg("theta").over(wAll))
      .withColumn("jack_se",
        round(sqrt((col("gcnt") - lit(1.0)) / col("gcnt")
          * sum(pow(col("theta") - col("tbar"), 2)).over(wAll)), 4))
      .select(col("n_name"), col("ng").as("n_cust"),
        round(col("theta"), 4).as("loo_mean"), col("jack_se"))
      .orderBy("n_name")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_mannwhitney" -> (extMannWhitney _),
    "ext_kaplanmeier" -> (extKaplanMeier _),
    "ext_acf" -> (extAcf _),
    "ext_cusum" -> (extCusum _),
    "ext_jackknife" -> (extJackknife _))

  val oracleSql: Map[String, String] = Map(
    // E-100: identical average-rank construction; count() filters keep
    // the group sizes BIGINT (DuckDB sum-on-int is HUGEINT).
    "ext_mannwhitney" ->
      """with ev as (
        |  select case when event_type = 'click' then 1 else 0 end g1, value v
        |  from events where event_type in ('click','view')),
        |ranked as (
        |  select g1,
        |    rank() over (order by v) + (count(*) over (partition by v) - 1) / 2.0 ar,
        |    count(*) over (partition by v) cnt
        |  from ev),
        |ag as (
        |  select sum(ar) filter (g1 = 1) r1,
        |    count(*) filter (g1 = 1) n1,
        |    count(*) ntot,
        |    cast(sum(cnt * cnt - 1) as double) tie
        |  from ranked)
        |select n1, ntot - n1 n2,
        |  round(r1 - n1 * (n1 + 1) / 2.0, 2) u1,
        |  round((r1 - n1 * (n1 + 1) / 2.0 - n1 * (ntot - n1) / 2.0)
        |    / sqrt(n1 * (ntot - n1) / 12.0
        |      * (ntot + 1 - tie / (ntot * (ntot - 1.0)))), 4) z
        |from ag""".stripMargin,
    // E-101: same exclusive-prefix risk table; ln(0) guarded by the
    // same prefix max flag (DuckDB ln(0) is -inf, Spark's is NULL —
    // the guard makes both emit exactly 0).
    "ext_kaplanmeier" ->
      """with dur as (
        |  select date_diff('day', cast(o_orderdate as date), cast(ship0 as date)) tt,
        |    case when o_orderstatus <> 'O' then 1 else 0 end ev
        |  from orders join (
        |    select l_orderkey, min(l_shipdate) ship0 from lineitem group by 1) fs
        |  on o_orderkey = fs.l_orderkey),
        |byt as (
        |  select tt, cast(sum(ev) as bigint) d, count(*) m from dur group by tt),
        |risk as (
        |  select tt, d, m,
        |    cast(sum(m) over () as bigint)
        |      - cast(coalesce(sum(m) over (order by tt
        |          rows between unbounded preceding and 1 preceding), 0) as bigint) n_risk
        |  from byt),
        |f as (
        |  select tt, d, n_risk, 1.0 - d / cast(n_risk as double) fac from risk),
        |s as (
        |  select tt, d, n_risk,
        |    max(case when fac = 0 then 1 else 0 end) over (order by tt
        |      rows between unbounded preceding and current row) zero_seen,
        |    sum(case when fac > 0 then ln(fac) end) over (order by tt
        |      rows between unbounded preceding and current row) lnsum
        |  from f)
        |select tt, n_risk, d,
        |  round(case when zero_seen = 1 then 0.0 else exp(lnsum) end, 4) surv
        |from s where d > 0 order by tt limit 25""".stripMargin,
    // E-102: seven lag windows over the daily series; union-all
    // unpivot mirrors stack().
    "ext_acf" ->
      """with daily as (
        |  select cast(date_trunc('day', o_orderdate) as date) dy,
        |    sum(o_totalprice) x
        |  from orders group by 1),
        |dv as (select dy, x - avg(x) over () dev from daily),
        |lg as (
        |  select dev,
        |    lag(dev, 1) over (order by dy) l1, lag(dev, 2) over (order by dy) l2,
        |    lag(dev, 3) over (order by dy) l3, lag(dev, 4) over (order by dy) l4,
        |    lag(dev, 5) over (order by dy) l5, lag(dev, 6) over (order by dy) l6,
        |    lag(dev, 7) over (order by dy) l7
        |  from dv),
        |ag as (
        |  select sum(dev * dev) s0,
        |    sum(dev * l1) s1, sum(dev * l2) s2, sum(dev * l3) s3, sum(dev * l4) s4,
        |    sum(dev * l5) s5, sum(dev * l6) s6, sum(dev * l7) s7
        |  from lg)
        |select * from (
        |  select cast(1 as bigint) lag_k, round(s1/s0, 4) acf from ag
        |  union all select 2, round(s2/s0, 4) from ag
        |  union all select 3, round(s3/s0, 4) from ag
        |  union all select 4, round(s4/s0, 4) from ag
        |  union all select 5, round(s5/s0, 4) from ag
        |  union all select 6, round(s6/s0, 4) from ag
        |  union all select 7, round(s7/s0, 4) from ag)
        |order by lag_k""".stripMargin,
    // E-103: rank on the ROUNDED cusum with day tiebreak, same as the
    // engine side.
    "ext_cusum" ->
      """with daily as (
        |  select cast(date_trunc('day', ts) as date) dy, count(*) n
        |  from events group by 1),
        |cs as (
        |  select dy, n,
        |    round(sum(n - mu) over (order by dy
        |      rows between unbounded preceding and current row), 4) cusum
        |  from (select dy, n, avg(cast(n as double)) over () mu from daily))
        |select dy, n, cusum from cs
        |order by abs(cusum) desc, dy limit 5""".stripMargin,
    // E-104: group sums once, leave-one-out algebra in the window.
    "ext_jackknife" ->
      """with per as (
        |  select n_name, sum(c_acctbal) sg, count(*) ng
        |  from customer join nation on c_nationkey = n_nationkey
        |  group by 1),
        |w1 as (
        |  select n_name, ng,
        |    (sum(sg) over () - sg) / cast(sum(ng) over () - ng as double) theta,
        |    count(*) over () g
        |  from per),
        |w2 as (select n_name, ng, theta, g, avg(theta) over () tbar from w1)
        |select n_name, ng n_cust, round(theta, 4) loo_mean,
        |  round(sqrt((g - 1.0) / g
        |    * sum((theta - tbar) * (theta - tbar)) over ()), 4) jack_se
        |from w2 order by n_name""".stripMargin)
}
