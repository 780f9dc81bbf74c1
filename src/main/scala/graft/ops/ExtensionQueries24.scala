package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 24: operational BI — price-volume-mix
  * bridge, SLA attainment, historical VaR/CVaR, session-depth
  * histogram, and the volume-discount curve.
  */
object ExtensionQueries24 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-213 price-volume-mix bridge ---------------------------------------------
  // Why did 1995→1996 revenue move? Per market segment: volume effect
  // (Δqty at base price) + price effect (Δprice at CURRENT qty) sum
  // EXACTLY to the revenue delta (the two-factor PVM convention, no
  // unexplained residual). Quantities and cents are exact longs; the
  // per-segment prices are settled divisions, and the bridge identity
  // Δrev = vol + price is algebraically exact before rounding.
  def extPvm(s: SparkSession, dir: String): DataFrame = {
    def yearAgg(y: Int) = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .filter(year(col("l_shipdate")) === y)
      .groupBy(col("c_mktsegment").as("seg"))
      .agg(sum(col("l_quantity").cast("long")).as(s"q$y"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as(s"c$y"))
    yearAgg(1995).join(yearAgg(1996), "seg")
      .select(col("seg"),
        col("c1995").as("rev0_cents"), col("c1996").as("rev1_cents"),
        // volume at base price: (q1−q0)·p0 with p0 = c0/q0
        round((col("q1996") - col("q1995")).cast("double") *
          (col("c1995").cast("double") / col("q1995")) / 100.0, 2)
          .as("volume_effect"),
        // price at current qty: (p1−p0)·q1
        round((col("c1996").cast("double") / col("q1996") -
          col("c1995").cast("double") / col("q1995")) *
          col("q1996") / 100.0, 2).as("price_effect"),
        round((col("c1996") - col("c1995")).cast("double") / 100.0, 2)
          .as("total_delta"))
      .orderBy("seg")
  }

  // ---- E-214 SLA attainment ------------------------------------------------------
  // Order-to-first-ship latency per order priority: share shipped
  // within 30/60/90 days plus the exact integer-day p50 via
  // interpolated percentile. Day diffs are exact integers; the shares
  // are count_if ratios — the operations dashboard beside E-58's
  // Kaplan–Meier survival view of the same duration.
  def extSla(s: SparkSession, dir: String): DataFrame = {
    val firstShip = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey").as("ok"))
      .agg(min(to_date(col("l_shipdate"))).as("ship0"))
    t(s, dir, "orders")
      .join(firstShip, col("o_orderkey") === col("ok"))
      .select(col("o_orderpriority").as("prio"),
        datediff(col("ship0"), to_date(col("o_orderdate"))).cast("long")
          .as("days"))
      .groupBy("prio")
      .agg(count(lit(1)).as("n"),
        round(sum(when(col("days") <= 30, 1L).otherwise(0L)).cast("double") /
          count(lit(1)), 6).as("within_30"),
        round(sum(when(col("days") <= 60, 1L).otherwise(0L)).cast("double") /
          count(lit(1)), 6).as("within_60"),
        round(sum(when(col("days") <= 90, 1L).otherwise(0L)).cast("double") /
          count(lit(1)), 6).as("within_90"),
        round(expr("percentile(days, 0.5)"), 4).as("p50_days"))
      .orderBy("prio")
  }

  // ---- E-215 historical VaR / CVaR -----------------------------------------------
  // 95% value-at-risk of the day-over-day revenue change: VaR = the
  // interpolated 5th percentile of exact cents deltas, CVaR = the mean
  // of the tail at or below it. Deltas stay integer longs; the tail
  // mean is one settled division. The risk view of the day series the
  // SPC charts (E-177) watch for control.
  def extVar(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("d")
    val deltas = t(s, dir, "events").filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      .withColumn("delta", col("cents") - lag("cents", 1).over(w))
      .filter(col("delta").isNotNull)
    val v = deltas.agg(count(lit(1)).as("n_days"),
      expr("percentile(delta, 0.05)").as("var5"))
    deltas.crossJoin(v)
      .groupBy("n_days", "var5")
      .agg(avg(when(col("delta") <= col("var5"),
        col("delta").cast("double"))).as("cvar5"))
      .select(col("n_days"),
        round(col("var5") / 100.0, 4).as("var_95"),
        round(col("cvar5") / 100.0, 4).as("cvar_95"))
  }

  // ---- E-216 session-depth histogram ---------------------------------------------
  // How many events does a 30-minute session contain? Sessions via the
  // gaps-and-islands anchor (running sum of gap>30 min breaks — the
  // q25/E-157 discipline), then the distribution of events-per-session.
  // All integer; per-user windows, histogram on the session aggregate.
  def extSessdepth(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val sess = t(s, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .withColumn("brk",
        when(col("us") - lag("us", 1).over(w) > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("depth"))
    sess.groupBy("depth")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy("depth")
  }

  // ---- E-217 volume-discount curve -----------------------------------------------
  // Does bigger basket size buy a deeper discount? Quantity decade
  // bands (integer division) vs average discount and quantity-weighted
  // unit price — discounts summed as exact basis points, one settled
  // division per band.
  def extDiscountcurve(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select((floor(col("l_quantity") / 10) * 10).cast("long").as("qty_band"),
        round(col("l_discount") * 10000).cast("long").as("disc_bp"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"),
        col("l_quantity").cast("long").as("qty"))
      .groupBy("qty_band")
      .agg(count(lit(1)).as("n_lines"),
        round(sum("disc_bp").cast("double") / count(lit(1)) / 10000.0, 6)
          .as("avg_discount"),
        round(sum("cents").cast("double") / sum("qty") / 100.0, 4)
          .as("unit_price"))
      .orderBy("qty_band")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_pvm" -> (extPvm _),
    "ext_sla" -> (extSla _),
    "ext_var" -> (extVar _),
    "ext_sessdepth" -> (extSessdepth _),
    "ext_discountcurve" -> (extDiscountcurve _))

  val oracleSql: Map[String, String] = Map(
    "ext_pvm" ->
      """with base as (select c_mktsegment seg, year(l_shipdate) y,
        |    cast(sum(cast(l_quantity as bigint)) as bigint) q,
        |    cast(sum(cast(round(l_extendedprice * 100) as bigint)) as bigint) c
        |  from lineitem
        |  join orders on l_orderkey = o_orderkey
        |  join customer on o_custkey = c_custkey
        |  where year(l_shipdate) in (1995, 1996) group by 1, 2),
        |y0 as (select seg, q q0, c c0 from base where y = 1995),
        |y1 as (select seg, q q1, c c1 from base where y = 1996)
        |select seg, c0 rev0_cents, c1 rev1_cents,
        |  round(cast(q1 - q0 as double) * (cast(c0 as double) / q0) / 100.0, 2)
        |    volume_effect,
        |  round((cast(c1 as double) / q1 - cast(c0 as double) / q0) * q1
        |    / 100.0, 2) price_effect,
        |  round(cast(c1 - c0 as double) / 100.0, 2) total_delta
        |from y0 join y1 using (seg) order by seg""".stripMargin,

    "ext_sla" ->
      """with fs as (select l_orderkey ok, min(cast(l_shipdate as date)) ship0
        |  from lineitem group by 1),
        |d as (select o_orderpriority prio,
        |    cast(ship0 - cast(o_orderdate as date) as bigint) dd
        |  from orders join fs on o_orderkey = ok)
        |select prio, count(*) n,
        |  round(cast(sum(case when dd <= 30 then 1 else 0 end) as double)
        |    / count(*), 6) within_30,
        |  round(cast(sum(case when dd <= 60 then 1 else 0 end) as double)
        |    / count(*), 6) within_60,
        |  round(cast(sum(case when dd <= 90 then 1 else 0 end) as double)
        |    / count(*), 6) within_90,
        |  round(quantile_cont(dd, 0.5), 4) p50_days
        |from d group by prio order by prio""".stripMargin,

    "ext_var" ->
      """with daily as (select cast(ts as date) d,
        |    cast(sum(cast(round(value * 100) as bigint)) as bigint) cents
        |  from events where event_type = 'purchase' group by 1),
        |dl as (select cents - lag(cents) over (order by d) delta from daily),
        |deltas as (select delta from dl where delta is not null),
        |v as (select cast(count(*) as bigint) n_days,
        |    quantile_cont(delta, 0.05) var5 from deltas)
        |select n_days, round(var5 / 100.0, 4) var_95,
        |  round(avg(case when delta <= var5 then cast(delta as double) end)
        |    / 100.0, 4) cvar_95
        |from deltas cross join v group by n_days, var5""".stripMargin,

    "ext_sessdepth" ->
      """with e as (select user_id, epoch_us(ts) us, event_id from events),
        |b as (select user_id, us, event_id,
        |    case when us - lag(us) over w > 1800000000 then 1 else 0 end brk
        |  from e window w as (partition by user_id order by us, event_id)),
        |s as (select user_id,
        |    sum(brk) over (partition by user_id order by us, event_id
        |      rows between unbounded preceding and current row) sid
        |  from b),
        |dep as (select user_id, sid, cast(count(*) as bigint) depth
        |  from s group by 1, 2)
        |select depth, cast(count(*) as bigint) n_sessions
        |from dep group by depth order by depth""".stripMargin,

    "ext_discountcurve" ->
      """select cast(floor(l_quantity / 10) * 10 as bigint) qty_band,
        |  count(*) n_lines,
        |  round(cast(sum(cast(round(l_discount * 10000) as bigint)) as double)
        |    / count(*) / 10000.0, 6) avg_discount,
        |  round(cast(sum(cast(round(l_extendedprice * 100) as bigint)) as double)
        |    / sum(cast(l_quantity as bigint)) / 100.0, 4) unit_price
        |from lineitem group by 1 order by qty_band""".stripMargin)
}
