package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 80: customer-timing analytics —
  * component-form customer lifetime value, inter-event gap
  * distributions with the memorylessness check, and Zhang clumpiness
  * of per-user purchase timing.
  */
object ExtensionQueries80 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-388 customer lifetime value ---------------------------------------------
  // The component-form CLV every CRM starts from: average order value
  // × monthly purchase frequency × pinned 24-month horizon × pinned
  // 20% margin. Frequency over the customer's OWN active span
  // (first→last order month, +1 so single-month buyers are defined).
  // Every component from exact integers, assembled in one settled
  // chain. Top-15 customers by CLV with the components shown.
  def extClv(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "orders")
      .groupBy(col("o_custkey").as("k"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"),
        min(col("o_orderdate").cast("date")).as("d0"),
        max(col("o_orderdate").cast("date")).as("d1"))
      // 30-day months by contract: calendar months_between has
      // engine-specific end-of-month rules; integer day arithmetic
      // does not
      .withColumn("months_active",
        (datediff(col("d1"), col("d0")).cast("long") / lit(30L))
          .cast("long") + 1)
    // every ratio lands on a display grid via INTEGER half-up
    // division (E-118's (2S+n) div 2n trick) — cents∕n can sit
    // exactly on a half-cent, where Spark's BigDecimal shortest-repr
    // rounding and DuckDB's binary rounding disagree
    per.select(col("k").as("custkey"), col("n_orders"),
        col("months_active"),
        expr("(2 * cents + n_orders) DIV (2 * n_orders)").as("ac"),
        expr("(2 * n_orders * 10000 + months_active) DIV " +
          "(2 * months_active)").as("oq"))
      .withColumn("clvc",
        expr("(48 * ac * oq + 50000) DIV 100000"))
      .select(col("custkey"), col("n_orders"), col("months_active"),
        round(col("ac").cast("double") / 100, 2).as("aov_dollars"),
        round(col("oq").cast("double") / 1e4, 4).as("orders_per_month"),
        round(col("clvc").cast("double") / 100, 2).as("clv_dollars"))
      .orderBy(desc("clv_dollars"), asc("custkey"))
      .limit(15)
  }

  // ---- E-389 inter-event gap distribution ----------------------------------------
  // Arrival-process profiling per event type: consecutive per-user
  // gaps in exact integer seconds (lag over the (user, type) stream),
  // median/mean/p90, and the memorylessness check — exponential
  // arrivals satisfy mean∕median = 1∕ln 2 ≈ 1.442695 (pinned), so the
  // ratio's distance from it measures how non-Poisson each type is.
  def extInterevent(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy("us", "event_id")
    val gaps = t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .withColumn("gap_s",
        ((col("us") - lag("us", 1).over(w)) / lit(1000000L)).cast("long"))
      .filter(col("gap_s").isNotNull)
    gaps.groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        expr("percentile(gap_s, 0.5)").as("median_s"),
        avg(col("gap_s").cast("double")).as("mean_raw"),
        expr("percentile(gap_s, 0.9)").as("p90_s"))
      .select(col("event_type"), col("n_gaps"),
        round(col("median_s"), 1).as("median_s"),
        round(col("mean_raw"), 1).as("mean_s"),
        round(col("p90_s"), 1).as("p90_s"),
        round(col("mean_raw") / col("median_s"), 4).as("mean_over_median"),
        (abs(col("mean_raw") / col("median_s") - lit(1.442695)) <
          lit(0.2)).as("memoryless_like"))
      .orderBy("event_type")
  }

  // ---- E-390 purchase clumpiness -------------------------------------------------
  // Zhang's clumpiness of each user's purchase TIMING: gaps over the
  // global observation window (boundary gaps included, Σx = 1 by
  // construction), C = 1 + Σ x·ln x ∕ ln(n+1) — 0 = evenly spread,
  // →1 = one burst. Per-gap x·ln x terms are 1e-9-quantized before
  // the per-user fold; zero-width gaps drop (x·ln x → 0). The CRM
  // regularity lens beside E-351's count-side burstiness. Top-15
  // clumpiest buyers (≥ 3 purchases).
  def extClumpiness(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"))
    val span = ev.agg(min("us").as("t0"), max("us").as("t1")).limit(1)
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val gaps = ev.crossJoin(broadcast(span))
      .withColumn("prev", coalesce(lag("us", 1).over(w), col("t0")))
      .select(col("user_id"), col("t0"), col("t1"),
        (col("us") - col("prev")).as("gap"))
    val tails = ev.crossJoin(broadcast(span))
      .groupBy("user_id", "t0", "t1")
      .agg(max("us").as("lastus"), count(lit(1)).as("np"))
      .select(col("user_id"), col("t0"), col("t1"),
        (col("t1") - col("lastus")).as("gap"), col("np"))
    val allGaps = gaps.select(col("user_id"), col("t0"), col("t1"),
        col("gap")).unionByName(
      tails.select(col("user_id"), col("t0"), col("t1"), col("gap")))
    val terms = allGaps
      .withColumn("x",
        col("gap").cast("double") / (col("t1") - col("t0")).cast("double"))
      .withColumn("tq",
        when(col("x") > 0, round(col("x") * log(col("x")) * lit(1e9))
          .cast("long")).otherwise(0L))
    terms.groupBy("user_id")
      .agg((count(lit(1)) - 1).as("n_purchases"),
        sum("tq").as("stq"))
      .filter(col("n_purchases") >= 3)
      .select(col("user_id"), col("n_purchases"),
        round(lit(1.0) + col("stq").cast("double") / 1e9 /
          log(col("n_purchases").cast("double") + 1), 4)
          .as("clumpiness"))
      .orderBy(desc("clumpiness"), asc("user_id"))
      .limit(15)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_clv" -> (extClv _),
    "ext_interevent" -> (extInterevent _),
    "ext_clumpiness" -> (extClumpiness _))

  val oracleSql: Map[String, String] = Map(
    // E-388: identical components and settled chain.
    "ext_clv" ->
      """with per as (select o_custkey k,
        |    cast(count(*) as bigint) n_orders,
        |    cast(sum(cast(round(o_totalprice * 100) as bigint))
        |      as bigint) cents,
        |    min(cast(o_orderdate as date)) d0,
        |    max(cast(o_orderdate as date)) d1
        |  from orders group by 1),
        |m as (select k, n_orders, cents,
        |    cast(date_diff('day', d0, d1) // 30 as bigint) + 1
        |      months_active
        |  from per),
        |q as (select k, n_orders, months_active,
        |    (2 * cents + n_orders) // (2 * n_orders) ac,
        |    (2 * n_orders * 10000 + months_active) //
        |      (2 * months_active) oq
        |  from m)
        |select k custkey, n_orders, months_active,
        |  round(cast(ac as double) / 100, 2) aov_dollars,
        |  round(cast(oq as double) / 1e4, 4) orders_per_month,
        |  round(cast((48 * ac * oq + 50000) // 100000 as double) / 100,
        |    2) clv_dollars
        |from q
        |order by clv_dollars desc, custkey limit 15""".stripMargin,

    // E-389: identical gap frame, interpolated percentiles, pinned
    // 1/ln2 memorylessness band.
    "ext_interevent" ->
      """with e as (select user_id, event_type,
        |    epoch_us(ts) us, event_id
        |  from events),
        |gaps as (select event_type,
        |    (us - lag(us) over (partition by user_id, event_type
        |      order by us, event_id)) // 1000000 gap_s
        |  from e),
        |g as (select event_type, gap_s from gaps where gap_s is not null)
        |select event_type, cast(count(*) as bigint) n_gaps,
        |  round(quantile_cont(gap_s, 0.5), 1) median_s,
        |  round(avg(cast(gap_s as double)), 1) mean_s,
        |  round(quantile_cont(gap_s, 0.9), 1) p90_s,
        |  round(avg(cast(gap_s as double)) / quantile_cont(gap_s, 0.5),
        |    4) mean_over_median,
        |  (abs(avg(cast(gap_s as double)) / quantile_cont(gap_s, 0.5) -
        |    1.442695) < 0.2) memoryless_like
        |from g group by event_type
        |order by event_type""".stripMargin,

    // E-390: identical boundary gaps, quantized x·ln x terms.
    "ext_clumpiness" ->
      """with ev as (select user_id, epoch_us(ts) us, event_id
        |  from events where event_type = 'purchase'),
        |span as (select cast(min(us) as bigint) t0,
        |    cast(max(us) as bigint) t1 from ev),
        |gaps as (select user_id, t0, t1,
        |    us - coalesce(lag(us) over (partition by user_id
        |      order by us, event_id), t0) gap
        |  from ev cross join span),
        |tails as (select user_id, any_value(t0) t0, any_value(t1) t1,
        |    any_value(t1) - max(us) gap
        |  from ev cross join span group by user_id),
        |allgaps as (select user_id, t0, t1, gap from gaps
        |  union all select user_id, t0, t1, gap from tails),
        |terms as (select user_id,
        |    case when cast(gap as double) / (t1 - t0) > 0
        |      then cast(round(cast(gap as double) / (t1 - t0) *
        |        ln(cast(gap as double) / (t1 - t0)) * 1e9) as bigint)
        |      else 0 end tq
        |  from allgaps)
        |select user_id, cast(count(*) - 1 as bigint) n_purchases,
        |  round(1.0 + cast(sum(tq) as double) / 1e9 /
        |    ln(cast(count(*) - 1 as double) + 1), 4) clumpiness
        |from terms group by user_id
        |having count(*) - 1 >= 3
        |order by clumpiness desc, user_id limit 15""".stripMargin)
}
