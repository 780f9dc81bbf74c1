package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 13: behavioral-trend analytics —
  * per-user activity slopes, tenure mix, week-over-week composition
  * drift, behavioral entropy, and a power-law MLE over the activity
  * distribution.
  */
object ExtensionQueries13 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-160 per-user activity velocity ------------------------------------------
  // OLS slope of weekly event counts per user (regr_slope, codegen'd
  // built-in in both engines) — the user-level trend screen: negative
  // slope cohorts are churn risks before they churn. Week index is
  // anchored to a fixed epoch so no per-user min pass is needed; weeks
  // with zero events don't emit rows (documented: slope over ACTIVE
  // weeks, identical in both engines).
  def extVelocity(s: SparkSession, dir: String): DataFrame = {
    val weekly = t(s, dir, "events")
      .select(col("user_id"),
        (datediff(to_date(col("ts")), lit("2024-01-01").cast("date")) / 7)
          .cast("long").as("wk"))
      .groupBy("user_id", "wk").agg(count(lit(1)).as("n"))
    weekly.groupBy("user_id")
      .agg(count(lit(1)).as("n_weeks"),
        round(expr("regr_slope(n, wk)"), 6).as("slope"))
      .filter(col("n_weeks") >= 2 && col("user_id") < 100)
      .orderBy("user_id")
  }

  // ---- E-161 tenure mix ----------------------------------------------------------
  // What share of traffic comes from accounts in their first, second,
  // third, or 4+-th week of life: account age at event time bucketed by
  // integer division, shares settled over the 4-row aggregate (the
  // whole-table window runs over 4 rows, not the fact table).
  def extTenureMix(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val first = e.groupBy("user_id").agg(to_date(min("ts")).as("first_d"))
    val bucketed = e.join(first, "user_id")
      .select(least(
        (datediff(to_date(col("ts")), col("first_d")) / 7).cast("long"),
        lit(3L)).as("tenure_wk"))
      .groupBy("tenure_wk").agg(count(lit(1)).as("n_events"))
    val wAll = Window.partitionBy()
    bucketed
      .select(col("tenure_wk"), col("n_events"),
        round(col("n_events").cast("double") / sum("n_events").over(wAll), 6)
          .as("event_share"))
      .orderBy("tenure_wk")
  }

  // ---- E-162 weekly composition drift --------------------------------------------
  // JSD between each week's event-type mix and the NEXT week's — the
  // drift alarm as a time series (static two-group JSD is ext_jsd).
  // The next week's counts are pre-shifted onto the current week's key,
  // so the union of types per pair is one full-outer EQUI join on
  // (week, type); totals join per week. Five types — every per-week
  // fold is tiny and settled.
  def extMixDrift(s: SparkSession, dir: String): DataFrame = {
    val cnt = t(s, dir, "events")
      .groupBy(to_date(date_trunc("week", col("ts"))).as("wk"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val cur = cnt.select(col("wk"), col("event_type"), col("c").as("c1"))
    val nxt = cnt.select(date_sub(col("wk"), 7).as("wk"),
      col("event_type"), col("c").as("c2"))
    val tot1 = cur.groupBy("wk").agg(sum("c1").cast("double").as("t1"))
    val tot2 = nxt.groupBy("wk").agg(sum("c2").cast("double").as("t2"))
    val p = coalesce(col("c1"), lit(0L)).cast("double") / col("t1")
    val q = coalesce(col("c2"), lit(0L)).cast("double") / col("t2")
    val m = (p + q) / 2
    cur.join(nxt, Seq("wk", "event_type"), "full_outer")
      .join(tot1, "wk").join(tot2, "wk")
      .groupBy("wk")
      .agg(count(lit(1)).as("n_types_union"),
        round(sum(
          when(coalesce(col("c1"), lit(0L)) > 0, lit(0.5) * p * log(p / m))
            .otherwise(0.0) +
          when(coalesce(col("c2"), lit(0L)) > 0, lit(0.5) * q * log(q / m))
            .otherwise(0.0)), 6).as("jsd_next"))
      .orderBy("wk")
  }

  // ---- E-163 behavioral entropy --------------------------------------------------
  // Shannon entropy of each user's event-type mix: H = −Σ(c/n)·ln(c/n)
  // over ≤5 types — 0 means a single-behavior (bot-like) account, ln 5
  // a uniform one. Integer counts, one settled ≤5-term fold per user.
  def extSeqEntropy(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "events").filter(col("user_id") < 100)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
    val n = per.groupBy("user_id").agg(sum("c").cast("double").as("n"))
    val pr = col("c").cast("double") / col("n")
    per.join(n, "user_id")
      .groupBy("user_id")
      .agg(max(col("n")).cast("long").as("n_events"),
        count(lit(1)).as("n_types"),
        round(-sum(pr * log(pr)), 6).as("entropy"))
      .orderBy("user_id")
  }

  // ---- E-164 activity power-law MLE ----------------------------------------------
  // Discrete power-law exponent over the per-user event-count
  // distribution, Clauset-style MLE with xmin = 1:
  // α = 1 + n / Σ ln(x_i / 0.5). One aggregate over the user dim —
  // pairs with ext_zipf (token-frequency regression) on the behavior
  // side. α ≈ 2–3 is the classic heavy-tail signature.
  def extPowerLaw(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("x"))
      .agg(count(lit(1)).as("n_users"),
        round(lit(1.0) + count(lit(1)) /
          sum(log(col("x").cast("double") / 0.5)), 6).as("alpha"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_velocity" -> (extVelocity _),
    "ext_tenure_mix" -> (extTenureMix _),
    "ext_mixdrift" -> (extMixDrift _),
    "ext_seqentropy" -> (extSeqEntropy _),
    "ext_powerlaw" -> (extPowerLaw _))

  val oracleSql: Map[String, String] = Map(
    "ext_velocity" ->
      """with weekly as (select user_id,
        |    (cast(ts as date) - date '2024-01-01') // 7 wk, count(*) n
        |  from events group by 1, 2)
        |select user_id, count(*) n_weeks,
        |  round(regr_slope(n, wk), 6) slope
        |from weekly group by user_id
        |having count(*) >= 2 and user_id < 100
        |order by user_id""".stripMargin,

    "ext_tenure_mix" ->
      """with first as (select user_id, cast(min(ts) as date) first_d
        |  from events group by user_id),
        |b as (select least((cast(ts as date) - first_d) // 7, 3) tenure_wk
        |  from events join first using(user_id)),
        |agg as (select cast(tenure_wk as bigint) tenure_wk, count(*) n_events
        |  from b group by 1)
        |select tenure_wk, n_events,
        |  round(cast(n_events as double) / sum(n_events) over (), 6) event_share
        |from agg order by tenure_wk""".stripMargin,

    "ext_mixdrift" ->
      """with cnt as (select cast(date_trunc('week', ts) as date) wk,
        |    event_type, count(*) c from events group by 1, 2),
        |cur as (select wk, event_type, c c1 from cnt),
        |nxt as (select wk - 7 wk, event_type, c c2 from cnt),
        |tot1 as (select wk, cast(sum(c1) as double) t1 from cur group by wk),
        |tot2 as (select wk, cast(sum(c2) as double) t2 from nxt group by wk),
        |j as (select coalesce(cur.wk, nxt.wk) wk,
        |    coalesce(c1, 0) c1, coalesce(c2, 0) c2
        |  from cur full outer join nxt
        |    on cur.wk = nxt.wk and cur.event_type = nxt.event_type)
        |select j.wk, count(*) n_types_union,
        |  round(sum(
        |    case when c1 > 0 then 0.5 * (c1/t1) * ln((c1/t1) / ((c1/t1 + c2/t2)/2))
        |      else 0 end
        |  + case when c2 > 0 then 0.5 * (c2/t2) * ln((c2/t2) / ((c1/t1 + c2/t2)/2))
        |      else 0 end), 6) jsd_next
        |from j join tot1 on j.wk = tot1.wk join tot2 on j.wk = tot2.wk
        |group by j.wk order by j.wk""".stripMargin,

    "ext_seqentropy" ->
      """with per as (select user_id, event_type, count(*) c
        |  from events where user_id < 100 group by 1, 2),
        |n as (select user_id, cast(sum(c) as double) n from per group by user_id)
        |select user_id, cast(max(n) as bigint) n_events, count(*) n_types,
        |  round(-sum((c/n) * ln(c/n)), 6) entropy
        |from per join n using(user_id)
        |group by user_id order by user_id""".stripMargin,

    "ext_powerlaw" ->
      """with x as (select count(*) x from events group by user_id)
        |select count(*) n_users,
        |  round(1 + count(*) / sum(ln(cast(x as double) / 0.5)), 6) alpha
        |from x""".stripMargin)
}
