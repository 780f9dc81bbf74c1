package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 33: operations & capacity — queue
  * backlog via the prefix-min identity, session concurrency by
  * sweep-line with the Little's-law cross-check, hourly capacity
  * percentiles, and the experiment-design MDE closed form. Completes
  * the ops family (SLA E-214, VaR E-215, SPC charts, anomaly E-46)
  * with the CAPACITY-planning layer.
  */
object ExtensionQueries33 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def h60(c: Column) =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  // ---- E-251 queue backlog (prefix-min identity) ---------------------------------
  // Daily order arrivals against a fixed service capacity (110% of the
  // mean daily rate, floor-divided to an integer): the recursive
  // B_t = max(0, B_{t−1} + a_t − c) unrolls EXACTLY to
  // B_t = cum_t − min(0, min_{s≤t} cum_s) with cum = Σ(a − c) — the
  // classic identity that turns a sequential recursion into two
  // windowed prefix scans over the day series (never the fact table).
  // Top-15 worst backlog days, all integer.
  def extBacklog(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderdate").as("dy"))
      .agg(count(lit(1)).as("a"))
    val cap = daily.agg((sum("a") * 11).as("num"),
      (count(lit(1)) * 10).as("den"))
      .select(floor(col("num") / col("den")).cast("long").as("c"))
    val w = Window.orderBy("dy").rowsBetween(Window.unboundedPreceding, 0)
    daily.crossJoin(broadcast(cap))
      .withColumn("cum", sum(col("a") - col("c")).over(w))
      .withColumn("floor_", least(lit(0L), min("cum").over(w)))
      .select(col("dy").cast("date").cast("string").as("dy"), col("a"), col("c"),
        (col("cum") - col("floor_")).as("backlog"))
      .orderBy(desc("backlog"), asc("dy")).limit(15)
  }

  // ---- E-252 session concurrency + Little's law ----------------------------------
  // 30-min-gap sessions swept as +1/−1 boundary events (ends sort
  // before starts at equal timestamps — open-interval semantics, tie
  // pinned by (t, delta, user)): peak concurrency is the max prefix
  // sum; average concurrency L = Σ durations / T; λ = sessions/T and
  // W = mean duration close the Little's-law identity L = λW (exact
  // here because the sweep and the duration sum measure the same
  // area — reported as the pinned cross-check). All integer µs until
  // the final ratios. The sweep window runs over the 2·sessions
  // boundary frame, never raw events.
  def extConcurrency(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val e = t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("anchor",
        when(unix_micros(col("ts")) -
          unix_micros(lag("ts", 1).over(w)) > 1800L * 1000000L ||
          lag("ts", 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("sid", sum("anchor").over(w))
    val sess = e.groupBy("user_id", "sid")
      .agg(unix_micros(min("ts")).as("t0"), unix_micros(max("ts")).as("t1"))
    val bounds = sess.select(col("user_id"), col("t0").as("t"), lit(1L).as("d"))
      .unionAll(sess.select(col("user_id"), col("t1").as("t"),
        lit(-1L).as("d")))
    val sweep = bounds
      .withColumn("conc",
        sum("d").over(Window.orderBy(col("t"), col("d"), col("user_id"))))
    val peak = sweep.agg(max("conc").as("peak_concurrency"))
    val agg = sess.agg(count(lit(1)).as("n_sessions"),
      sum(col("t1") - col("t0")).as("sum_dur_us"),
      (max("t1") - min("t0")).as("span_us"))
    agg.crossJoin(broadcast(peak))
      .select(col("n_sessions"), col("peak_concurrency"),
        round(col("sum_dur_us").cast("double") / col("span_us"), 6)
          .as("avg_concurrency"),
        round(col("n_sessions").cast("double") * 3600000000L /
          col("span_us"), 6).as("lambda_per_hr"),
        round(col("sum_dur_us").cast("double") / col("n_sessions") /
          60000000L, 6).as("w_mean_min"),
        round(col("n_sessions").cast("double") / col("span_us") *
          (col("sum_dur_us").cast("double") / col("n_sessions")), 6)
          .as("lambda_x_w"))
  }

  // ---- E-253 hourly capacity percentiles -----------------------------------------
  // Per event type over the hourly load series: mean, p50, p95
  // (interpolated over integer counts — half-integer-exact), peak, and
  // peak-to-mean — the numbers a capacity plan and an autoscaler
  // threshold come from. Percentile windows run over the ≤720-row
  // hourly frame per type.
  def extCapacity(s: SparkSession, dir: String): DataFrame = {
    val hourly = t(s, dir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("load"))
    hourly.groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"),
        round(avg(col("load").cast("double")), 4).as("mean_load"),
        round(expr("percentile(load, 0.5)"), 4).as("p50"),
        round(expr("percentile(load, 0.95)"), 4).as("p95"),
        max("load").as("peak"))
      .withColumn("peak_to_mean",
        round(col("peak").cast("double") / col("mean_load"), 4))
      .orderBy("event_type")
  }

  // ---- E-254 minimal detectable effect -------------------------------------------
  // Experiment design for the E-212 harness: with the observed
  // per-user purchase-revenue variance and the hash-split arm sizes,
  // the two-sided 5% / 80%-power MDE is (1.96 + 0.8416)·√(2s²/n) —
  // pinned constants, exact decimal moments, one closed form. Reported
  // absolute (cents) and relative to the mean: the "how long must this
  // test run" number.
  def extMde(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "events")
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase",
        round(col("value") * 100).cast("long")).otherwise(0L))
        .cast("decimal(38,0)").as("x"))
      .select(pmod(h60(col("user_id").cast("string")), lit(2L)).as("arm"),
        col("x"))
    val stats = per.agg(count(lit(1)).as("n_users"), sum("x").as("sx"),
      sum(col("x") * col("x")).as("sxx"),
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_arm"))
    stats
      .withColumn("mu", col("sx").cast("double") / col("n_users"))
      .withColumn("s2",
        (col("n_users") * col("sxx") - col("sx") * col("sx")).cast("double") /
          (col("n_users").cast("double") * (col("n_users") - 1)))
      .select(col("n_users"), col("n_arm"),
        round(col("mu") / 100, 4).as("mean_rev"),
        round(sqrt(col("s2")) / 100, 4).as("sd_rev"),
        round(lit(2.8016) * sqrt(lit(2.0) * col("s2") /
          col("n_arm")) / 100, 4).as("mde_abs"),
        round(lit(2.8016) * sqrt(lit(2.0) * col("s2") /
          col("n_arm")) / col("mu"), 6).as("mde_rel"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_backlog" -> (extBacklog _),
    "ext_concurrency" -> (extConcurrency _),
    "ext_capacity" -> (extCapacity _),
    "ext_mde" -> (extMde _))

  val oracleSql: Map[String, String] = Map(
    // E-251: identical prefix-min unroll over the day series.
    "ext_backlog" ->
      """with daily as (select o_orderdate dy,
        |    cast(count(*) as bigint) a from orders group by 1),
        |cap as (select cast(sum(a) * 11 // (count(*) * 10) as bigint) c
        |  from daily),
        |cumu as (select dy, a, c,
        |    sum(a - c) over (order by dy rows unbounded preceding) cum
        |  from daily cross join cap),
        |scan as (select dy, a, c, cum,
        |    least(0, min(cum) over (order by dy rows unbounded preceding))
        |      floor_
        |  from cumu)
        |select strftime(dy, '%Y-%m-%d') dy, a, c,
        |  cast(cum - floor_ as bigint) backlog
        |from scan order by backlog desc, dy limit 15""".stripMargin,

    // E-252: identical sessionization, sweep tie order, and ratios.
    "ext_concurrency" ->
      """with e as (select user_id, ts, event_id,
        |    case when lag(ts) over (partition by user_id
        |        order by ts, event_id) is null
        |      or epoch_us(ts) - epoch_us(lag(ts) over (partition by user_id
        |        order by ts, event_id)) > 1800000000
        |      then 1 else 0 end anchor
        |  from events),
        |si as (select user_id, ts,
        |    sum(anchor) over (partition by user_id order by ts, event_id
        |      rows unbounded preceding) sid
        |  from e),
        |sess as (select user_id, sid, epoch_us(min(ts)) t0,
        |    epoch_us(max(ts)) t1
        |  from si group by user_id, sid),
        |bounds as (select user_id, t0 t, 1 d from sess
        |  union all select user_id, t1, -1 from sess),
        |sweep as (select sum(d) over (order by t, d, user_id
        |    rows unbounded preceding) conc from bounds),
        |peak as (select cast(max(conc) as bigint) peak_concurrency
        |  from sweep),
        |agg as (select cast(count(*) as bigint) n_sessions,
        |    cast(sum(t1 - t0) as bigint) sum_dur_us,
        |    cast(max(t1) - min(t0) as bigint) span_us from sess)
        |select n_sessions, peak_concurrency,
        |  round(cast(sum_dur_us as double) / span_us, 6) avg_concurrency,
        |  round(cast(n_sessions as double) * 3600000000 / span_us, 6)
        |    lambda_per_hr,
        |  round(cast(sum_dur_us as double) / n_sessions / 60000000, 6)
        |    w_mean_min,
        |  round(cast(n_sessions as double) / span_us *
        |    (cast(sum_dur_us as double) / n_sessions), 6) lambda_x_w
        |from agg cross join peak""".stripMargin,

    // E-253: identical hourly frame and interpolated percentiles.
    "ext_capacity" ->
      """with hourly as (select event_type, date_trunc('hour', ts) h,
        |    cast(count(*) as bigint) ld from events group by 1, 2)
        |select event_type, cast(count(*) as bigint) n_hours,
        |  round(avg(cast(ld as double)), 4) mean_load,
        |  round(quantile_cont(ld, 0.5), 4) p50,
        |  round(quantile_cont(ld, 0.95), 4) p95,
        |  cast(max(ld) as bigint) peak,
        |  round(cast(max(ld) as double) /
        |    round(avg(cast(ld as double)), 4), 4) peak_to_mean
        |from hourly group by event_type order by event_type""".stripMargin,

    // E-254: identical hash split and closed form.
    "ext_mde" ->
      """with per as (select user_id,
        |    cast(sum(case when event_type = 'purchase'
        |      then cast(round(value * 100) as bigint) else 0 end)
        |      as hugeint) x,
        |    ('0x' || substr(sha256(cast(user_id as varchar)), 1, 15))::bigint
        |      % 2 arm
        |  from events group by user_id),
        |stats as (select cast(count(*) as bigint) n_users, sum(x) sx,
        |    sum(x * x) sxx,
        |    cast(sum(case when arm = 0 then 1 else 0 end) as bigint) n_arm
        |  from per),
        |f as (select n_users, n_arm,
        |    cast(sx as double) / n_users mu,
        |    cast(n_users * sxx - sx * sx as double) /
        |      (cast(n_users as double) * (n_users - 1)) s2
        |  from stats)
        |select n_users, n_arm, round(mu / 100, 4) mean_rev,
        |  round(sqrt(s2) / 100, 4) sd_rev,
        |  round(2.8016 * sqrt(2.0 * s2 / n_arm) / 100, 4) mde_abs,
        |  round(2.8016 * sqrt(2.0 * s2 / n_arm) / mu, 6) mde_rel
        |from f""".stripMargin)
}
