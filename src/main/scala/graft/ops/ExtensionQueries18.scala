package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 18: event-behavior and
  * reconciliation operators — signup→purchase conversion latency,
  * rapid-fire (bot) detection, Markov conditional entropy,
  * dormancy/reactivation, and the order↔lineitem money reconciliation.
  */
object ExtensionQueries18 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-184 conversion latency --------------------------------------------------
  // Signup→first-purchase funnel timing: per user the first signup, the
  // first purchase AT OR AFTER it, and the latency distribution across
  // converters. The join is equi on user_id (the ts bound is a post-join
  // filter, not a join condition), both sides pre-collapsed to one row
  // per user, latencies exact micros longs until the final interpolated
  // percentiles.
  def extConvlat(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val su = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("su"))
    val pu = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("pt"))
    val conv = su.join(pu, "user_id")
      .filter(col("pt") >= col("su"))
      .groupBy("user_id").agg(min(col("pt") - col("su")).as("lat_us"))
    val nSign = su.agg(count(lit(1)).as("n_signup"))
    val agg = conv.agg(
      count(lit(1)).as("n_converted"),
      expr("percentile(lat_us, 0.5)").as("med_us"),
      expr("percentile(lat_us, 0.9)").as("p90_us"))
    nSign.crossJoin(agg)
      .select(col("n_signup"), col("n_converted"),
        round(col("n_converted").cast("double") / col("n_signup"), 6)
          .as("conv_rate"),
        round(col("med_us") / 1e6, 4).as("med_latency_s"),
        round(col("p90_us") / 1e6, 4).as("p90_latency_s"))
  }

  // ---- E-185 rapid-fire detection ------------------------------------------------
  // Bot screen: per (user, event_type), events arriving ≤ 1 s after the
  // previous same-type event from the same user. One lag window over
  // exact micros — partitions by (user, type) so the sort is per-key,
  // never global; top-20 under a (n_rapid desc, user, type) total order.
  def extRapidfire(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy("us", "event_id")
    t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("gap", col("us") - lag("us", 1).over(w))
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("gap") <= 1000000L, 1L).otherwise(0L)).as("n_rapid"))
      .orderBy(col("n_rapid").desc, col("user_id"), col("event_type"))
      .limit(20)
  }

  // ---- E-186 Markov conditional entropy ------------------------------------------
  // Entropy rate of the per-user event-type chain: H(next|prev) =
  // −Σ p(x,y)·ln(p(x,y)/p(x)) over successive pairs (ordered by ts,
  // event_id within user). Where ext_markov reports the transition
  // MATRIX and ext_seqentropy each user's marginal mix, this is the one
  // scalar saying how predictable the next action is. Counts stay
  // integers; the fold is ≤ |types|² = 25 settled terms.
  def extTransentropy(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val trans = t(s, dir, "events")
      .select(col("user_id"), col("event_type").as("y"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("x", lag("y", 1).over(w))
      .filter(col("x").isNotNull)
    val nxy = trans.groupBy("x", "y").agg(count(lit(1)).as("n_xy"))
    val nx = nxy.groupBy("x").agg(sum("n_xy").as("n_x"))
    val tot = nxy.agg(sum("n_xy").as("n"))
    nxy.join(nx, "x").crossJoin(tot)
      .select((col("n_xy").cast("double") / col("n") *
        log(col("n_xy").cast("double") / col("n_x"))).as("term"),
        col("n"))
      .groupBy()
      .agg(max("n").as("n_trans"),
        round(-sum("term"), 6).as("h_cond_nats"))
  }

  // ---- E-187 dormancy reactivation -----------------------------------------------
  // Per active day: users active, users seen for the first time, and
  // users RETURNING after ≥ 7 full dormant days — the winback curve.
  // One lag over the distinct (user, day) presence table; all integer
  // output. The presence table is |users|·|days| bounded, the same
  // pre-collapse that makes ext_stickiness/ext_churn scale-safe.
  def extReactivation(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("d")
    t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .withColumn("prev", lag("d", 1).over(w))
      .groupBy("d")
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("prev").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when(datediff(col("d"), col("prev")) >= 8, 1L).otherwise(0L))
          .as("n_react"))
      .orderBy("d")
  }

  // ---- E-188 order↔lineitem money reconciliation ---------------------------------
  // The books-balance audit: header o_totalprice vs the lineitem-derived
  // total Σ round(extprice·(1−disc)·(1+tax)·100). Orders bucket into
  // exact / within-1% / off-by-more / no-lines, the 1% band decided in
  // INTEGER math (|diff|·100 ≤ header_cents) so no float ever
  // classifies. One keyed aggregate + one equi join on o_orderkey.
  def extPricerecon(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey").as("ok"))
      .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
        (lit(1.0) + col("l_tax")) * 100).cast("long")).as("li_cents"))
    t(s, dir, "orders")
      .select(col("o_orderkey"), round(col("o_totalprice") * 100).cast("long")
        .as("hdr_cents"))
      .join(li, col("o_orderkey") === col("ok"), "left")
      .select(col("hdr_cents"), col("li_cents"),
        when(col("li_cents").isNull, "no_lines")
          .when(col("li_cents") === col("hdr_cents"), "exact")
          .when(abs(col("li_cents") - col("hdr_cents")) * 100 <=
            col("hdr_cents"), "within_1pct")
          .otherwise("off").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_orders"),
        sum(coalesce(col("li_cents"), lit(0L))).as("li_cents_total"),
        sum(col("hdr_cents")).as("hdr_cents_total"))
      .orderBy("bucket")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_convlat" -> (extConvlat _),
    "ext_rapidfire" -> (extRapidfire _),
    "ext_transentropy" -> (extTransentropy _),
    "ext_reactivation" -> (extReactivation _),
    "ext_pricerecon" -> (extPricerecon _))

  val oracleSql: Map[String, String] = Map(
    "ext_convlat" ->
      """with su as (select user_id, min(epoch_us(ts)) su from events
        |  where event_type = 'signup' group by 1),
        |conv as (select su.user_id, min(epoch_us(e.ts) - su) lat_us
        |  from su join events e on su.user_id = e.user_id
        |  where e.event_type = 'purchase' and epoch_us(e.ts) >= su
        |  group by 1),
        |ns as (select count(*) n_signup from su),
        |agg as (select cast(count(*) as bigint) n_converted,
        |    quantile_cont(lat_us, 0.5) med_us,
        |    quantile_cont(lat_us, 0.9) p90_us from conv)
        |select n_signup, n_converted,
        |  round(cast(n_converted as double) / n_signup, 6) conv_rate,
        |  round(med_us / 1e6, 4) med_latency_s,
        |  round(p90_us / 1e6, 4) p90_latency_s
        |from ns cross join agg""".stripMargin,

    "ext_rapidfire" ->
      """with g as (select user_id, event_type, event_id,
        |    epoch_us(ts) - lag(epoch_us(ts)) over (
        |      partition by user_id, event_type order by epoch_us(ts), event_id) gap
        |  from events)
        |select user_id, event_type, count(*) n_events,
        |  cast(sum(case when gap <= 1000000 then 1 else 0 end) as bigint) n_rapid
        |from g group by user_id, event_type
        |order by n_rapid desc, user_id, event_type limit 20""".stripMargin,

    "ext_transentropy" ->
      """with tr as (select lag(event_type) over (
        |      partition by user_id order by epoch_us(ts), event_id) x,
        |    event_type y
        |  from events),
        |nxy as (select x, y, cast(count(*) as bigint) n_xy from tr
        |  where x is not null group by 1, 2),
        |nx as (select x, cast(sum(n_xy) as bigint) n_x from nxy group by 1),
        |tot as (select cast(sum(n_xy) as bigint) n from nxy)
        |select max(n) n_trans,
        |  round(-sum(cast(n_xy as double) / n
        |    * ln(cast(n_xy as double) / n_x)), 6) h_cond_nats
        |from nxy join nx using (x) cross join tot""".stripMargin,

    "ext_reactivation" ->
      """with p as (select distinct user_id, cast(ts as date) d from events),
        |l as (select user_id, d,
        |    lag(d) over (partition by user_id order by d) prev from p)
        |select d, count(*) n_active,
        |  cast(sum(case when prev is null then 1 else 0 end) as bigint) n_new,
        |  cast(sum(case when d - prev >= 8 then 1 else 0 end) as bigint) n_react
        |from l group by d order by d""".stripMargin,

    "ext_pricerecon" ->
      """with li as (select l_orderkey ok,
        |    cast(sum(cast(round(l_extendedprice * (1 - l_discount)
        |      * (1 + l_tax) * 100) as bigint)) as bigint) li_cents
        |  from lineitem group by 1),
        |b as (select cast(round(o_totalprice * 100) as bigint) hdr_cents,
        |    li_cents,
        |    case when li_cents is null then 'no_lines'
        |      when li_cents = hdr_cents then 'exact'
        |      when abs(li_cents - hdr_cents) * 100 <= hdr_cents then 'within_1pct'
        |      else 'off' end bucket
        |  from orders left join li on o_orderkey = ok)
        |select bucket, count(*) n_orders,
        |  cast(sum(coalesce(li_cents, 0)) as bigint) li_cents_total,
        |  cast(sum(hdr_cents) as bigint) hdr_cents_total
        |from b group by bucket order by bucket""".stripMargin)
}
