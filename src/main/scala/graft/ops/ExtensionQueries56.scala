package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 56: event studies and sensitivity
  * curves — a placebo-calibrated event study around a chosen date,
  * same-part price dispersion, and the attribution-window sensitivity
  * curve. Exact integer moments throughout; placebo dates come from
  * the deterministic hash coin.
  */
object ExtensionQueries56 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def h60(c: Column) =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  // ---- E-323 placebo-calibrated event study --------------------------------------
  // Did anything happen around 1996-07-01? Lift = mean daily revenue
  // in the ±7d event window over the rest-of-series baseline — and
  // its CALIBRATION: the same lift computed at 19 hash-chosen placebo
  // dates; the empirical rank of the true lift among placebos is the
  // event study's honest p-value (the E-125 coin discipline applied
  // to inference-by-placebo). All means are exact-cents ratios.
  def extEventstudy(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("dy"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
      .withColumn("x",
        (org.apache.spark.sql.functions.row_number()
          .over(org.apache.spark.sql.expressions.Window.orderBy("dy")) - 1)
          .cast("long"))
    val n = daily.agg(count(lit(1)).as("n"), sum("y").as("sy"))
    // candidate centers: index 0 = the TRUE event date's index; 1..19
    // = hash-chosen placebos clamped into [7, n-8]
    val cand = daily.sparkSession.range(0, 20)
      .select(col("id").cast("long").as("k"))
      .crossJoin(broadcast(n))
      .crossJoin(broadcast(daily
        .filter(col("dy") >= lit("1996-07-01").cast("date"))
        .agg(min("x").as("true_x")))) // first day ≥ the event date —
        // present at every fixture scale (sparse small-SF series)
      .select(col("k"), col("n"), col("sy"),
        when(col("k") === 0, col("true_x"))
          .otherwise(pmod(h60(concat(lit("es|"), col("k"))),
            col("n") - 14) + 7).as("cx"))
    val lifts = daily.crossJoin(broadcast(cand))
      .withColumn("inwin", abs(col("x") - col("cx")) <= 7)
      .groupBy("k")
      .agg(max("n").as("n"), max("sy").as("sy"),
        sum(when(col("inwin"), col("y")).otherwise(0L)).as("wy"),
        sum(when(col("inwin"), 1L).otherwise(0L)).as("wn"))
      .select(col("k"),
        ((col("wy").cast("double") / col("wn")) /
          ((col("sy") - col("wy")).cast("double") /
            (col("n") - col("wn")))).as("lift"))
    val trueLift = lifts.filter(col("k") === 0)
      .select(col("lift").as("true_lift"))
      .limit(1) // k==0 is one candidate row; structural cap
    lifts.crossJoin(broadcast(trueLift))
      .agg(round(max("true_lift"), 6).as("event_lift"),
        sum(when(col("k") =!= 0 && col("lift") >= col("true_lift"), 1L)
          .otherwise(0L)).as("n_placebos_ge"),
        count(lit(1)).as("n_candidates"))
      .withColumn("empirical_p",
        round((col("n_placebos_ge") + 1).cast("double") / 20, 4))
  }

  // ---- E-324 price dispersion ----------------------------------------------------
  // Law-of-one-price audit: the same part sold at different unit
  // prices — per-part CV and max/min spread from exact cents moments,
  // top-15 most dispersed (≥5 sales). The market-efficiency screen
  // beside E-217's discount curve.
  def extPricedisp(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "lineitem")
      .select(col("l_partkey").as("pk"),
        round(col("l_extendedprice") * 100 / col("l_quantity"))
          .cast("long").as("unit_c"))
    val per = p.groupBy("pk")
      .agg(count(lit(1)).as("n_sales"),
        sum(col("unit_c").cast("decimal(38,0)")).as("s"),
        sum(col("unit_c").cast("decimal(38,0)") * col("unit_c")).as("ss"),
        min("unit_c").as("pmin"), max("unit_c").as("pmax"))
      .filter(col("n_sales") >= 5)
    per.select(col("pk"), col("n_sales"),
        round(col("s").cast("double") / col("n_sales") / 100, 2)
          .as("mean_price"),
        round(sqrt((col("n_sales").cast("double") * col("ss").cast("double") -
          col("s").cast("double") * col("s").cast("double")) /
          (col("n_sales").cast("double") * col("n_sales").cast("double"))) /
          (col("s").cast("double") / col("n_sales")), 6).as("cv"),
        round((col("pmax") - col("pmin")).cast("double") / 100, 2)
          .as("spread"))
      .orderBy(desc("cv"), asc("pk"))
      .limit(15)
  }

  // ---- E-325 attribution-window sensitivity --------------------------------------
  // How much does the conversion count depend on the attribution
  // window? View→purchase conversions credited at 1h/6h/24h/72h
  // windows — one pass over first-view/first-purchase pairs × the
  // 4-row window spine, integer µs comparisons. The
  // knob-sensitivity curve (E-304's shape) for attribution policy.
  def extAttrwindow(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val fv = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("v_us"))
    val fp = e.filter(col("event_type") === "purchase")
      .join(fv, "user_id")
      .filter(col("us") >= col("v_us"))
      .groupBy("user_id").agg(min("us").as("p_us"), min("v_us").as("v_us"))
    val ws = e.sparkSession.range(0, 4).select(
      element_at(array(lit(1L), lit(6L), lit(24L), lit(72L)),
        (col("id") + 1).cast("int")).as("w_hours"))
    val base = fv.join(fp.select(col("user_id"), col("p_us")),
      Seq("user_id"), "left")
    base.crossJoin(broadcast(ws))
      .groupBy("w_hours")
      .agg(count(lit(1)).as("n_viewers"),
        sum(when(col("p_us").isNotNull &&
          col("p_us") - col("v_us") <= col("w_hours") * 3600L * 1000000L,
          1L).otherwise(0L)).as("n_attributed"))
      .select(col("w_hours"), col("n_viewers"), col("n_attributed"),
        round(col("n_attributed").cast("double") / col("n_viewers"), 6)
          .as("attribution_rate"))
      .orderBy("w_hours")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_eventstudy" -> (extEventstudy _),
    "ext_pricedisp" -> (extPricedisp _),
    "ext_attrwindow" -> (extAttrwindow _))

  val oracleSql: Map[String, String] = Map(
    // E-323: identical placebo coin, window means, and empirical rank.
    "ext_eventstudy" ->
      """with daily as (select cast(o_orderdate as date) dy,
        |    cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint) y
        |  from orders group by 1),
        |d as (select dy, y,
        |    cast(row_number() over (order by dy) as bigint) - 1 x
        |  from daily),
        |n as (select cast(count(*) as bigint) n, cast(sum(y) as bigint) sy
        |  from d),
        |tx as (select min(x) true_x from d where dy >= date '1996-07-01'),
        |cand as (select k, n, sy,
        |    case when k = 0 then true_x
        |      else ('0x' || substr(sha256('es|' || cast(k as varchar)), 1,
        |        15))::bigint % (n - 14) + 7 end cx
        |  from unnest(range(0, 20)) u(k) cross join n cross join tx),
        |lifts as (select k,
        |    (cast(sum(case when abs(d.x - cx) <= 7 then y else 0 end)
        |        as double)
        |      / sum(case when abs(d.x - cx) <= 7 then 1 else 0 end))
        |    / (cast(max(sy) - sum(case when abs(d.x - cx) <= 7 then y
        |        else 0 end) as double)
        |      / (max(n) - sum(case when abs(d.x - cx) <= 7 then 1
        |        else 0 end))) lift
        |  from d cross join cand group by k),
        |tl as (select lift true_lift from lifts where k = 0)
        |select round(max(true_lift), 6) event_lift,
        |  cast(sum(case when k <> 0 and lift >= true_lift then 1 else 0
        |    end) as bigint) n_placebos_ge,
        |  cast(count(*) as bigint) n_candidates,
        |  round(cast(sum(case when k <> 0 and lift >= true_lift then 1
        |    else 0 end) + 1 as double) / 20, 4) empirical_p
        |from lifts cross join tl""".stripMargin,

    // E-324: identical unit-price rounding and exact moments.
    "ext_pricedisp" ->
      """with p as (select l_partkey pk,
        |    cast(round(l_extendedprice * 100 / l_quantity) as bigint)
        |      unit_c
        |  from lineitem),
        |per as (select pk, cast(count(*) as bigint) n_sales,
        |    sum(cast(unit_c as hugeint)) s,
        |    sum(cast(unit_c as hugeint) * unit_c) ss,
        |    cast(min(unit_c) as bigint) pmin,
        |    cast(max(unit_c) as bigint) pmax
        |  from p group by pk having count(*) >= 5)
        |select pk, n_sales,
        |  round(cast(s as double) / n_sales / 100, 2) mean_price,
        |  round(sqrt((cast(n_sales as double) * cast(ss as double) -
        |    cast(s as double) * cast(s as double)) /
        |    (cast(n_sales as double) * cast(n_sales as double))) /
        |    (cast(s as double) / n_sales), 6) cv,
        |  round(cast(pmax - pmin as double) / 100, 2) spread
        |from per order by cv desc, pk limit 15""".stripMargin,

    // E-325: identical first-view/first-purchase pairing and spine.
    "ext_attrwindow" ->
      """with e as (select user_id, event_type, epoch_us(ts) us
        |  from events),
        |fv as (select user_id, min(us) v_us from e
        |  where event_type = 'view' group by user_id),
        |fp as (select e.user_id, min(us) p_us, min(v_us) v_us
        |  from e join fv on fv.user_id = e.user_id
        |  where event_type = 'purchase' and us >= v_us
        |  group by e.user_id),
        |base as (select fv.user_id, fv.v_us, fp.p_us
        |  from fv left join fp on fp.user_id = fv.user_id)
        |select cast(w_hours as bigint) w_hours,
        |  cast(count(*) as bigint) n_viewers,
        |  cast(sum(case when p_us is not null
        |    and p_us - v_us <= cast(w_hours as bigint) * 3600 * 1000000
        |    then 1 else 0 end) as bigint) n_attributed,
        |  round(cast(sum(case when p_us is not null
        |    and p_us - v_us <= cast(w_hours as bigint) * 3600 * 1000000
        |    then 1 else 0 end) as double) / count(*), 6) attribution_rate
        |from base cross join unnest([1, 6, 24, 72]) w(w_hours)
        |group by w_hours order by w_hours""".stripMargin)
}
