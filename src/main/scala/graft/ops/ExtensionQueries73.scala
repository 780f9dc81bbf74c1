package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 73: time-series structure — PACF
  * by closed-form Durbin-Levinson over exact autocorrelation
  * numerators, ratio-to-moving-average weekday seasonal indices, and
  * Brown's double exponential smoothing with a trend-aware forecast.
  */
object ExtensionQueries73 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def dayFrame(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"))

  // ---- E-367 partial autocorrelations (Durbin-Levinson) --------------------------
  // AR-order diagnosis for daily revenue: PACF lags 1..3 by the
  // closed Durbin-Levinson recursion unrolled over the exact-numerator
  // autocorrelations (E-366 discipline: d_t = n·x_t − Σx keeps every
  // ACF numerator an exact decimal; each φ_kk is then one shared
  // double expression). The lag pairing is a date equi-join on the
  // collapsed day series — never the fact table.
  def extPacf(s: SparkSession, dir: String): DataFrame = {
    val days = dayFrame(s, dir)
    val mm = days.agg(count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,0)")).as("sx")).limit(1)
    val dm = days.crossJoin(broadcast(mm))
      .select(col("d"), col("n"),
        (col("n") * col("x").cast("decimal(38,0)") - col("sx")).as("dt"))
    val den = dm.agg(first("n").as("n"), sum(col("dt") * col("dt")).as("s0"))
      .limit(1)
    val lags = dm.select(col("d"), col("dt"))
      .withColumn("k", explode(sequence(lit(1), lit(3))))
      .withColumn("dlag", expr("date_sub(d, k)"))
      .join(dm.select(col("d").as("dlag"), col("dt").as("dprev")),
        Seq("dlag"))
      .groupBy("k").agg(sum(col("dt") * col("dprev")).as("sk"))
    val wide = lags.crossJoin(broadcast(den))
      .select(col("k"), col("n"),
        (col("sk").cast("double") / col("s0").cast("double")).as("r"))
      .groupBy().agg(first("n").as("n"),
        max(when(col("k") === 1, col("r"))).as("r1"),
        max(when(col("k") === 2, col("r"))).as("r2"),
        max(when(col("k") === 3, col("r"))).as("r3"))
    val p2 = (col("r2") - col("r1") * col("r1")) /
      (lit(1.0) - col("r1") * col("r1"))
    val p21 = col("r1") * (lit(1.0) - p2)
    val p3 = (col("r3") - p21 * col("r2") - p2 * col("r1")) /
      (lit(1.0) - p21 * col("r1") - p2 * col("r2"))
    wide.select(col("n").as("n_days"),
      round(col("r1"), 6).as("acf1"), round(col("r2"), 6).as("acf2"),
      round(col("r3"), 6).as("acf3"),
      round(col("r1"), 6).as("pacf1"), round(p2, 6).as("pacf2"),
      round(p3, 6).as("pacf3"))
  }

  // ---- E-368 weekday seasonal indices --------------------------------------------
  // The classical ratio-to-moving-average decomposition step: each
  // day's revenue over its CENTERED 7-day average (only days with the
  // full ±3 neighborhood — edges drop), ratios 1e-9-quantized, then
  // the per-weekday mean normalized so the seven indices average 1.
  // Weekday alignment trap: Spark dayofweek is 1-based Sunday, DuckDB
  // 0-based — the oracle adds 1.
  def extSeasonalindex(s: SparkSession, dir: String): DataFrame = {
    val days = dayFrame(s, dir)
    val nb = days.select(col("d").as("td"), col("x").as("xt"),
        explode(sequence(lit(-3), lit(3))).as("j"))
      .withColumn("sd", expr("date_add(td, j)"))
      .join(days.select(col("d").as("sd"), col("x")), Seq("sd"))
      .groupBy(col("td"), col("xt"))
      .agg(count(lit(1)).as("cnt"), sum("x").as("wsum"))
      .filter(col("cnt") === 7)
      .select(col("td"),
        round(col("xt").cast("double") * 7e9 / col("wsum")).cast("long")
          .as("rq"))
    val byDow = nb.groupBy(dayofweek(col("td")).as("dow"))
      .agg(count(lit(1)).as("n_days"), sum("rq").as("srq"))
      .select(col("dow"), col("n_days"),
        (col("srq").cast("double") / col("n_days") / 1e9).as("mr"))
    val tot = byDow.agg(count(lit(1)).as("g"),
      sum((col("mr") * 1e9).cast("long")).as("smr")).limit(1)
    byDow.crossJoin(broadcast(tot))
      .select(col("dow"), col("n_days"),
        round(col("mr") * col("g") * 1e9 / col("smr").cast("double"), 6)
          .as("seasonal_index"))
      .orderBy("dow")
  }

  // ---- E-369 Brown double smoothing + trend forecast -----------------------------
  // E-355's EWMA cannot see trend; Brown's double smoothing can:
  // S' = EWMA(x), S'' = EWMA(S'), level = 2S'−S'', trend = S'−S''
  // (α=1/2 makes α∕(1−α)=1), forecast(h)=level+h·trend. Both stages
  // use the exact dyadic 2^(39−j) weights over a date equi-join;
  // stage-1 levels are quantized to integer tenths-of-cents before
  // stage 2 so the second fold is exact too. Last 10 days with the
  // 7-day-ahead forecast.
  def extHolt(s: SparkSession, dir: String): DataFrame = {
    val days = dayFrame(s, dir)
    def ewma(src: DataFrame, vcol: String): DataFrame =
      src.select(col("d").as("td"), explode(sequence(lit(0), lit(39))).as("j"))
        .withColumn("sd", expr("date_sub(td, j)"))
        .withColumn("w", pow(lit(2.0), lit(39) - col("j")).cast("long"))
        .join(src.select(col("d").as("sd"), col(vcol).as("v")), Seq("sd"))
        .groupBy(col("td").as("d"))
        .agg((sum(col("w").cast("decimal(38,0)") * col("v")).cast("double") /
          sum(col("w").cast("decimal(38,0)")).cast("double")).as("ew"))
    val s1 = ewma(days, "x")
      .select(col("d"), round(col("ew") * 10).cast("long").as("s1q"))
    val s2 = ewma(s1, "s1q")
    val joined = days
      .join(s1, Seq("d"))
      .join(s2.select(col("d"), col("ew").as("s2t")), Seq("d"))
      .select(col("d"),
        round(col("x").cast("double") / 100, 2).as("actual_dollars"),
        round((lit(2.0) * col("s1q") - col("s2t")) / 1000, 2)
          .as("level_dollars"),
        round((col("s1q") - col("s2t")) / 1000, 4).as("trend_dollars"),
        round((lit(2.0) * col("s1q") - col("s2t") +
          lit(7.0) * (col("s1q") - col("s2t"))) / 1000, 2)
          .as("forecast_7d_dollars"))
    joined.orderBy(desc("d")).limit(10)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_pacf" -> (extPacf _),
    "ext_seasonalindex" -> (extSeasonalindex _),
    "ext_holt" -> (extHolt _))

  private val daySql =
    """days as (select cast(o_orderdate as date) d,
      |    sum(cast(round(o_totalprice * 100) as bigint)) x
      |  from orders group by 1)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // E-367: identical exact numerators and unrolled recursion.
    "ext_pacf" ->
      s"""with $daySql,
        |mm as (select cast(count(*) as bigint) n,
        |    sum(cast(x as hugeint)) sx from days),
        |dm as (select d, n, n * cast(x as hugeint) - sx dt
        |  from days cross join mm),
        |den as (select any_value(n) n, sum(dt * dt) s0 from dm),
        |lags as (select k.k, sum(a.dt * b.dt) sk
        |  from dm a
        |  cross join (select unnest(generate_series(1, 3)) k) k
        |  join dm b on b.d = a.d - cast(k.k as integer)
        |  group by k.k),
        |rk as (select k, n, cast(sk as double) / cast(s0 as double) r
        |  from lags cross join den),
        |wide as (select any_value(n) n,
        |    max(case when k = 1 then r end) r1,
        |    max(case when k = 2 then r end) r2,
        |    max(case when k = 3 then r end) r3
        |  from rk),
        |dl as (select n, r1, r2, r3,
        |    (r2 - r1 * r1) / (1.0 - r1 * r1) p2
        |  from wide),
        |dl2 as (select n, r1, r2, r3, p2, r1 * (1.0 - p2) p21 from dl)
        |select n n_days, round(r1, 6) acf1, round(r2, 6) acf2,
        |  round(r3, 6) acf3, round(r1, 6) pacf1, round(p2, 6) pacf2,
        |  round((r3 - p21 * r2 - p2 * r1) /
        |    (1.0 - p21 * r1 - p2 * r2), 6) pacf3
        |from dl2""".stripMargin,

    // E-368: identical centered window, quantized ratios, +1 dow shift.
    "ext_seasonalindex" ->
      s"""with $daySql,
        |nb as (select t.d td, t.x xt,
        |    cast(count(*) as bigint) cnt,
        |    cast(sum(s.x) as bigint) wsum
        |  from days t
        |  cross join (select unnest(generate_series(-3, 3)) j) j
        |  join days s on s.d = t.d + cast(j.j as integer)
        |  group by 1, 2),
        |rq as (select td,
        |    cast(round(cast(xt as double) * 7e9 / wsum) as bigint) rq
        |  from nb where cnt = 7),
        |bydow as (select dayofweek(td) + 1 dow,
        |    cast(count(*) as bigint) n_days,
        |    cast(sum(rq) as bigint) srq
        |  from rq group by 1),
        |mr as (select dow, n_days,
        |    cast(srq as double) / n_days / 1e9 mr
        |  from bydow),
        |tot as (select cast(count(*) as bigint) g,
        |    cast(sum(cast(round(mr * 1e9) as bigint)) as bigint) smr
        |  from mr)
        |select dow, n_days,
        |  round(mr * g * 1e9 / cast(smr as double), 6) seasonal_index
        |from mr cross join tot
        |order by dow""".stripMargin,

    // E-369: identical dyadic two-stage folds and quantized stage-1.
    "ext_holt" ->
      s"""with $daySql,
        |p1 as (select t.d td, j.j, t.d - cast(j.j as integer) sd,
        |    cast(pow(2.0, 39 - j.j) as bigint) w
        |  from days t cross join
        |    (select unnest(generate_series(0, 39)) j) j),
        |s1 as (select p1.td d,
        |    cast(round(cast(sum(cast(w as hugeint) * s.x) as double) /
        |      cast(sum(cast(w as hugeint)) as double) * 10) as bigint) s1q
        |  from p1 join days s on p1.sd = s.d
        |  group by 1),
        |p2 as (select t.d td, j.j, t.d - cast(j.j as integer) sd,
        |    cast(pow(2.0, 39 - j.j) as bigint) w
        |  from s1 t cross join
        |    (select unnest(generate_series(0, 39)) j) j),
        |s2 as (select p2.td d,
        |    cast(sum(cast(w as hugeint) * cast(s.s1q as hugeint))
        |        as double) /
        |      cast(sum(cast(w as hugeint)) as double) s2t
        |  from p2 join s1 s on p2.sd = s.d
        |  group by 1)
        |select days.d,
        |  round(cast(days.x as double) / 100, 2) actual_dollars,
        |  round((2.0 * s1.s1q - s2.s2t) / 1000, 2) level_dollars,
        |  round((s1.s1q - s2.s2t) / 1000, 4) trend_dollars,
        |  round((2.0 * s1.s1q - s2.s2t + 7.0 * (s1.s1q - s2.s2t)) / 1000,
        |    2) forecast_7d_dollars
        |from days join s1 on s1.d = days.d join s2 on s2.d = days.d
        |order by days.d desc limit 10""".stripMargin)
}
