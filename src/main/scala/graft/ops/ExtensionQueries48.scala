package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 48: financial-series risk — max
  * drawdown (fully integer via prefix-sum/running-max), the Sharpe
  * ratio on 1e-4-quantized daily returns, and seasonal strength from
  * integer-cents STL components. The risk companions to VaR (E-215)
  * and the SPC family.
  */
object ExtensionQueries48 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def daily(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("dy"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))

  // ---- E-301 maximum drawdown ----------------------------------------------------
  // Worst peak-to-trough fall of cumulative revenue-minus-trend (cum
  // of y − mean, so the series actually goes down): drawdown_t =
  // runmax(cum) − cum — ALL integer (prefix sums, running max); the
  // report is the max drawdown, its trough day, and the peak day it
  // fell from — the risk number VaR's daily quantile can't see
  // (drawdowns compound).
  def extDrawdown(s: SparkSession, dir: String): DataFrame = {
    val d = daily(s, dir)
    val tot = d.agg(sum("y").as("sy"), count(lit(1)).as("n"))
    val w = Window.orderBy("dy").rowsBetween(Window.unboundedPreceding, 0)
    val cum = d.crossJoin(broadcast(tot))
      // de-mean in integer: cum_t·n = n·Σ_{s≤t} y_s − t·Σy
      .withColumn("t", count(lit(1)).over(w))
      .withColumn("cum_n",
        col("n") * sum("y").over(w) - col("t") * col("sy"))
      .withColumn("peak_n", max("cum_n").over(w))
      .withColumn("dd_n", col("peak_n") - col("cum_n"))
    val worst = cum.orderBy(desc("dd_n"), asc("dy")).limit(1)
      .select(col("dy").cast("string").as("trough_day"),
        col("dd_n"), col("peak_n"), col("n"))
    val peakDay = cum.join(broadcast(worst.select(col("peak_n").as("pn"))),
        col("cum_n") === col("pn"))
      .agg(min(col("dy").cast("string")).as("peak_day"))
    worst.crossJoin(broadcast(peakDay))
      .select(col("peak_day"), col("trough_day"),
        round(col("dd_n").cast("double") / col("n") / 100, 2)
          .as("max_drawdown"))
  }

  // ---- E-302 Sharpe ratio --------------------------------------------------------
  // Annualized mean/sd of daily revenue returns: ret_bp =
  // round((y_t/y_{t−1} − 1)·1e4) — the per-row division is settled,
  // the QUANTIZED basis-point returns make Σ and Σ² exact decimals
  // (E-257 discipline), and Sharpe = mean/sd·√252 is one closed form.
  def extSharpe(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("dy")
    val rets = daily(s, dir)
      .withColumn("prev", lag("y", 1).over(w))
      .filter(col("prev").isNotNull)
      .select(round((col("y").cast("double") / col("prev") - 1) * 10000)
        .cast("long").cast("decimal(38,0)").as("r"))
    rets.agg(count(lit(1)).as("n"), sum("r").as("sr"),
        sum(col("r") * col("r")).as("srr"))
      .select(col("n"),
        round(col("sr").cast("double") / col("n"), 4).as("mean_ret_bp"),
        round(sqrt((col("n").cast("double") * col("srr").cast("double") -
          col("sr").cast("double") * col("sr").cast("double")) /
          (col("n").cast("double") * col("n").cast("double"))), 4)
          .as("sd_ret_bp"))
      .withColumn("sharpe_annual",
        round(col("mean_ret_bp") / col("sd_ret_bp") *
          sqrt(lit(252.0)), 4))
  }

  // ---- E-303 seasonal strength ---------------------------------------------------
  // How much of the detrended signal is the weekly cycle? F_s =
  // max(0, 1 − Var(resid)/Var(detrended)) over the E-266 components —
  // both variances from EXACT integer moments (detrended and residual
  // are carried in scaled integer units: det29 = 29·(x − trend) cents,
  // resid29·100 after subtracting the integer-scaled weekday means),
  // so the strength is one settled form.
  def extSeasstrength(s: SparkSession, dir: String): DataFrame = {
    val d = daily(s, dir)
    val w = Window.orderBy("dy").rowsBetween(-14, 14)
    val framed = d
      .withColumn("nf", count(lit(1)).over(w))
      .withColumn("sf", sum("y").over(w))
      .filter(col("nf") === 29)
      .withColumn("det29", (col("y") * 29 - col("sf")).cast("decimal(38,0)"))
      .withColumn("dow", dayofweek(col("dy")))
    // residual = det29 minus its weekday mean, and the GLOBAL residual
    // mean is exactly 0 (Σ_dow nd·(sd/nd) = Σ det29), so
    // Var(resid) = SS_within/N = Σ_dow (S2_d − S1_d²/nd)/N — one
    // settled term per weekday from exact integer moments, a 7-term
    // fold. Var(detrended) = (N·S2 − S1²)/N² — exact until division.
    val perDow = framed.groupBy("dow")
      .agg(count(lit(1)).as("nd"), sum("det29").as("s1d"),
        sum(col("det29") * col("det29")).as("s2d"))
    val within = perDow.agg(sum("nd").as("n"),
      sum("s1d").as("s1"), sum("s2d").as("s2"),
      sum(col("s2d").cast("double") -
        col("s1d").cast("double") * col("s1d").cast("double") /
          col("nd")).as("ssw"))
    within.select(col("n"),
      round((col("n").cast("double") * col("s2").cast("double") -
        col("s1").cast("double") * col("s1").cast("double")) /
        (col("n").cast("double") * col("n").cast("double")) / 841e4, 2)
        .as("var_detrended"),
      round(col("ssw") / col("n").cast("double") / 841e4, 2)
        .as("var_residual"))
      .withColumn("seasonal_strength",
        round(greatest(lit(0.0),
          lit(1.0) - col("var_residual") / col("var_detrended")), 6))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_drawdown" -> (extDrawdown _),
    "ext_sharpe" -> (extSharpe _),
    "ext_seasstrength" -> (extSeasstrength _))

  private val dailySql =
    """daily as (select cast(o_orderdate as date) dy,
      |    cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint) y
      |  from orders group by 1)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // E-301: identical integer de-meaned prefix walk.
    "ext_drawdown" ->
      s"""with $dailySql,
        |tot as (select cast(sum(y) as hugeint) sy,
        |    cast(count(*) as bigint) n from daily),
        |cum as (select dy,
        |    cast(row_number() over (order by dy) as hugeint) t,
        |    n * sum(cast(y as hugeint)) over (order by dy
        |      rows unbounded preceding) cum0
        |  from daily cross join tot),
        |cn as (select dy, cum0 - t * sy cum_n, n
        |  from cum cross join tot),
        |dd as (select dy, cum_n,
        |    max(cum_n) over (order by dy rows unbounded preceding) peak_n,
        |    n
        |  from cn),
        |worst as (select dy trough, peak_n - cum_n dd_n, peak_n, n
        |  from dd order by peak_n - cum_n desc, dy limit 1),
        |pk as (select strftime(min(dd.dy), '%Y-%m-%d') peak_day
        |  from dd join worst on dd.cum_n = worst.peak_n)
        |select peak_day, strftime(trough, '%Y-%m-%d') trough_day,
        |  round(cast(dd_n as double) / n / 100, 2) max_drawdown
        |from worst cross join pk""".stripMargin,

    // E-302: identical quantized returns and closed form.
    "ext_sharpe" ->
      s"""with $dailySql,
        |r0 as (select cast(round((cast(y as double) /
        |      lag(y) over (order by dy) - 1) * 10000) as bigint) r
        |  from daily qualify lag(y) over (order by dy) is not null),
        |m as (select cast(count(*) as bigint) n,
        |    sum(cast(r as hugeint)) sr,
        |    sum(cast(r as hugeint) * r) srr from r0)
        |select n,
        |  round(cast(sr as double) / n, 4) mean_ret_bp,
        |  round(sqrt((cast(n as double) * cast(srr as double) -
        |    cast(sr as double) * cast(sr as double)) /
        |    (cast(n as double) * cast(n as double))), 4) sd_ret_bp,
        |  round(round(cast(sr as double) / n, 4) /
        |    round(sqrt((cast(n as double) * cast(srr as double) -
        |      cast(sr as double) * cast(sr as double)) /
        |      (cast(n as double) * cast(n as double))), 4)
        |    * sqrt(252.0), 4) sharpe_annual
        |from m""".stripMargin,

    // E-303: identical integer-scaled components and variance ratio.
    "ext_seasstrength" ->
      s"""with $dailySql,
        |framed as (select dy, y,
        |    count(*) over (order by dy rows between 14 preceding
        |      and 14 following) nf,
        |    sum(y) over (order by dy rows between 14 preceding
        |      and 14 following) sf
        |  from daily),
        |det as (select dy, cast(y * 29 - sf as hugeint) det29,
        |    dayofweek(dy) + 1 dow
        |  from framed where nf = 29),
        |perdow as (select dow, cast(count(*) as bigint) nd,
        |    sum(det29) s1d, sum(det29 * det29) s2d from det group by dow),
        |m as (select cast(sum(nd) as bigint) n, sum(s1d) s1, sum(s2d) s2,
        |    sum(cast(s2d as double) - cast(s1d as double)
        |      * cast(s1d as double) / nd) ssw
        |  from perdow)
        |select n,
        |  round((cast(n as double) * cast(s2 as double) -
        |    cast(s1 as double) * cast(s1 as double)) /
        |    (cast(n as double) * cast(n as double)) / 841e4, 2)
        |    var_detrended,
        |  round(ssw / cast(n as double) / 841e4, 2) var_residual,
        |  round(greatest(0.0, 1.0 -
        |    (ssw / cast(n as double) / 841e4) /
        |    ((cast(n as double) * cast(s2 as double) -
        |      cast(s1 as double) * cast(s1 as double)) /
        |      (cast(n as double) * cast(n as double)) / 841e4)), 6)
        |    seasonal_strength
        |from m""".stripMargin)
}
