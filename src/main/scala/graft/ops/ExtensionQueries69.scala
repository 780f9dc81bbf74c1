package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 69: smoothing and measurement
  * agreement — exact-dyadic EWMA level over daily revenue, Deming
  * errors-in-variables regression between two per-order "instruments",
  * and the Bland-Altman agreement readout over the same pair.
  */
object ExtensionQueries69 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Per-order two "measurements" of order size: gross lineitem charge
    * vs net+tax charge, both as per-line-rounded exact cents (the
    * rounding point is part of the contract so both engines fold the
    * same integers).
    */
  private def pairFrame(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_orderkey").as("ok"))
      .agg(
        sum(round(col("l_extendedprice") * 100).cast("long")).as("x"),
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax")) * 100).cast("long")).as("y"))

  // ---- E-355 EWMA revenue level --------------------------------------------------
  // Exponentially weighted daily-revenue level with α = 1/2 truncated
  // at 40 lags — weights 2^(39−j) are EXACT dyadic integers (no
  // float pow round-trip to disagree on), so numerator and
  // denominator are exact decimal folds; normalization runs over the
  // lags actually present (pandas adjust=True semantics at the series
  // head). The truncation error 2^−40 ≈ 9e-13 is below the 2-dp
  // output grid by construction. Per target day: 40 lag probes via an
  // EQUI-join on the lagged date — never a range join. Last 15 days,
  // actual vs level.
  def extEwma(s: SparkSession, dir: String): DataFrame = {
    val days = t(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
    val probes = days.select(col("d").as("td"),
        explode(sequence(lit(0), lit(39))).as("j"))
      .withColumn("sd", expr("date_sub(td, j)"))
      .withColumn("w", pow(lit(2.0), lit(39) - col("j")).cast("long"))
    probes.join(days.select(col("d").as("sd"), col("rev")), Seq("sd"))
      .groupBy(col("td"))
      .agg(
        sum(when(col("j") === 0, col("rev"))).as("actual_cents"),
        sum(col("w").cast("decimal(38,0)") * col("rev")).as("num"),
        sum(col("w").cast("decimal(38,0)")).as("den"))
      .select(col("td").as("d"),
        round(col("actual_cents").cast("double") / 100, 2)
          .as("actual_dollars"),
        round(col("num").cast("double") / col("den").cast("double") / 100, 2)
          .as("ewma_dollars"))
      .orderBy(desc("d"))
      .limit(15)
  }

  // ---- E-356 Deming regression ---------------------------------------------------
  // Errors-in-variables line between the two order-size instruments
  // (δ = 1): b = (s_yy − s_xx + √((s_yy − s_xx)² + 4 s_xy²)) ∕ 2 s_xy
  // on centered second moments — symmetric in x/y where OLS is not.
  // Moments cross-multiplied in decimal(38,0)/HUGEINT, ONE conversion
  // to double before the radical (identical expression tree both
  // engines ⇒ identical IEEE result). OLS slopes both directions
  // reported as the contrast: Deming must land between b_yx and
  // 1∕b_xy.
  def extDeming(s: SparkSession, dir: String): DataFrame = {
    val p = pairFrame(s, dir)
      .select(col("x").cast("decimal(38,0)").as("x"),
        col("y").cast("decimal(38,0)").as("y"))
    val mom = p.agg(count(lit(1)).as("n"), sum("x").as("sx"),
      sum("y").as("sy"), sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    val cxx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val cyy = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    val cxy = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    mom.select(col("n"), {
        val b = (cyy - cxx +
          sqrt((cyy - cxx) * (cyy - cxx) + lit(4.0) * cxy * cxy)) /
          (lit(2.0) * cxy)
        round(b, 6).as("deming_slope")
      },
      round((col("sy").cast("double") -
        ((cyy - cxx + sqrt((cyy - cxx) * (cyy - cxx) +
          lit(4.0) * cxy * cxy)) / (lit(2.0) * cxy)) *
          col("sx").cast("double")) / col("n").cast("double") / 100, 2)
        .as("deming_intercept_dollars"),
      round(cxy / cxx, 6).as("ols_slope_yx"),
      round(cyy / cxy, 6).as("inv_ols_slope_xy"))
  }

  // ---- E-357 Bland-Altman agreement ----------------------------------------------
  // Do the two instruments agree? Bias = mean(y − x) with the ±1.96σ
  // limits of agreement (z pinned at 1.959964, E-254 discipline) and
  // the share of orders outside the limits. Differences are exact
  // integer cents; σ from cross-multiplied decimal moments; the
  // outside test compares an integer against the one settled float
  // threshold, so the boundary verdict is identical on both engines.
  def extBlandaltman(s: SparkSession, dir: String): DataFrame = {
    val d = pairFrame(s, dir)
      .select((col("y") - col("x")).cast("decimal(38,0)").as("diff"))
    val mom = d.agg(count(lit(1)).as("n"), sum("diff").as("sd1"),
        sum(col("diff") * col("diff")).as("sd2"))
      .select(col("n"),
        (col("sd1").cast("double") / col("n")).as("bias_cents"),
        sqrt((col("n") * col("sd2") - col("sd1") * col("sd1")).cast("double") /
          col("n").cast("double") / (col("n") - 1).cast("double"))
          .as("sd_cents"))
      .limit(1)
    d.crossJoin(broadcast(mom))
      .withColumn("outside",
        when(abs(col("diff").cast("double") - col("bias_cents")) >
          lit(1.959964) * col("sd_cents"), 1L).otherwise(0L))
      .agg(first("n").as("n"),
        round(first("bias_cents") / 100, 2).as("bias_dollars"),
        round(first("sd_cents") / 100, 2).as("sd_dollars"),
        round((first("bias_cents") - lit(1.959964) * first("sd_cents")) / 100,
          2).as("loa_low_dollars"),
        round((first("bias_cents") + lit(1.959964) * first("sd_cents")) / 100,
          2).as("loa_high_dollars"),
        round(sum("outside").cast("double") * 100 / first("n"), 4)
          .as("pct_outside"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_ewma" -> (extEwma _),
    "ext_deming" -> (extDeming _),
    "ext_blandaltman" -> (extBlandaltman _))

  private val pairSql =
    """p as (select l_orderkey ok,
      |    sum(cast(round(l_extendedprice * 100) as bigint)) x,
      |    sum(cast(round(l_extendedprice * (1 - l_discount) *
      |      (1 + l_tax) * 100) as bigint)) y
      |  from lineitem group by 1)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // E-355: identical dyadic weights, lag equi-join, decimal folds.
    "ext_ewma" ->
      """with days as (select cast(o_orderdate as date) d,
        |    sum(cast(round(o_totalprice * 100) as bigint)) rev
        |  from orders group by 1),
        |probes as (select t.d td, j.j,
        |    t.d - cast(j.j as integer) sd,
        |    cast(pow(2.0, 39 - j.j) as bigint) w
        |  from days t cross join
        |    (select unnest(generate_series(0, 39)) j) j),
        |m as (select td,
        |    cast(sum(case when j = 0 then rev end) as bigint) actual_cents,
        |    sum(cast(w as hugeint) * rev) num,
        |    sum(cast(w as hugeint)) den
        |  from probes join days s on probes.sd = s.d
        |  group by td)
        |select td d,
        |  round(cast(actual_cents as double) / 100, 2) actual_dollars,
        |  round(cast(num as double) / cast(den as double) / 100, 2)
        |    ewma_dollars
        |from m order by d desc limit 15""".stripMargin,

    // E-356: identical closed form, one decimal→double conversion.
    "ext_deming" ->
      s"""with $pairSql,
        |d as (select cast(x as hugeint) x, cast(y as hugeint) y from p),
        |mom as (select cast(count(*) as bigint) n, sum(x) sx, sum(y) sy,
        |    sum(x * x) sxx, sum(y * y) syy, sum(x * y) sxy
        |  from d)
        |select n,
        |  round((cast(n * syy - sy * sy as double) -
        |      cast(n * sxx - sx * sx as double) +
        |      sqrt((cast(n * syy - sy * sy as double) -
        |          cast(n * sxx - sx * sx as double)) *
        |        (cast(n * syy - sy * sy as double) -
        |          cast(n * sxx - sx * sx as double)) +
        |        4.0 * cast(n * sxy - sx * sy as double) *
        |          cast(n * sxy - sx * sy as double))) /
        |    (2.0 * cast(n * sxy - sx * sy as double)), 6) deming_slope,
        |  round((cast(sy as double) -
        |    ((cast(n * syy - sy * sy as double) -
        |        cast(n * sxx - sx * sx as double) +
        |        sqrt((cast(n * syy - sy * sy as double) -
        |            cast(n * sxx - sx * sx as double)) *
        |          (cast(n * syy - sy * sy as double) -
        |            cast(n * sxx - sx * sx as double)) +
        |          4.0 * cast(n * sxy - sx * sy as double) *
        |            cast(n * sxy - sx * sy as double))) /
        |      (2.0 * cast(n * sxy - sx * sy as double))) *
        |      cast(sx as double)) / cast(n as double) / 100, 2)
        |    deming_intercept_dollars,
        |  round(cast(n * sxy - sx * sy as double) /
        |    cast(n * sxx - sx * sx as double), 6) ols_slope_yx,
        |  round(cast(n * syy - sy * sy as double) /
        |    cast(n * sxy - sx * sy as double), 6) inv_ols_slope_xy
        |from mom""".stripMargin,

    // E-357: identical moments, pinned z, integer-vs-threshold test.
    "ext_blandaltman" ->
      s"""with $pairSql,
        |d as (select cast(y - x as hugeint) diff from p),
        |mom as (select cast(count(*) as bigint) n, sum(diff) sd1,
        |    sum(diff * diff) sd2
        |  from d),
        |st as (select n, cast(sd1 as double) / n bias_cents,
        |    sqrt(cast(n * sd2 - sd1 * sd1 as double) /
        |      cast(n as double) / cast(n - 1 as double)) sd_cents
        |  from mom)
        |select any_value(n) n,
        |  round(any_value(bias_cents) / 100, 2) bias_dollars,
        |  round(any_value(sd_cents) / 100, 2) sd_dollars,
        |  round((any_value(bias_cents) -
        |    1.959964 * any_value(sd_cents)) / 100, 2) loa_low_dollars,
        |  round((any_value(bias_cents) +
        |    1.959964 * any_value(sd_cents)) / 100, 2) loa_high_dollars,
        |  round(cast(sum(case when abs(cast(diff as double) - bias_cents) >
        |      1.959964 * sd_cents then 1 else 0 end) as double) * 100 /
        |    any_value(n), 4) pct_outside
        |from d cross join st""".stripMargin)
}
