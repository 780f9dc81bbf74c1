package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 20: experimentation and
  * forecasting plumbing — sample-ratio-mismatch guard, CUPED variance
  * reduction, naive-seasonal forecast backtest, Bollinger bands, and
  * SAX discretization.
  */
object ExtensionQueries20 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def h60(c: org.apache.spark.sql.Column) =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  private def daily(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))

  // ---- E-194 sample-ratio-mismatch guard -----------------------------------------
  // The A/B-test prerequisite: assign every user to an arm with the
  // portable 60-bit hash (so BOTH engines — and any replica of the
  // pipeline — derive the identical split), then χ²-test the observed
  // arm sizes against 50/50. Counts are integers; expected = n/2 is one
  // settled division. Flag at the 5% critical value 3.841.
  def extSrm(s: SparkSession, dir: String): DataFrame = {
    val arms = t(s, dir, "events").select("user_id").distinct()
      .select(pmod(h60(col("user_id").cast("string")), lit(2L)).as("arm"))
      .groupBy("arm").agg(count(lit(1)).as("k"))
    arms.agg(
        sum("k").as("n_users"),
        sum(when(col("arm") === 0, col("k")).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1, col("k")).otherwise(0L)).as("n_b"))
      .withColumn("chi2",
        pow(col("n_a") - col("n_users") / 2.0, 2) / (col("n_users") / 2.0) +
          pow(col("n_b") - col("n_users") / 2.0, 2) / (col("n_users") / 2.0))
      .select(col("n_users"), col("n_a"), col("n_b"),
        round(col("chi2"), 6).as("chi2"),
        (col("chi2") > 3.841).as("srm"))
  }

  // ---- E-195 CUPED variance reduction --------------------------------------------
  // CUPED with a pre-period covariate: pre = events in the first 15
  // days, post = purchase cents in the last 15, θ = cov/var(pre), and
  // var(post − θ·pre) = var_post − cov²/var_pre in closed form — so
  // EVERY moment derives from exact decimal(38,0)/HUGEINT sums of
  // integers (Σx, Σy, Σx², Σy², Σxy) and the whole report is settled
  // divisions, no float fold anywhere. One pass over events, one
  // single-row output.
  def extCuped(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-15").cast("date")
    val per = t(s, dir, "events")
      .groupBy("user_id")
      .agg(
        sum(when(to_date(col("ts")) <= cut, 1L).otherwise(0L))
          .cast("decimal(38,0)").as("pre"),
        sum(when(to_date(col("ts")) > cut && col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).otherwise(0L))
          .cast("decimal(38,0)").as("post"))
    val m = per.agg(
      count(lit(1)).as("n"),
      sum("pre").as("sx"), sum("post").as("sy"),
      sum(col("pre") * col("pre")).as("sxx"),
      sum(col("post") * col("post")).as("syy"),
      sum(col("pre") * col("post")).as("sxy"))
    m.select(col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("theta"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") *
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          ((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("n") * col("syy") - col("sy") * col("sy")).cast("double")))
          .as("var_reduction"),
        (col("sy").cast("double") / col("n") / 100.0).as("mean_post"))
      .select(col("n"), round(col("theta"), 6).as("theta"),
        round(col("var_reduction"), 6).as("var_reduction"),
        round(col("mean_post"), 4).as("mean_post"))
  }

  // ---- E-196 naive-seasonal forecast backtest ------------------------------------
  // Backtest of the same-weekday-last-week forecaster on daily purchase
  // revenue: forecast(d) = actual(d−7), scored with MAE / MAPE / sMAPE.
  // The join is equi on the shifted date; errors are exact cents longs
  // until the final averaged ratios. The honest baseline every fancier
  // forecaster must beat.
  def extFcsteval(s: SparkSession, dir: String): DataFrame = {
    val d = daily(s, dir)
    val f = d.select(date_add(col("d"), 7).as("d"), col("cents").as("fc"))
    d.join(f, "d")
      .agg(count(lit(1)).as("n_days"),
        round(sum(abs(col("cents") - col("fc"))).cast("double") /
          count(lit(1)) / 100.0, 4).as("mae"),
        round(avg(abs(col("cents") - col("fc")).cast("double") / col("cents")),
          6).as("mape"),
        round(avg(abs(col("cents") - col("fc")).cast("double") * 2.0 /
          (col("cents") + col("fc"))), 6).as("smape"))
  }

  // ---- E-197 Bollinger bands -----------------------------------------------------
  // 7-day rolling mean ± 2σ bands over daily purchase revenue with
  // breakout flags. Rolling Σx and Σx² run over exact decimal cents, so
  // each day's mean and population σ are settled divisions of exact
  // integers — the band comparison can't straddle an ULP. Days without
  // a full 7-day history flag as warmup instead of false-alarming.
  def extBollinger(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("d").rowsBetween(-6, 0)
    daily(s, dir)
      .select(col("d"), col("cents"),
        col("cents").cast("decimal(38,0)").as("c"))
      .withColumn("k", count(lit(1)).over(w))
      .withColumn("sx", sum("c").over(w))
      .withColumn("sxx", sum(expr("c * c")).over(w))
      .withColumn("ma", col("sx").cast("double") / col("k"))
      .withColumn("variance",
        (col("k") * col("sxx") - col("sx") * col("sx")).cast("double") /
          (col("k") * col("k")).cast("double"))
      .select(col("d"), col("cents"), round(col("ma") / 100.0, 4).as("ma7"),
        round(sqrt(col("variance")) / 100.0, 4).as("sd7"),
        when(col("k") < 7, "warmup")
          .when(col("cents") > col("ma") + lit(2.0) * sqrt(col("variance")),
            "above")
          .when(col("cents") < col("ma") - lit(2.0) * sqrt(col("variance")),
            "below")
          .otherwise("in").as("band"))
      .orderBy("d")
  }

  // ---- E-198 SAX discretization --------------------------------------------------
  // Symbolic aggregate approximation of the daily revenue series:
  // z-normalize against the series' population mean/σ (both from exact
  // integer sums — settled), then map to the 4-symbol alphabet at the
  // N(0,1) quartile breakpoints ±0.6745 / 0 (decimal literals on both
  // engines). The discretized series is what motif/novelty search
  // indexes at scale.
  def extSax(s: SparkSession, dir: String): DataFrame = {
    val d = daily(s, dir).select(col("d"),
      col("cents").cast("decimal(38,0)").as("c"))
    val m = d.agg(count(lit(1)).as("n"), sum("c").as("sx"),
      sum(expr("c * c")).as("sxx"))
    d.crossJoin(m)
      .withColumn("mu", col("sx").cast("double") / col("n"))
      .withColumn("sigma",
        sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") /
          (col("n") * col("n")).cast("double")))
      .withColumn("z", (col("c").cast("double") - col("mu")) / col("sigma"))
      .select(col("d"), round(col("z"), 6).as("z"),
        when(col("z") < -0.6745, "a")
          .when(col("z") < 0.0, "b")
          .when(col("z") < 0.6745, "c")
          .otherwise("d").as("sym"))
      .orderBy("d")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_srm_chi2" -> (extSrm _),
    "ext_cuped" -> (extCuped _),
    "ext_fcsteval" -> (extFcsteval _),
    "ext_bollinger" -> (extBollinger _),
    "ext_sax" -> (extSax _))

  val oracleSql: Map[String, String] = Map(
    "ext_srm_chi2" ->
      """with arms as (select
        |    ('0x' || substr(sha256(cast(user_id as varchar)), 1, 15))::bigint % 2
        |      arm
        |  from (select distinct user_id from events)),
        |k as (select cast(count(*) as bigint) n_users,
        |    cast(sum(case when arm = 0 then 1 else 0 end) as bigint) n_a,
        |    cast(sum(case when arm = 1 then 1 else 0 end) as bigint) n_b
        |  from arms),
        |c as (select n_users, n_a, n_b,
        |    pow(n_a - n_users / 2.0, 2) / (n_users / 2.0)
        |      + pow(n_b - n_users / 2.0, 2) / (n_users / 2.0) chi2 from k)
        |select n_users, n_a, n_b, round(chi2, 6) chi2, chi2 > 3.841 srm
        |from c""".stripMargin,

    "ext_cuped" ->
      """with per as (select user_id,
        |    cast(cast(sum(case when cast(ts as date) <= date '2024-01-15'
        |      then 1 else 0 end) as bigint) as hugeint) pre,
        |    cast(cast(sum(case when cast(ts as date) > date '2024-01-15'
        |        and event_type = 'purchase'
        |      then cast(round(value * 100) as bigint) else 0 end) as bigint)
        |      as hugeint) post
        |  from events group by 1),
        |m as (select cast(count(*) as bigint) n,
        |    sum(pre) sx, sum(post) sy, sum(pre * pre) sxx,
        |    sum(post * post) syy, sum(pre * post) sxy from per)
        |select n,
        |  round(cast(n * sxy - sx * sy as double)
        |    / cast(n * sxx - sx * sx as double), 6) theta,
        |  round(cast(n * sxy - sx * sy as double)
        |      * cast(n * sxy - sx * sy as double)
        |      / (cast(n * sxx - sx * sx as double)
        |        * cast(n * syy - sy * sy as double)), 6) var_reduction,
        |  round(cast(sy as double) / n / 100.0, 4) mean_post
        |from m""".stripMargin,

    "ext_fcsteval" ->
      """with daily as (select cast(ts as date) d,
        |    cast(sum(cast(round(value * 100) as bigint)) as bigint) cents
        |  from events where event_type = 'purchase' group by 1),
        |j as (select a.cents, f.cents fc from daily a
        |  join daily f on a.d = f.d + 7)
        |select cast(count(*) as bigint) n_days,
        |  round(cast(sum(abs(cents - fc)) as double) / count(*) / 100.0, 4) mae,
        |  round(avg(cast(abs(cents - fc) as double) / cents), 6) mape,
        |  round(avg(cast(abs(cents - fc) as double) * 2.0 / (cents + fc)), 6)
        |    smape
        |from j""".stripMargin,

    "ext_bollinger" ->
      """with daily as (select cast(ts as date) d,
        |    cast(sum(cast(round(value * 100) as bigint)) as bigint) cents
        |  from events where event_type = 'purchase' group by 1),
        |r as (select d, cents,
        |    count(*) over w k,
        |    sum(cast(cents as hugeint)) over w sx,
        |    sum(cast(cents as hugeint) * cents) over w sxx
        |  from daily window w as (order by d rows between 6 preceding
        |    and current row)),
        |b as (select d, cents, k,
        |    cast(sx as double) / k ma,
        |    cast(k * sxx - sx * sx as double) / cast(k * k as double) variance
        |  from r)
        |select d, cents, round(ma / 100.0, 4) ma7,
        |  round(sqrt(variance) / 100.0, 4) sd7,
        |  case when k < 7 then 'warmup'
        |    when cents > ma + 2.0 * sqrt(variance) then 'above'
        |    when cents < ma - 2.0 * sqrt(variance) then 'below'
        |    else 'in' end band
        |from b order by d""".stripMargin,

    "ext_sax" ->
      """with daily as (select cast(ts as date) d,
        |    cast(sum(cast(round(value * 100) as bigint)) as bigint) cents
        |  from events where event_type = 'purchase' group by 1),
        |m as (select cast(count(*) as bigint) n,
        |    sum(cast(cents as hugeint)) sx,
        |    sum(cast(cents as hugeint) * cents) sxx from daily),
        |z as (select d,
        |    (cast(cents as double) - cast(sx as double) / n)
        |      / sqrt(cast(n * sxx - sx * sx as double) / cast(n * n as double)) z
        |  from daily cross join m)
        |select d, round(z, 6) z,
        |  case when z < -0.6745 then 'a' when z < 0.0 then 'b'
        |    when z < 0.6745 then 'c' else 'd' end sym
        |from z order by d""".stripMargin)
}
