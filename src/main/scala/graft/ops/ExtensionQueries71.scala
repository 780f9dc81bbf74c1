package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 71: distributional testing and
  * targeting evaluation — Jarque-Bera normality from exact raw
  * moments, Gumbel extreme-value return levels on daily block maxima,
  * and the Qini uplift curve over the portable-hash experiment split.
  */
object ExtensionQueries71 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def h60(c: org.apache.spark.sql.Column) =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  // ---- E-361 Jarque-Bera normality test ------------------------------------------
  // Are order totals normal? JB = n∕6·(S² + (K−3)²∕4) with skewness
  // and kurtosis from RAW power sums Σx..Σx⁴ held exact in
  // decimal(38,0) (cents⁴ ≈ 5e30 per row — the 38-digit headroom is
  // the point), central moments assembled in ONE shared double
  // expression so both engines settle identical IEEE values. Verdict
  // against the χ²₂ 5% critical value 5.991465 (pinned).
  def extJarquebera(s: SparkSession, dir: String): DataFrame = {
    val x = t(s, dir, "orders")
      .select(round(col("o_totalprice") * 100).cast("long")
        .cast("decimal(38,0)").as("x"))
    val mom = x.agg(count(lit(1)).as("n"), sum("x").as("s1"),
      sum(col("x") * col("x")).as("s2"),
      sum(col("x") * col("x") * col("x")).as("s3"),
      sum(col("x") * col("x") * col("x") * col("x")).as("s4"))
    val n = col("n").cast("double")
    val m1 = col("s1").cast("double") / n
    val m2 = col("s2").cast("double") / n
    val m3 = col("s3").cast("double") / n
    val m4 = col("s4").cast("double") / n
    val mu2 = m2 - m1 * m1
    val mu3 = m3 - lit(3.0) * m1 * m2 + lit(2.0) * m1 * m1 * m1
    val mu4 = m4 - lit(4.0) * m1 * m3 + lit(6.0) * m1 * m1 * m2 -
      lit(3.0) * m1 * m1 * m1 * m1
    val skew = mu3 / pow(mu2, 1.5)
    val kurt = mu4 / (mu2 * mu2)
    mom.select(col("n"),
      round(skew, 6).as("skewness"),
      round(kurt, 6).as("kurtosis"),
      round(n / 6 * (skew * skew +
        (kurt - 3) * (kurt - 3) / 4), 4).as("jb_stat"),
      (n / 6 * (skew * skew + (kurt - 3) * (kurt - 3) / 4) >
        lit(5.991465)).as("reject_normality"))
  }

  // ---- E-362 Gumbel extreme-value return levels ----------------------------------
  // What daily revenue maximum should be provisioned for? Gumbel fit
  // on daily block maxima of order totals by method of moments —
  // β = s·√6∕π, μ = m − γβ with Euler-Mascheroni γ = 0.5772156649
  // pinned — and the T-block return levels x_T = μ − β·ln(−ln(1−1∕T))
  // for T ∈ {30, 365}. Block maxima are exact cents; mean/sd from
  // cross-multiplied decimal moments. The parametric tail view beside
  // E-215's empirical VaR.
  def extGumbel(s: SparkSession, dir: String): DataFrame = {
    val mx = t(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(max(round(col("o_totalprice") * 100).cast("long")).as("m"))
      .select(col("m").cast("decimal(38,0)").as("m"))
    val mom = mx.agg(count(lit(1)).as("n"), sum("m").as("s1"),
        sum(col("m") * col("m")).as("s2"))
      .select(col("n"), (col("s1").cast("double") / col("n")).as("mean"),
        sqrt((col("n") * col("s2") - col("s1") * col("s1")).cast("double") /
          col("n").cast("double") / (col("n") - 1).cast("double")).as("sd"))
    val beta = col("sd") * sqrt(lit(6.0)) / lit(math.Pi)
    val mu = col("mean") - lit(0.5772156649) * beta
    def rl(tt: Double) = mu - beta * log(-log(lit(1.0) - lit(1.0 / tt)))
    mom.select(col("n").as("n_days"),
      round(mu / 100, 2).as("gumbel_mu_dollars"),
      round(beta / 100, 2).as("gumbel_beta_dollars"),
      round(rl(30) / 100, 2).as("return_level_30d"),
      round(rl(365) / 100, 2).as("return_level_365d"))
  }

  // ---- E-363 Qini uplift curve ---------------------------------------------------
  // Does activity-targeting find incremental purchasers? Users split
  // by the portable hash (E-212 assignment — an A/A split, so the
  // honest curve hovers near zero), scored by total event count,
  // ranked into score deciles (ties by user_id), and the cumulative
  // Qini statistic Y_t(k) − Y_c(k)·N_t(k)∕N_c(k) reported per decile
  // prefix — outcomes in exact purchase cents, one division per row.
  def extQini(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("score"),
        sum(when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).otherwise(0L)).as("y"))
      .select(col("user_id"),
        pmod(h60(col("user_id").cast("string")), lit(2L)).as("arm"),
        col("score"), col("y"))
      .withColumn("g",
        ntile(10).over(Window.orderBy(desc("score"), asc("user_id"))))
    val byDec = per.groupBy("g").agg(
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nt"),
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("nc"),
      sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("yt"),
      sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("yc"))
    val w = Window.orderBy("g")
    byDec
      .withColumn("cnt", sum("nt").over(w))
      .withColumn("cnc", sum("nc").over(w))
      .withColumn("cyt", sum("yt").over(w))
      .withColumn("cyc", sum("yc").over(w))
      .select(col("g").as("decile"), col("cnt").as("n_treat"),
        col("cnc").as("n_ctrl"),
        round((col("cyt").cast("double") -
          col("cyc").cast("double") * col("cnt") / col("cnc")) / 100, 2)
          .as("qini_dollars"))
      .orderBy("decile")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_jarquebera" -> (extJarquebera _),
    "ext_gumbel" -> (extGumbel _),
    "ext_qini" -> (extQini _))

  val oracleSql: Map[String, String] = Map(
    // E-361: identical exact power sums and shared double assembly.
    "ext_jarquebera" ->
      """with x as (select cast(cast(round(o_totalprice * 100) as bigint)
        |    as hugeint) x
        |  from orders),
        |mom as (select cast(count(*) as bigint) n, sum(x) s1,
        |    sum(x * x) s2, sum(x * x * x) s3, sum(x * x * x * x) s4
        |  from x),
        |st as (select n,
        |    cast(s1 as double) / n m1, cast(s2 as double) / n m2,
        |    cast(s3 as double) / n m3, cast(s4 as double) / n m4
        |  from mom),
        |ct as (select n, m2 - m1 * m1 mu2,
        |    m3 - 3.0 * m1 * m2 + 2.0 * m1 * m1 * m1 mu3,
        |    m4 - 4.0 * m1 * m3 + 6.0 * m1 * m1 * m2 -
        |      3.0 * m1 * m1 * m1 * m1 mu4
        |  from st),
        |sk as (select n, mu3 / pow(mu2, 1.5) skew, mu4 / (mu2 * mu2) kurt
        |  from ct)
        |select n, round(skew, 6) skewness, round(kurt, 6) kurtosis,
        |  round(n / 6 * (skew * skew + (kurt - 3) * (kurt - 3) / 4), 4)
        |    jb_stat,
        |  (n / 6 * (skew * skew + (kurt - 3) * (kurt - 3) / 4) > 5.991465)
        |    reject_normality
        |from sk""".stripMargin,

    // E-362: identical block maxima, MoM fit, pinned γ, return form.
    "ext_gumbel" ->
      """with mx as (select cast(max(cast(round(o_totalprice * 100)
        |      as bigint)) as hugeint) m
        |  from orders group by cast(o_orderdate as date)),
        |mom as (select cast(count(*) as bigint) n, sum(m) s1,
        |    sum(m * m) s2
        |  from mx),
        |st as (select n, cast(s1 as double) / n mean,
        |    sqrt(cast(n * s2 - s1 * s1 as double) / cast(n as double) /
        |      cast(n - 1 as double)) sd
        |  from mom),
        |fit as (select n, sd * sqrt(6.0) / pi() beta,
        |    mean - 0.5772156649 * (sd * sqrt(6.0) / pi()) mu
        |  from st)
        |select n n_days,
        |  round(mu / 100, 2) gumbel_mu_dollars,
        |  round(beta / 100, 2) gumbel_beta_dollars,
        |  round((mu - beta * ln(-ln(1.0 - 1.0 / 30))) / 100, 2)
        |    return_level_30d,
        |  round((mu - beta * ln(-ln(1.0 - 1.0 / 365))) / 100, 2)
        |    return_level_365d
        |from fit""".stripMargin,

    // E-363: identical split, decile spine, cumulative Qini form.
    "ext_qini" ->
      """with per as (select user_id,
        |    ('0x' || substr(sha256(cast(user_id as varchar)), 1, 15))::bigint
        |      % 2 arm,
        |    cast(count(*) as bigint) score,
        |    cast(sum(case when event_type = 'purchase'
        |      then cast(round(value * 100) as bigint) else 0 end)
        |      as bigint) y
        |  from events group by user_id),
        |ranked as (select arm, y,
        |    ntile(10) over (order by score desc, user_id) g
        |  from per),
        |bydec as (select g,
        |    cast(sum(case when arm = 1 then 1 else 0 end) as bigint) nt,
        |    cast(sum(case when arm = 0 then 1 else 0 end) as bigint) nc,
        |    cast(sum(case when arm = 1 then y else 0 end) as bigint) yt,
        |    cast(sum(case when arm = 0 then y else 0 end) as bigint) yc
        |  from ranked group by g),
        |cum as (select g,
        |    cast(sum(nt) over (order by g) as bigint) cnt,
        |    cast(sum(nc) over (order by g) as bigint) cnc,
        |    cast(sum(yt) over (order by g) as bigint) cyt,
        |    cast(sum(yc) over (order by g) as bigint) cyc
        |  from bydec)
        |select g decile, cnt n_treat, cnc n_ctrl,
        |  round((cast(cyt as double) -
        |    cast(cyc as double) * cnt / cnc) / 100, 2) qini_dollars
        |from cum order by decile""".stripMargin)
}
