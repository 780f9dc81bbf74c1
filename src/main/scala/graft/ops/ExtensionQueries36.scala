package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 36: experimentation guardrails —
  * sample-ratio mismatch (the assignment-bug detector every A/B
  * readout must pass first), the sequential probability ratio test
  * (always-valid peeking), and the power curve (the design view E-254's
  * single MDE number summarizes). Completes the experimentation suite
  * (split E-212, CUPED E-195, delta CI E-208, MDE E-254, BH-FDR E-234).
  */
object ExtensionQueries36 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def h60(c: Column) =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  // ---- E-262 sample-ratio mismatch -----------------------------------------------
  // Is the 50/50 hash split actually 50/50? χ² for two cells collapses
  // to (n₀−n₁)²/n — an exact rational — and the 5% verdict is decided
  // by INTEGER cross-multiplication ((n₀−n₁)²·1000 vs 3841·n), so the
  // flag can never ride a float. SRM is the first gate of any
  // experiment readout: a biased split invalidates everything after.
  def extSrm(s: SparkSession, dir: String): DataFrame = {
    val arms = t(s, dir, "events")
      .select(col("user_id")).distinct()
      .select(pmod(h60(col("user_id").cast("string")), lit(2L)).as("arm"))
    arms.agg(count(lit(1)).as("n"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"))
      .select(col("n"), col("n0"), col("n1"),
        round((col("n0") - col("n1")).cast("double") *
          (col("n0") - col("n1")) / col("n"), 4).as("chisq"),
        ((col("n0") - col("n1")) * (col("n0") - col("n1")) * 1000 >
          col("n") * 3841).as("srm_flag"))
  }

  // ---- E-263 sequential probability ratio test -----------------------------------
  // Wald's SPRT on the daily purchase rate: H₀ p=0.10 vs H₁ p=0.12,
  // α=0.05, β=0.20. The log-likelihood ratio walks
  // Σ x·ln(1.2) + (m−x)·ln(0.88/0.90) day by day (cumulative window in
  // DAY ORDER — both engines fold the identical sequence) against the
  // pinned boundaries ln(16) and ln(0.2105...)=ln(4/19). Reported: the
  // walk's end state and the first boundary crossing — the
  // "peek-as-often-as-you-like" alternative to fixed-horizon tests.
  def extSprt(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("dy"))
      .agg(count(lit(1)).as("m"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("x"))
    val w = Window.orderBy("dy").rowsBetween(Window.unboundedPreceding, 0)
    val walk = daily
      .withColumn("llr",
        sum(col("x") * log(lit(1.2)) +
          (col("m") - col("x")) * log(lit(0.88) / lit(0.90))).over(w))
      .withColumn("crossed",
        when(col("llr") >= log(lit(16.0)), lit("accept_h1"))
          .when(col("llr") <= log(lit(4.0) / lit(19.0)), lit("accept_h0")))
    val firstCross = walk.filter(col("crossed").isNotNull)
      .agg(min(struct(col("dy"), col("crossed"))).as("fc"))
      .select(col("fc.dy").cast("string").as("first_cross_day"),
        col("fc.crossed").as("decision"))
    val end = walk.agg(count(lit(1)).as("n_days"),
      round(max(struct(col("dy"), col("llr"))).getField("llr"), 6)
        .as("llr_final"))
    end.crossJoin(broadcast(firstCross))
      .select(col("n_days"), col("llr_final"), col("first_cross_day"),
        col("decision"))
  }

  // ---- E-264 power curve ---------------------------------------------------------
  // Power at effect sizes k·SE for k ∈ 1..5: power = Φ(k − 1.96) with
  // the pinned logistic Φ (E-234's erf-free closed form), SE from the
  // exact decimal revenue moments of the E-212 split. The curve view
  // behind E-254's single MDE number — where the design is strong and
  // where it is hopeless.
  def extPowercurve(s: SparkSession, dir: String): DataFrame = {
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
      .withColumn("s2",
        (col("n_users") * col("sxx") - col("sx") * col("sx")).cast("double") /
          (col("n_users").cast("double") * (col("n_users") - 1)))
      .withColumn("se", sqrt(lit(2.0) * col("s2") / col("n_arm")))
    val ks = s.range(1, 6).select(col("id").cast("double").as("k"))
    broadcast(ks).crossJoin(stats)
      .select(col("k").cast("long").as("k"), col("n_arm"),
        round(col("k") * col("se") / 100, 4).as("delta_rev"),
        round(lit(1.0) /
          (lit(1.0) + exp(lit(-1.702) * (col("k") - lit(1.96)))), 6)
          .as("power"))
      .orderBy("k")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_srm" -> (extSrm _),
    "ext_sprt" -> (extSprt _),
    "ext_powercurve" -> (extPowercurve _))

  val oracleSql: Map[String, String] = Map(
    // E-262: identical integer χ² and cross-multiplied verdict.
    "ext_srm" ->
      """with arms as (select distinct user_id,
        |    ('0x' || substr(sha256(cast(user_id as varchar)), 1, 15))::bigint
        |      % 2 arm
        |  from events),
        |c as (select cast(count(*) as bigint) n,
        |    cast(sum(case when arm = 0 then 1 else 0 end) as bigint) n0,
        |    cast(sum(case when arm = 1 then 1 else 0 end) as bigint) n1
        |  from arms)
        |select n, n0, n1,
        |  round(cast(n0 - n1 as double) * (n0 - n1) / n, 4) chisq,
        |  (n0 - n1) * (n0 - n1) * 1000 > n * 3841 srm_flag
        |from c""".stripMargin,

    // E-263: identical day-ordered cumulative fold and boundaries.
    "ext_sprt" ->
      """with daily as (select cast(ts as date) dy,
        |    cast(count(*) as bigint) m,
        |    cast(sum(case when event_type = 'purchase' then 1 else 0 end)
        |      as bigint) x
        |  from events group by 1),
        |walk as (select dy,
        |    sum(x * ln(1.2) + (m - x) * ln(0.88 / 0.90))
        |      over (order by dy rows unbounded preceding) llr
        |  from daily),
        |flagged as (select dy, llr,
        |    case when llr >= ln(16.0) then 'accept_h1'
        |      when llr <= ln(4.0 / 19.0) then 'accept_h0' end crossed
        |  from walk),
        |fc as (select strftime(min(dy), '%Y-%m-%d') first_cross_day,
        |    min_by(crossed, dy) decision
        |  from flagged where crossed is not null),
        |fin as (select cast(count(*) as bigint) n_days,
        |    round(max_by(llr, dy), 6) llr_final from flagged)
        |select n_days, llr_final, first_cross_day, decision
        |from fin cross join fc""".stripMargin,

    // E-264: identical SE and logistic Φ.
    "ext_powercurve" ->
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
        |f as (select n_arm,
        |    sqrt(2.0 * (cast(n_users * sxx - sx * sx as double) /
        |      (cast(n_users as double) * (n_users - 1))) / n_arm) se
        |  from stats)
        |select cast(k as bigint) k, n_arm,
        |  round(k * se / 100, 4) delta_rev,
        |  round(1.0 / (1.0 + exp(-1.702 * (k - 1.96))), 6) power
        |from f cross join unnest([1, 2, 3, 4, 5]) u(k)
        |order by k""".stripMargin)
}
