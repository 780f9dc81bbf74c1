package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 52: advanced experimentation —
  * Baron–Kenny mediation (how much of the effect flows through the
  * mediator), TOST equivalence testing (proving a change is null),
  * and the Bayesian A/B posterior with the pinned logistic Φ. All
  * regressions/moments are exact decimals; statistics settle once.
  */
object ExtensionQueries52 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def h60(c: Column) =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  // ---- E-312 mediation analysis --------------------------------------------------
  // Does BUILDING's revenue edge flow THROUGH placing more orders?
  // Baron–Kenny with X = treated, M = order count, Y = revenue cents:
  // a = slope(M ~ X), total = slope(Y ~ X), b and direct from the
  // two-regressor fit Y ~ X + M (the E-274 closed-form normal
  // equations) — indirect = a·b, and total = direct + a·b is reported
  // as the exact-decomposition cross-check.
  def extMediation(s: SparkSession, dir: String): DataFrame = {
    val agg = t(s, dir, "orders")
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(count(lit(1)).as("m"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
    val f = t(s, dir, "customer")
      .select(col("c_custkey"),
        when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L).as("x"))
      .join(agg, Seq("c_custkey"), "left")
      .select(col("x").cast("decimal(38,0)").as("x"),
        coalesce(col("m"), lit(0L)).cast("decimal(38,0)").as("m"),
        coalesce(col("y"), lit(0L)).cast("decimal(38,0)").as("y"))
    val mm = f.agg(count(lit(1)).as("n"), sum("x").as("sx"),
      sum("m").as("sm"), sum("y").as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("m")).as("sxm"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("m") * col("m")).as("smm"),
      sum(col("m") * col("y")).as("smy"))
    mm.select(col("n"),
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
          .as("cxx"),
        (col("n") * col("sxm") - col("sx") * col("sm")).cast("double")
          .as("cxm"),
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          .as("cxy"),
        (col("n") * col("smm") - col("sm") * col("sm")).cast("double")
          .as("cmm"),
        (col("n") * col("smy") - col("sm") * col("sy")).cast("double")
          .as("cmy"))
      .withColumn("a", col("cxm") / col("cxx"))
      .withColumn("total", col("cxy") / col("cxx"))
      .withColumn("det", col("cxx") * col("cmm") - col("cxm") * col("cxm"))
      .withColumn("direct",
        (col("cxy") * col("cmm") - col("cmy") * col("cxm")) / col("det"))
      .withColumn("b",
        (col("cmy") * col("cxx") - col("cxy") * col("cxm")) / col("det"))
      .select(col("n"),
        round(col("a"), 4).as("a_x_to_m"),
        round(col("b") / 100, 4).as("b_m_to_y"),
        round(col("total") / 100, 4).as("total_effect"),
        round(col("direct") / 100, 4).as("direct_effect"),
        round(col("a") * col("b") / 100, 4).as("indirect_effect"),
        round(abs(col("direct") + col("a") * col("b") - col("total")) / 100,
          6).as("decomposition_residual"))
  }

  // ---- E-313 TOST equivalence test -----------------------------------------------
  // Prove the A/A split IS null: two one-sided t's against ±δ (δ =
  // 10% of the pooled mean) — equivalence iff BOTH t's clear 1.645.
  // Moments exact decimals; the verdict compares the ROUNDED t's so
  // the flag can't ride a ULP. The "absence of evidence ≠ evidence of
  // absence" fix for E-212's plain t.
  def extTost(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "events")
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase",
        round(col("value") * 100).cast("long")).otherwise(0L))
        .cast("decimal(38,0)").as("v"))
      .select(pmod(h60(col("user_id").cast("string")), lit(2L)).as("arm"),
        col("v"))
    val m = per.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"),
      sum(when(col("arm") === 0, col("v"))
        .otherwise(lit(0).cast("decimal(38,0)"))).as("sa"),
      sum(when(col("arm") === 1, col("v"))
        .otherwise(lit(0).cast("decimal(38,0)"))).as("sb"),
      sum(when(col("arm") === 0, col("v") * col("v"))
        .otherwise(lit(0).cast("decimal(38,0)"))).as("saa"),
      sum(when(col("arm") === 1, col("v") * col("v"))
        .otherwise(lit(0).cast("decimal(38,0)"))).as("sbb"))
    val stats = m
      .withColumn("ma", col("sa").cast("double") / col("na"))
      .withColumn("mb", col("sb").cast("double") / col("nb"))
      .withColumn("va",
        (col("na") * col("saa") - col("sa") * col("sa")).cast("double") /
          (col("na").cast("double") * (col("na") - 1)))
      .withColumn("vb",
        (col("nb") * col("sbb") - col("sb") * col("sb")).cast("double") /
          (col("nb").cast("double") * (col("nb") - 1)))
      .withColumn("se", sqrt(col("va") / col("na") + col("vb") / col("nb")))
      .withColumn("diff", col("ma") - col("mb"))
      .withColumn("delta",
        lit(0.1) * (col("sa") + col("sb")).cast("double") /
          (col("na") + col("nb")))
      .withColumn("t_lower", round((col("diff") + col("delta")) / col("se"), 4))
      .withColumn("t_upper", round((col("delta") - col("diff")) / col("se"), 4))
    stats.select(col("na"), col("nb"),
      round(col("diff") / 100, 4).as("diff_rev"),
      round(col("delta") / 100, 4).as("delta_bound_rev"),
      col("t_lower"), col("t_upper"),
      (col("t_lower") > 1.645 && col("t_upper") > 1.645)
        .as("equivalent"))
  }

  // ---- E-314 Bayesian A/B posterior ----------------------------------------------
  // Conversion through the Bayesian lens: Beta(1+x, 1+n−x) posteriors
  // per arm (conversion = user purchased), posterior means/sds in
  // closed form, and P(B > A) via the normal approximation with the
  // pinned logistic Φ (E-234 discipline) — the decision-ready number
  // the frequentist p-value isn't.
  def extBayesab(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "events")
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("conv"))
      .select(pmod(h60(col("user_id").cast("string")), lit(2L)).as("arm"),
        col("conv"))
    val m = per.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"),
      sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("xa"),
      sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("xb"))
    val post = m
      .withColumn("aa", (col("xa") + 1).cast("double"))
      .withColumn("ba", (col("na") - col("xa") + 1).cast("double"))
      .withColumn("ab", (col("xb") + 1).cast("double"))
      .withColumn("bb", (col("nb") - col("xb") + 1).cast("double"))
      .withColumn("mu_a", col("aa") / (col("aa") + col("ba")))
      .withColumn("mu_b", col("ab") / (col("ab") + col("bb")))
      .withColumn("var_a",
        col("aa") * col("ba") /
          ((col("aa") + col("ba")) * (col("aa") + col("ba")) *
            (col("aa") + col("ba") + 1)))
      .withColumn("var_b",
        col("ab") * col("bb") /
          ((col("ab") + col("bb")) * (col("ab") + col("bb")) *
            (col("ab") + col("bb") + 1)))
      .withColumn("z",
        (col("mu_b") - col("mu_a")) / sqrt(col("var_a") + col("var_b")))
    post.select(col("na"), col("xa"), col("nb"), col("xb"),
      round(col("mu_a"), 6).as("post_mean_a"),
      round(col("mu_b"), 6).as("post_mean_b"),
      round(lit(1.0) / (lit(1.0) + exp(lit(-1.702) * col("z"))), 6)
        .as("p_b_beats_a"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_mediation" -> (extMediation _),
    "ext_tost" -> (extTost _),
    "ext_bayesab" -> (extBayesab _))

  val oracleSql: Map[String, String] = Map(
    // E-312: identical exact-moment normal equations and decomposition.
    "ext_mediation" ->
      """with agg as (select o_custkey c_custkey,
        |    cast(count(*) as bigint) m,
        |    cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint) y
        |  from orders group by 1),
        |f as (select
        |    cast(case when c_mktsegment = 'BUILDING' then 1 else 0 end
        |      as hugeint) x,
        |    cast(coalesce(m, 0) as hugeint) m,
        |    cast(coalesce(y, 0) as hugeint) y
        |  from customer left join agg using (c_custkey)),
        |mm as (select cast(count(*) as bigint) n, sum(x) sx, sum(m) sm,
        |    sum(y) sy, sum(x * x) sxx, sum(x * m) sxm, sum(x * y) sxy,
        |    sum(m * m) smm, sum(m * y) smy from f),
        |c as (select n,
        |    cast(n * sxx - sx * sx as double) cxx,
        |    cast(n * sxm - sx * sm as double) cxm,
        |    cast(n * sxy - sx * sy as double) cxy,
        |    cast(n * smm - sm * sm as double) cmm,
        |    cast(n * smy - sm * sy as double) cmy
        |  from mm),
        |r as (select n, cxm / cxx a, cxy / cxx total,
        |    (cxy * cmm - cmy * cxm) / (cxx * cmm - cxm * cxm) direct,
        |    (cmy * cxx - cxy * cxm) / (cxx * cmm - cxm * cxm) b
        |  from c)
        |select n, round(a, 4) a_x_to_m, round(b / 100, 4) b_m_to_y,
        |  round(total / 100, 4) total_effect,
        |  round(direct / 100, 4) direct_effect,
        |  round(a * b / 100, 4) indirect_effect,
        |  round(abs(direct + a * b - total) / 100, 6) decomposition_residual
        |from r""".stripMargin,

    // E-313: identical moments, δ bound, and rounded-t verdict.
    "ext_tost" ->
      """with per as (select
        |    ('0x' || substr(sha256(cast(user_id as varchar)), 1, 15))::bigint
        |      % 2 arm,
        |    cast(sum(case when event_type = 'purchase'
        |      then cast(round(value * 100) as bigint) else 0 end)
        |      as hugeint) v
        |  from events group by user_id),
        |m as (select
        |    cast(sum(case when arm = 0 then 1 else 0 end) as bigint) na,
        |    cast(sum(case when arm = 1 then 1 else 0 end) as bigint) nb,
        |    sum(case when arm = 0 then v else 0::hugeint end) sa,
        |    sum(case when arm = 1 then v else 0::hugeint end) sb,
        |    sum(case when arm = 0 then v * v else 0::hugeint end) saa,
        |    sum(case when arm = 1 then v * v else 0::hugeint end) sbb
        |  from per),
        |st as (select na, nb,
        |    cast(sa as double) / na - cast(sb as double) / nb diff,
        |    0.1 * cast(sa + sb as double) / (na + nb) delta,
        |    sqrt((cast(na * saa - sa * sa as double) /
        |        (cast(na as double) * (na - 1))) / na +
        |      (cast(nb * sbb - sb * sb as double) /
        |        (cast(nb as double) * (nb - 1))) / nb) se
        |  from m),
        |tt as (select na, nb, diff, delta,
        |    round((diff + delta) / se, 4) t_lower,
        |    round((delta - diff) / se, 4) t_upper
        |  from st)
        |select na, nb, round(diff / 100, 4) diff_rev,
        |  round(delta / 100, 4) delta_bound_rev, t_lower, t_upper,
        |  t_lower > 1.645 and t_upper > 1.645 equivalent
        |from tt""".stripMargin,

    // E-314: identical Beta posterior closed forms and logistic Φ.
    "ext_bayesab" ->
      """with per as (select
        |    ('0x' || substr(sha256(cast(user_id as varchar)), 1, 15))::bigint
        |      % 2 arm,
        |    max(case when event_type = 'purchase' then 1 else 0 end) conv
        |  from events group by user_id),
        |m as (select
        |    cast(sum(case when arm = 0 then 1 else 0 end) as bigint) na,
        |    cast(sum(case when arm = 1 then 1 else 0 end) as bigint) nb,
        |    cast(sum(case when arm = 0 then conv else 0 end) as bigint) xa,
        |    cast(sum(case when arm = 1 then conv else 0 end) as bigint) xb
        |  from per),
        |p as (select na, nb, xa, xb,
        |    cast(xa + 1 as double) aa, cast(na - xa + 1 as double) ba,
        |    cast(xb + 1 as double) ab, cast(nb - xb + 1 as double) bb
        |  from m),
        |z0 as (select na, nb, xa, xb,
        |    aa / (aa + ba) mu_a, ab / (ab + bb) mu_b,
        |    (ab / (ab + bb) - aa / (aa + ba)) /
        |      sqrt(aa * ba / ((aa + ba) * (aa + ba) * (aa + ba + 1))
        |        + ab * bb / ((ab + bb) * (ab + bb) * (ab + bb + 1))) z
        |  from p)
        |select na, xa, nb, xb,
        |  round(mu_a, 6) post_mean_a, round(mu_b, 6) post_mean_b,
        |  round(1.0 / (1.0 + exp(-1.702 * z)), 6) p_b_beats_a
        |from z0""".stripMargin)
}
