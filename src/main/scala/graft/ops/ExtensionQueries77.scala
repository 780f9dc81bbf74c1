package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 77: multiple-comparison control —
  * Holm's step-down FWER pass over the E-234 hypothesis frame, Dunn's
  * post-hoc pairwise test on the E-244 rank machinery, and Bartlett's
  * variance-homogeneity χ².
  */
object ExtensionQueries77 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-379 Holm step-down (FWER) -----------------------------------------------
  // The family-wise twin of E-234's FDR: same 25 per-nation z-tests
  // (exact decimal cents moments, pinned logistic Φ), but the
  // step-DOWN rule — reject ranks before the FIRST i with
  // p_(i) > α∕(m−i+1). Strictly more conservative than BH; the two
  // verdicts side by side are the textbook FWER-vs-FDR contrast.
  def extHolm(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").cast("decimal(38,0)")
          .as("v"))
    val g = c.agg(count(lit(1)).as("n"), sum("v").as("sx"),
      sum(col("v") * col("v")).as("sxx")).limit(1)
    val per = c.groupBy("c_nationkey")
      .agg(count(lit(1)).as("ni"), sum("v").as("sxi"))
    val z = per.crossJoin(broadcast(g))
      .join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nationkey"), col("n_name"))),
        "c_nationkey")
      .select(col("n_name"), col("ni"),
        ((col("sxi").cast("double") / col("ni") -
          col("sx").cast("double") / col("n")) /
          sqrt((col("n").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")) /
            (col("n").cast("double") * col("n").cast("double")) /
            col("ni"))).as("z"))
      .withColumn("p",
        lit(2.0) / (lit(1.0) + exp(lit(1.702) * abs(col("z")))))
    val m = 25L
    val ranked = z.withColumn("rk",
        row_number().over(Window.orderBy(asc("p"), asc("n_name")))
          .cast("long"))
      .withColumn("holm_thresh", lit(0.05) / (lit(m) - col("rk") + 1))
      .withColumn("passes", col("p") <= col("holm_thresh"))
    val cut = ranked.agg(
      coalesce(min(when(!col("passes"), col("rk"))), lit(m + 1))
        .as("first_fail")).limit(1)
    ranked.crossJoin(broadcast(cut))
      .select(col("n_name"), col("ni"), round(col("z"), 4).as("z"),
        round(col("p"), 6).as("p"), col("rk"),
        round(col("holm_thresh"), 6).as("holm_thresh"),
        (col("rk") < col("first_fail")).as("rejected"))
      .orderBy("rk")
  }

  // ---- E-380 Dunn post-hoc pairwise test -----------------------------------------
  // AFTER Kruskal-Wallis says "some segment differs" (E-244), Dunn
  // says WHICH pairs: z_ij = (R̄_i−R̄_j)∕√((N(N+1)∕12 − T∕(12(N−1)))
  // ·(1∕n_i+1∕n_j)) on the same value-collapsed midranks (exact
  // half-integers, order-free sums) and Σ(t³−t) tie mass. Bonferroni
  // over the 10 segment pairs: reject at p ≤ 0.005 (pinned logistic
  // Φ p-values, one settled comparison per pair).
  def extDunn(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(col("c_mktsegment").as("seg"),
        round(col("c_acctbal") * 100).cast("long").as("v"))
    val byVal = c.groupBy("v").agg(count(lit(1)).as("tv"))
    val wv = Window.orderBy("v")
    val ranks = byVal
      .withColumn("cumprev",
        coalesce(sum("tv").over(wv.rowsBetween(Window.unboundedPreceding,
          -1)), lit(0L)))
      .select(col("v"),
        (col("cumprev").cast("double") +
          (col("tv").cast("double") + 1) / 2).as("midrank"))
    val perSeg = c.join(ranks, Seq("v"))
      .groupBy("seg")
      .agg(count(lit(1)).as("ni"), sum("midrank").as("rsum"))
      .select(col("seg"), col("ni"),
        (col("rsum") / col("ni")).as("rbar"))
    val corr = byVal.agg(
        sum(col("tv") * col("tv") * col("tv") - col("tv")).as("tmass"))
      .limit(1)
      .crossJoin(c.agg(count(lit(1)).as("nn")).limit(1))
      .select(col("nn"),
        ((col("nn").cast("double") * (col("nn") + 1) / 12) -
          col("tmass").cast("double") / (lit(12.0) * (col("nn") - 1)))
          .as("s2")).limit(1)
    val pairs = perSeg.select(col("seg").as("sa"), col("ni").as("na"),
        col("rbar").as("ra"))
      .limit(5)
      .join(perSeg.select(col("seg").as("sb"), col("ni").as("nb"),
        col("rbar").as("rb")).limit(5), col("sa") < col("sb"))
    pairs.crossJoin(broadcast(corr))
      .select(col("sa"), col("sb"),
        round((col("ra") - col("rb")) /
          sqrt(col("s2") * (lit(1.0) / col("na") + lit(1.0) / col("nb"))),
          4).as("z"))
      .withColumn("p",
        round(lit(2.0) / (lit(1.0) + exp(lit(1.702) * abs(col("z")))), 6))
      .withColumn("reject_bonferroni", col("p") <= 0.005)
      .orderBy("sa", "sb")
  }

  // ---- E-381 Bartlett variance homogeneity ---------------------------------------
  // Are segment balance variances equal? Bartlett's χ² =
  // [(N−k)·ln s_p² − Σ(n_i−1)·ln s_i²] ∕ C with C = 1 +
  // (Σ1∕(n_i−1) − 1∕(N−k))∕(3(k−1)) — per-group variances from exact
  // decimal moments, the ln and 1∕(n−1) terms 1e-9-quantized before
  // their cross-group folds, verdict vs pinned χ²₄ 9.487729. The
  // normality-assuming sharp test beside E-245's robust Levene.
  def extBartlett(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(col("c_mktsegment").as("seg"),
        round(col("c_acctbal") * 100).cast("long").cast("decimal(38,0)")
          .as("v"))
    val per = c.groupBy("seg")
      .agg(count(lit(1)).as("ni"), sum("v").as("sx"),
        sum(col("v") * col("v")).as("sxx"))
      .select(col("ni"),
        ((col("ni") * col("sxx") - col("sx") * col("sx")).cast("double") /
          col("ni").cast("double") / (col("ni") - 1).cast("double"))
          .as("s2i"))
      .select(col("ni"), col("s2i"),
        round(log(col("s2i")) * lit(1e9)).cast("long").as("lnq"),
        round(lit(1e9) / (col("ni") - 1)).cast("long").as("invq"),
        round(col("s2i") * (col("ni") - 1).cast("double") / 1e4)
          .cast("long").as("ssq"))
    val agg = per.agg(count(lit(1)).as("k"), sum("ni").as("n"),
      sum(col("lnq").cast("decimal(38,0)") * (col("ni") - 1)).as("sln"),
      sum("invq").as("sinv"),
      sum(col("ssq").cast("decimal(38,0)")).as("sss"))
    val nk = (col("n") - col("k")).cast("double")
    val chi = (nk * log(col("sss").cast("double") * 1e4 / nk) -
      col("sln").cast("double") / 1e9) /
      (lit(1.0) + (col("sinv").cast("double") / 1e9 - lit(1.0) / nk) /
        (lit(3.0) * (col("k") - 1).cast("double")))
    agg.select(col("k").as("n_groups"), col("n").as("n_rows"),
      round(chi, 4).as("bartlett_chi2"),
      (chi > lit(9.487729)).as("reject_homogeneity"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_holm" -> (extHolm _),
    "ext_dunn" -> (extDunn _),
    "ext_bartlett" -> (extBartlett _))

  val oracleSql: Map[String, String] = Map(
    // E-379: identical z/p machinery, step-down rule.
    "ext_holm" ->
      """with c as (select c_nationkey,
        |    cast(cast(round(c_acctbal * 100) as bigint) as hugeint) v
        |  from customer),
        |g as (select cast(count(*) as bigint) n, sum(v) sx,
        |    sum(v * v) sxx from c),
        |per as (select c_nationkey, cast(count(*) as bigint) ni,
        |    sum(v) sxi from c group by 1),
        |z as (select n_name, ni,
        |    (cast(sxi as double) / ni - cast(sx as double) / n) /
        |      sqrt((cast(n as double) * cast(sxx as double) -
        |        cast(sx as double) * cast(sx as double)) /
        |        (cast(n as double) * cast(n as double)) / ni) z
        |  from per cross join g
        |  join nation on n_nationkey = c_nationkey),
        |p as (select n_name, ni, z,
        |    2.0 / (1.0 + exp(1.702 * abs(z))) p from z),
        |ranked as (select n_name, ni, z, p,
        |    cast(row_number() over (order by p asc, n_name asc)
        |      as bigint) rk
        |  from p),
        |th as (select n_name, ni, z, p, rk,
        |    0.05 / (25 - rk + 1) holm_thresh,
        |    p <= 0.05 / (25 - rk + 1) passes
        |  from ranked),
        |cut as (select coalesce(min(case when not passes then rk end), 26)
        |    first_fail from th)
        |select n_name, ni, round(z, 4) z, round(p, 6) p, rk,
        |  round(holm_thresh, 6) holm_thresh,
        |  (rk < first_fail) rejected
        |from th cross join cut
        |order by rk""".stripMargin,

    // E-380: identical midranks, tie mass, Bonferroni verdict.
    "ext_dunn" ->
      """with c as (select c_mktsegment seg,
        |    cast(round(c_acctbal * 100) as bigint) v
        |  from customer),
        |byval as (select v, cast(count(*) as bigint) tv
        |  from c group by 1),
        |ranks as (select v,
        |    cast(coalesce(sum(tv) over (order by v
        |      rows between unbounded preceding and 1 preceding), 0)
        |      as double) + (cast(tv as double) + 1) / 2 midrank
        |  from byval),
        |perseg as (select seg, cast(count(*) as bigint) ni,
        |    sum(midrank) / count(*) rbar
        |  from c join ranks using (v) group by 1),
        |corr as (select
        |    (select cast(count(*) as bigint) from c) nn,
        |    (select cast(sum(tv * tv * tv - tv) as bigint) from byval)
        |      tmass),
        |s2 as (select (cast(nn as double) * (nn + 1) / 12) -
        |      cast(tmass as double) / (12.0 * (nn - 1)) s2
        |  from corr),
        |pairs as (select a.seg sa, a.ni na, a.rbar ra,
        |    b.seg sb, b.ni nb, b.rbar rb
        |  from perseg a join perseg b on a.seg < b.seg),
        |zz as (select sa, sb,
        |    round((ra - rb) / sqrt(s2 * (1.0 / na + 1.0 / nb)), 4) z
        |  from pairs cross join s2)
        |select sa, sb, z,
        |  round(2.0 / (1.0 + exp(1.702 * abs(z))), 6) p,
        |  (round(2.0 / (1.0 + exp(1.702 * abs(z))), 6) <= 0.005)
        |    reject_bonferroni
        |from zz order by sa, sb""".stripMargin,

    // E-381: identical exact moments, quantized ln/inv terms, pinned
    // critical value.
    "ext_bartlett" ->
      """with c as (select c_mktsegment seg,
        |    cast(cast(round(c_acctbal * 100) as bigint) as hugeint) v
        |  from customer),
        |per0 as (select seg, cast(count(*) as bigint) ni, sum(v) sx,
        |    sum(v * v) sxx from c group by 1),
        |per as (select ni,
        |    cast(ni * sxx - sx * sx as double) / cast(ni as double) /
        |      cast(ni - 1 as double) s2i
        |  from per0),
        |q as (select ni, s2i,
        |    cast(round(ln(s2i) * 1e9) as bigint) lnq,
        |    cast(round(1e9 / (ni - 1)) as bigint) invq,
        |    cast(round(s2i * cast(ni - 1 as double) / 1e4) as bigint) ssq
        |  from per),
        |agg as (select cast(count(*) as bigint) k,
        |    cast(sum(ni) as bigint) n,
        |    sum(cast(lnq as hugeint) * (ni - 1)) sln,
        |    cast(sum(invq) as bigint) sinv,
        |    sum(cast(ssq as hugeint)) sss
        |  from q)
        |select k n_groups, n n_rows,
        |  round((cast(n - k as double) *
        |      ln(cast(sss as double) * 1e4 / cast(n - k as double)) -
        |      cast(sln as double) / 1e9) /
        |    (1.0 + (cast(sinv as double) / 1e9 -
        |      1.0 / cast(n - k as double)) /
        |      (3.0 * cast(k - 1 as double))), 4) bartlett_chi2,
        |  ((cast(n - k as double) *
        |      ln(cast(sss as double) * 1e4 / cast(n - k as double)) -
        |      cast(sln as double) / 1e9) /
        |    (1.0 + (cast(sinv as double) / 1e9 -
        |      1.0 / cast(n - k as double)) /
        |      (3.0 * cast(k - 1 as double))) > 9.487729)
        |    reject_homogeneity
        |from agg""".stripMargin)
}
