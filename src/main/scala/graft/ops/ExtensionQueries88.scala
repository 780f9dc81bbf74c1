package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 88: stratified categorical
  * inference — the Cochran-Armitage trend test across ordered balance
  * quartiles, the Mantel-Haenszel pooled odds ratio with the CMH χ²
  * across region strata, and Mood's median test across segments.
  */
object ExtensionQueries88 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Customer frame: balance cents, order count, active flag (orders ≥
    * the global exact median — the E-373 outcome), segment, nation.
    */
  private def custFrame(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
        col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("bal"))
      .join(t(s, dir, "orders").groupBy(col("o_custkey").as("k"))
        .agg(count(lit(1)).as("oc")), Seq("k"), "left")
      .select(col("k"), col("seg"), col("c_nationkey"), col("bal"),
        coalesce(col("oc"), lit(0L)).as("oc"))
    val med = c.agg(expr("percentile(oc, 0.5)").as("m")).limit(1)
    c.crossJoin(broadcast(med))
      .select(col("k"), col("seg"), col("c_nationkey"), col("bal"),
        (col("oc").cast("double") >= col("m")).as("active"))
  }

  // ---- E-408 Cochran-Armitage trend test -----------------------------------------
  // Does activity RISE monotonically with balance? Quartile groups
  // (ntile over (bal, key)), scores w = 1..4, and the CA statistic
  // z² = N·(N·Σwx − X·Σwn)² ∕ (X·(N−X)·(N·Σw²n − (Σwn)²)) — every
  // moment an exact integer, one settled division, χ²₁ verdict at the
  // pinned 3.841459. The ORDERED alternative a plain χ² ignores.
  def extCochranarmitage(s: SparkSession, dir: String): DataFrame = {
    val g = custFrame(s, dir)
      .withColumn("grp",
        ntile(4).over(Window.orderBy("bal", "k")).cast("long"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        sum(when(col("active"), 1L).otherwise(0L)).as("x"))
    val mom = g.agg(sum("n").as("nn"), sum("x").as("xx"),
      sum(col("grp") * col("x")).as("swx"),
      sum(col("grp") * col("n")).as("swn"),
      sum(col("grp") * col("grp") * col("n")).as("sw2n"))
    val num = (col("nn") * col("swx") - col("xx") * col("swn"))
      .cast("decimal(38,0)")
    val den = col("xx").cast("decimal(38,0)") * (col("nn") - col("xx")) *
      (col("nn") * col("sw2n") - col("swn") * col("swn"))
    mom.select(col("nn").as("n_customers"), col("xx").as("n_active"),
      round(col("nn").cast("double") * num.cast("double") *
        num.cast("double") / den.cast("double"), 4).as("ca_chi2"),
      (col("nn").cast("double") * num.cast("double") *
        num.cast("double") / den.cast("double") > lit(3.841459))
        .as("reject_no_trend"))
  }

  // ---- E-409 Mantel-Haenszel pooled odds ratio -----------------------------------
  // Does the BUILDING-segment → high-balance association hold WITHIN
  // region strata (confounding-adjusted)? Per-region 2×2 cells (all
  // integers), OR_MH = Σ(a·d∕n)∕Σ(b·c∕n) and the CMH χ² =
  // (Σa − ΣE)²∕ΣV with hypergeometric E∕V — per-stratum terms
  // 1e-9-quantized before the cross-strata folds, verdict at pinned
  // 3.841459.
  def extMantelhaenszel(s: SparkSession, dir: String): DataFrame = {
    val c = custFrame(s, dir)
    val medb = c.agg(expr("percentile(bal, 0.5)").as("mb")).limit(1)
    val cells = c.crossJoin(broadcast(medb))
      .join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nationkey"), col("n_regionkey"))),
        Seq("c_nationkey"))
      .groupBy(col("n_regionkey").as("stratum"))
      .agg(
        sum(when(col("seg") === "BUILDING" &&
          col("bal").cast("double") > col("mb"), 1L).otherwise(0L))
          .as("a"),
        sum(when(col("seg") === "BUILDING" &&
          !(col("bal").cast("double") > col("mb")), 1L).otherwise(0L))
          .as("b"),
        sum(when(col("seg") =!= "BUILDING" &&
          col("bal").cast("double") > col("mb"), 1L).otherwise(0L))
          .as("cc"),
        sum(when(col("seg") =!= "BUILDING" &&
          !(col("bal").cast("double") > col("mb")), 1L).otherwise(0L))
          .as("d"))
    val terms = cells
      .withColumn("n", col("a") + col("b") + col("cc") + col("d"))
      .select(col("a"),
        round(col("a").cast("double") * col("d") / col("n") * 1e9)
          .cast("long").as("adq"),
        round(col("b").cast("double") * col("cc") / col("n") * 1e9)
          .cast("long").as("bcq"),
        round((col("a") + col("b")).cast("double") *
          (col("a") + col("cc")) / col("n") * 1e9).cast("long").as("eq"),
        round((col("a") + col("b")).cast("double") * (col("cc") + col("d")) *
          (col("a") + col("cc")) * (col("b") + col("d")) /
          (col("n").cast("double") * col("n") * (col("n") - 1)) * 1e9)
          .cast("long").as("vq"))
    terms.agg(count(lit(1)).as("n_strata"),
        sum("a").as("sa"), sum("adq").as("sad"), sum("bcq").as("sbc"),
        sum("eq").as("se"), sum("vq").as("sv"))
      .select(col("n_strata"),
        round(col("sad").cast("double") / col("sbc"), 4).as("or_mh"),
        round((col("sa").cast("double") - col("se").cast("double") / 1e9) *
          (col("sa").cast("double") - col("se").cast("double") / 1e9) /
          (col("sv").cast("double") / 1e9), 4).as("cmh_chi2"),
        ((col("sa").cast("double") - col("se").cast("double") / 1e9) *
          (col("sa").cast("double") - col("se").cast("double") / 1e9) /
          (col("sv").cast("double") / 1e9) > lit(3.841459))
          .as("reject_no_association"))
  }

  // ---- E-410 Mood's median test --------------------------------------------------
  // Do the five segments share a median balance? Counts above the
  // GRAND exact median per segment vs the expectation, χ² =
  // Σ(obs−exp)²∕exp over the 2×5 table with 1e-9-quantized terms,
  // verdict at the pinned χ²₄ 9.487729 — the quick-and-robust
  // location screen beside Kruskal-Wallis (E-244).
  def extMoodmedian(s: SparkSession, dir: String): DataFrame = {
    val c = custFrame(s, dir)
    val medb = c.agg(expr("percentile(bal, 0.5)").as("mb")).limit(1)
    val per = c.crossJoin(broadcast(medb))
      .groupBy("seg")
      .agg(count(lit(1)).as("n"),
        sum(when(col("bal").cast("double") > col("mb"), 1L).otherwise(0L))
          .as("ab"))
    val tot = per.agg(sum("n").as("nn"), sum("ab").as("aa")).limit(1)
    val terms = per.crossJoin(broadcast(tot))
      .select(col("seg"), col("n"), col("ab"),
        round((col("ab").cast("double") -
          col("n").cast("double") * col("aa") / col("nn")) *
          (col("ab").cast("double") -
            col("n").cast("double") * col("aa") / col("nn")) /
          (col("n").cast("double") * col("aa") / col("nn")) * 1e9)
          .cast("long").as("t1q"),
        round(((col("n") - col("ab")).cast("double") -
          col("n").cast("double") * (col("nn") - col("aa")) / col("nn")) *
          ((col("n") - col("ab")).cast("double") -
            col("n").cast("double") * (col("nn") - col("aa")) / col("nn")) /
          (col("n").cast("double") * (col("nn") - col("aa")) / col("nn")) *
          1e9).cast("long").as("t2q"))
    terms.agg(count(lit(1)).as("n_groups"),
        sum(col("t1q") + col("t2q")).as("sq"))
      .select(col("n_groups"),
        round(col("sq").cast("double") / 1e9, 4).as("mood_chi2"),
        (col("sq").cast("double") / 1e9 > lit(9.487729))
          .as("reject_equal_medians"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_cochranarmitage" -> (extCochranarmitage _),
    "ext_mantelhaenszel" -> (extMantelhaenszel _),
    "ext_moodmedian" -> (extMoodmedian _))

  private val custSql =
    """c0 as (select c_custkey k, c_mktsegment seg, c_nationkey,
      |    cast(round(c_acctbal * 100) as bigint) bal,
      |    cast(coalesce(o.oc, 0) as bigint) oc
      |  from customer
      |  left join (select o_custkey ck, count(*) oc from orders
      |    group by 1) o on o.ck = c_custkey),
      |med as (select quantile_cont(oc, 0.5) m from c0),
      |c as (select k, seg, c_nationkey, bal,
      |    cast(oc as double) >= m active
      |  from c0 cross join med)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // E-408: identical quartiles, integer moments, settled z².
    "ext_cochranarmitage" ->
      s"""with $custSql,
        |g as (select grp, cast(count(*) as bigint) n,
        |    cast(sum(case when active then 1 else 0 end) as bigint) x
        |  from (select active,
        |      cast(ntile(4) over (order by bal, k) as bigint) grp
        |    from c)
        |  group by 1),
        |mom as (select cast(sum(n) as bigint) nn,
        |    cast(sum(x) as bigint) xx,
        |    cast(sum(grp * x) as bigint) swx,
        |    cast(sum(grp * n) as bigint) swn,
        |    cast(sum(grp * grp * n) as bigint) sw2n
        |  from g)
        |select nn n_customers, xx n_active,
        |  round(cast(nn as double) *
        |    cast(cast(nn as hugeint) * swx - cast(xx as hugeint) * swn
        |      as double) *
        |    cast(cast(nn as hugeint) * swx - cast(xx as hugeint) * swn
        |      as double) /
        |    cast(cast(xx as hugeint) * (nn - xx) *
        |      (cast(nn as hugeint) * sw2n - cast(swn as hugeint) * swn)
        |      as double), 4) ca_chi2,
        |  (cast(nn as double) *
        |    cast(cast(nn as hugeint) * swx - cast(xx as hugeint) * swn
        |      as double) *
        |    cast(cast(nn as hugeint) * swx - cast(xx as hugeint) * swn
        |      as double) /
        |    cast(cast(xx as hugeint) * (nn - xx) *
        |      (cast(nn as hugeint) * sw2n - cast(swn as hugeint) * swn)
        |      as double) > 3.841459) reject_no_trend
        |from mom""".stripMargin,

    // E-409: identical strata cells, quantized MH/CMH terms.
    "ext_mantelhaenszel" ->
      s"""with $custSql,
        |medb as (select quantile_cont(bal, 0.5) mb from c),
        |cells as (select n_regionkey stratum,
        |    cast(sum(case when seg = 'BUILDING' and
        |      cast(bal as double) > mb then 1 else 0 end) as bigint) a,
        |    cast(sum(case when seg = 'BUILDING' and not
        |      (cast(bal as double) > mb) then 1 else 0 end) as bigint) b,
        |    cast(sum(case when seg <> 'BUILDING' and
        |      cast(bal as double) > mb then 1 else 0 end) as bigint) cc,
        |    cast(sum(case when seg <> 'BUILDING' and not
        |      (cast(bal as double) > mb) then 1 else 0 end) as bigint) d
        |  from c cross join medb
        |  join nation on n_nationkey = c_nationkey
        |  group by 1),
        |terms as (select a, a + b + cc + d n,
        |    cast(round(cast(a as double) * d / (a + b + cc + d) * 1e9)
        |      as bigint) adq,
        |    cast(round(cast(b as double) * cc / (a + b + cc + d) * 1e9)
        |      as bigint) bcq,
        |    cast(round(cast(a + b as double) * (a + cc) /
        |      (a + b + cc + d) * 1e9) as bigint) eq,
        |    cast(round(cast(a + b as double) * (cc + d) * (a + cc) *
        |      (b + d) / (cast(a + b + cc + d as double) *
        |        (a + b + cc + d) * (a + b + cc + d - 1)) * 1e9)
        |      as bigint) vq
        |  from cells)
        |select cast(count(*) as bigint) n_strata,
        |  round(cast(sum(adq) as double) / sum(bcq), 4) or_mh,
        |  round((cast(sum(a) as double) - cast(sum(eq) as double) / 1e9) *
        |    (cast(sum(a) as double) - cast(sum(eq) as double) / 1e9) /
        |    (cast(sum(vq) as double) / 1e9), 4) cmh_chi2,
        |  ((cast(sum(a) as double) - cast(sum(eq) as double) / 1e9) *
        |    (cast(sum(a) as double) - cast(sum(eq) as double) / 1e9) /
        |    (cast(sum(vq) as double) / 1e9) > 3.841459)
        |    reject_no_association
        |from terms""".stripMargin,

    // E-410: identical grand median, 2×5 cells, quantized χ² terms.
    "ext_moodmedian" ->
      s"""with $custSql,
        |medb as (select quantile_cont(bal, 0.5) mb from c),
        |per as (select seg, cast(count(*) as bigint) n,
        |    cast(sum(case when cast(bal as double) > mb then 1 else 0
        |      end) as bigint) ab
        |  from c cross join medb group by 1),
        |tot as (select cast(sum(n) as bigint) nn,
        |    cast(sum(ab) as bigint) aa from per),
        |terms as (select
        |    cast(round((cast(ab as double) -
        |      cast(n as double) * aa / nn) *
        |      (cast(ab as double) - cast(n as double) * aa / nn) /
        |      (cast(n as double) * aa / nn) * 1e9) as bigint) t1q,
        |    cast(round((cast(n - ab as double) -
        |      cast(n as double) * (nn - aa) / nn) *
        |      (cast(n - ab as double) -
        |        cast(n as double) * (nn - aa) / nn) /
        |      (cast(n as double) * (nn - aa) / nn) * 1e9) as bigint) t2q
        |  from per cross join tot)
        |select cast(count(*) as bigint) n_groups,
        |  round(cast(sum(t1q + t2q) as double) / 1e9, 4) mood_chi2,
        |  (cast(sum(t1q + t2q) as double) / 1e9 > 9.487729)
        |    reject_equal_medians
        |from terms""".stripMargin)
}
