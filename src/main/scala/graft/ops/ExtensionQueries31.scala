package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 31: k-group hypothesis tests —
  * one-way ANOVA, Kruskal–Wallis (tie-corrected), Brown–Forsythe
  * Levene, and Cohen's d / Hedges' g effect sizes. Completes the
  * inference family (two-group: z E-79, Welch t E-111, Mann–Whitney
  * E-100; trend: Mann–Kendall E-190; multiplicity: BH-FDR E-234) with
  * the k-group layer. Every sum of squares comes from exact
  * decimal(38,0)/HUGEINT moments (cents² overflows bigint at scale);
  * the F/H/W statistics are single settled closed forms.
  */
object ExtensionQueries31 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Order totals in exact cents, grouped by priority (5 groups). */
  private def cents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(col("o_orderpriority").as("g"),
      round(col("o_totalprice") * 100).cast("long").as("x"))

  // ---- E-243 one-way ANOVA -------------------------------------------------------
  // Does mean order value differ across the 5 priorities? SST and SSB
  // decompose from exact decimal Σx, Σx² (SSB = Σᵢ Sᵢ²/nᵢ − S²/N,
  // SSW = SST − SSB); F = (SSB/(k−1))/(SSW/(N−k)). The per-group
  // Sᵢ²/nᵢ terms are the only doubles before the final form.
  def extAnova(s: SparkSession, dir: String): DataFrame = {
    val d = cents(s, dir).withColumn("xd", col("x").cast("decimal(38,0)"))
    val per = d.groupBy("g").agg(count(lit(1)).as("ni"), sum("xd").as("si"))
    val tot = d.agg(count(lit(1)).as("n"), sum("xd").as("st"),
      sum(col("xd") * col("xd")).as("sxx"))
    val between = per.agg(count(lit(1)).as("k"),
      sum(col("si").cast("double") * col("si").cast("double") / col("ni"))
        .as("sum_si2_ni"))
    between.crossJoin(broadcast(tot))
      .select(col("k"), col("n"),
        (col("sum_si2_ni") -
          col("st").cast("double") * col("st").cast("double") / col("n"))
          .as("ssb"),
        (col("sxx").cast("double") -
          col("st").cast("double") * col("st").cast("double") / col("n"))
          .as("sst"))
      // raw SS are ~1e19 cents² with ~1e4 cross-engine summation-order
      // noise after catastrophic cancellation — NOT reportable; the
      // RATIOS (F, η²) carry ~1e-11 relative error and round safely.
      .select(col("k"), col("n"),
        (col("k") - 1).as("df1"), (col("n") - col("k")).as("df2"),
        round(col("ssb") / col("sst"), 6).as("eta_sq"),
        round((col("ssb") / (col("k") - 1)) /
          ((col("sst") - col("ssb")) / (col("n") - col("k"))), 4).as("f"))
  }

  // ---- E-244 Kruskal–Wallis ------------------------------------------------------
  // The rank-based k-group test (no normality assumption): average
  // ranks come from the VALUE-COLLAPSED frame (per distinct cents
  // value: rows below + (ties+1)/2 — a window over distinct values,
  // never the fact table), group rank sums by one keyed join, then
  // H = 12/(N(N+1))·ΣRᵢ²/nᵢ − 3(N+1) with the Σ(t³−t) tie correction.
  // Average ranks are half-integers (exact in doubles); R_i sums stay
  // below 2^52 half-units so the fold is order-independent.
  def extKruskal(s: SparkSession, dir: String): DataFrame = {
    val d = cents(s, dir)
    val vals = d.groupBy("x").agg(count(lit(1)).as("tv"))
      .withColumn("below",
        coalesce(sum("tv").over(
          Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("avg_rank",
        col("below").cast("double") + (col("tv") + 1).cast("double") / 2)
    val gv = d.groupBy("g", "x").agg(count(lit(1)).as("c"))
    val rg = gv.join(vals.select("x", "avg_rank"), "x")
      .groupBy("g").agg(count(lit(1)).as("nvals"),
        sum("c").as("ni"), sum(col("c") * col("avg_rank")).as("ri"))
    val ties = vals.agg(
      sum(col("tv").cast("decimal(38,0)") * col("tv") * col("tv") - col("tv"))
        .as("tsum"))
    val tot = d.agg(count(lit(1)).as("n"))
    val hRaw = rg.crossJoin(broadcast(tot))
      .agg(max("n").as("n"), count(lit(1)).as("k"),
        sum(col("ri") * col("ri") / col("ni")).as("sum_ri2_ni"))
      .select(col("n"), col("k"),
        (lit(12.0) / (col("n").cast("double") * (col("n") + 1)) *
          col("sum_ri2_ni") - lit(3) * (col("n") + 1)).as("h"))
    hRaw.crossJoin(broadcast(ties))
      .select(col("n"), col("k"), round(col("h"), 4).as("h"),
        round(col("h") / (lit(1.0) - col("tsum").cast("double") /
          (col("n").cast("double") * col("n") * col("n") - col("n"))), 4)
          .as("h_tie_corrected"))
  }

  // ---- E-245 Brown–Forsythe Levene test ------------------------------------------
  // Variance homogeneity (ANOVA's precondition): deviations from the
  // GROUP MEDIAN (the robust Brown–Forsythe variant), kept integer in
  // half-cent units (2x − 2·median is exact — interpolated medians of
  // ints are half-integers), so Σz and Σz² are exact decimals and
  // W = ((N−k)/(k−1)) · Σnⱼ(Z̄ⱼ−Z̄)² / ΣΣ(z−Z̄ⱼ)² settles once.
  def extLevene(s: SparkSession, dir: String): DataFrame = {
    val d = cents(s, dir)
    val med = d.groupBy("g")
      .agg((expr("percentile(x, 0.5)") * 2).cast("long").as("m2"))
    val z = d.join(med, "g")
      .select(col("g"),
        abs(col("x") * 2 - col("m2")).cast("decimal(38,0)").as("z2"))
    val per = z.groupBy("g").agg(count(lit(1)).as("nj"),
      sum("z2").as("szj"), sum(col("z2") * col("z2")).as("szzj"))
    // Within-group SS from exact decimals: Σz² − (Σz)²/n, in half-cent²
    val tot = per.agg(count(lit(1)).as("k"), sum("nj").as("n"),
      sum("szj").as("sz"))
    per.crossJoin(broadcast(tot))
      .agg(max("k").as("k"), max("n").as("n"),
        sum(col("szzj").cast("double") -
          col("szj").cast("double") * col("szj").cast("double") / col("nj"))
          .as("ssw"),
        sum(col("nj") * (col("szj").cast("double") / col("nj") -
          col("sz").cast("double") / col("n")) *
          (col("szj").cast("double") / col("nj") -
            col("sz").cast("double") / col("n"))).as("ssb"))
      .select(col("k"), col("n"),
        round((col("n") - col("k")).cast("double") / (col("k") - 1) *
          col("ssb") / col("ssw"), 4).as("w"))
  }

  // ---- E-246 Cohen's d / Hedges' g effect sizes ----------------------------------
  // HOW different are the priority groups, not just whether: pairwise
  // standardized mean differences from exact decimal moments —
  // pooled s² = ((nₐ−1)sₐ² + (n_b−1)s_b²)/(nₐ+n_b−2), d = Δμ/s_pooled,
  // Hedges' small-sample correction g = d·(1 − 3/(4(nₐ+n_b)−9)).
  // 10 pairs from the 5-row per-group moment table.
  def extCohend(s: SparkSession, dir: String): DataFrame = {
    val per = cents(s, dir)
      .withColumn("xd", col("x").cast("decimal(38,0)"))
      .groupBy("g").agg(count(lit(1)).as("n"), sum("xd").as("sx"),
        sum(col("xd") * col("xd")).as("sxx"))
      .select(col("g"), col("n"),
        (col("sx").cast("double") / col("n")).as("mu"),
        ((col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double") / col("n")) /
          (col("n") - 1)).as("s2"))
      .limit(16) // g = order priority: 5 values; structural cap for the pair join
    val a = per.select(col("g").as("g_a"), col("n").as("n_a"),
      col("mu").as("mu_a"), col("s2").as("s2_a"))
    val b = per.select(col("g").as("g_b"), col("n").as("n_b"),
      col("mu").as("mu_b"), col("s2").as("s2_b"))
    a.join(b, col("g_a") < col("g_b"))
      .withColumn("sp", sqrt(((col("n_a") - 1) * col("s2_a") +
        (col("n_b") - 1) * col("s2_b")) / (col("n_a") + col("n_b") - 2)))
      .withColumn("d", (col("mu_a") - col("mu_b")) / col("sp"))
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"),
        round(col("d"), 6).as("cohen_d"),
        round(col("d") * (lit(1.0) -
          lit(3.0) / (lit(4) * (col("n_a") + col("n_b")) - 9)), 6).as("hedges_g"))
      .orderBy("g_a", "g_b")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_anova" -> (extAnova _),
    "ext_kruskal" -> (extKruskal _),
    "ext_levene" -> (extLevene _),
    "ext_cohend" -> (extCohend _))

  private val centsSql =
    """d as (select o_orderpriority g,
      |    cast(round(o_totalprice * 100) as bigint) x from orders)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // E-243: identical decimal moment decomposition.
    "ext_anova" ->
      s"""with $centsSql,
        |per as (select g, cast(count(*) as bigint) ni,
        |    sum(cast(x as hugeint)) si from d group by g),
        |tot as (select cast(count(*) as bigint) n,
        |    sum(cast(x as hugeint)) st,
        |    sum(cast(x as hugeint) * cast(x as hugeint)) sxx from d),
        |btw as (select cast(count(*) as bigint) k,
        |    sum(cast(si as double) * cast(si as double) / ni) sum_si2_ni
        |  from per),
        |forms as (select k, n,
        |    sum_si2_ni - cast(st as double) * cast(st as double) / n ssb,
        |    cast(sxx as double) - cast(st as double) * cast(st as double)
        |      / n sst
        |  from btw cross join tot)
        |select k, n, k - 1 df1, n - k df2,
        |  round(ssb / sst, 6) eta_sq,
        |  round((ssb / (k - 1)) / ((sst - ssb) / (n - k)), 4) f
        |from forms""".stripMargin,

    // E-244: identical value-collapsed average ranks and tie term.
    "ext_kruskal" ->
      s"""with $centsSql,
        |vals as (select x, cast(count(*) as bigint) tv from d group by x),
        |vr as (select x, tv,
        |    coalesce(sum(tv) over (order by x
        |      rows between unbounded preceding and 1 preceding), 0) below
        |  from vals),
        |ar as (select x, tv,
        |    cast(below as double) + cast(tv + 1 as double) / 2 avg_rank
        |  from vr),
        |gv as (select g, x, cast(count(*) as bigint) c
        |  from d group by g, x),
        |rg as (select g, cast(sum(c) as bigint) ni,
        |    sum(c * avg_rank) ri from gv join ar using (x) group by g),
        |ties as (select sum(cast(tv as hugeint) * tv * tv - tv) tsum
        |  from vals),
        |tot as (select cast(count(*) as bigint) n from d),
        |h0 as (select n, cast(count(*) as bigint) k,
        |    12.0 / (cast(n as double) * (n + 1)) * sum(ri * ri / ni)
        |      - 3 * (n + 1) h
        |  from rg cross join tot group by n)
        |select n, k, round(h, 4) h,
        |  round(h / (1.0 - cast(tsum as double) /
        |    (cast(n as double) * n * n - n)), 4) h_tie_corrected
        |from h0 cross join ties""".stripMargin,

    // E-245: identical half-cent integer deviations from the group
    // median (quantile_cont of ints is a half-integer on both engines).
    "ext_levene" ->
      s"""with $centsSql,
        |med as (select g, cast(quantile_cont(x, 0.5) * 2 as bigint) m2
        |  from d group by g),
        |z as (select d.g, cast(abs(x * 2 - m2) as hugeint) z2
        |  from d join med on med.g = d.g),
        |per as (select g, cast(count(*) as bigint) nj, sum(z2) szj,
        |    sum(z2 * z2) szzj from z group by g),
        |tot as (select cast(count(*) as bigint) k,
        |    cast(sum(nj) as bigint) n, sum(szj) sz from per),
        |agg as (select max(k) k, max(n) n,
        |    sum(cast(szzj as double) - cast(szj as double)
        |      * cast(szj as double) / nj) ssw,
        |    sum(nj * (cast(szj as double) / nj - cast(sz as double) / n)
        |      * (cast(szj as double) / nj - cast(sz as double) / n)) ssb
        |  from per cross join tot)
        |select k, n,
        |  round(cast(n - k as double) / (k - 1) * ssb / ssw, 4) w
        |from agg""".stripMargin,

    // E-246: identical pooled-s closed form over the 10 pairs.
    "ext_cohend" ->
      s"""with $centsSql,
        |per as (select g, cast(count(*) as bigint) n,
        |    cast(sum(cast(x as hugeint)) as double) / count(*) mu,
        |    (cast(sum(cast(x as hugeint) * cast(x as hugeint)) as double)
        |      - cast(sum(cast(x as hugeint)) as double)
        |        * cast(sum(cast(x as hugeint)) as double) / count(*))
        |      / (count(*) - 1) s2
        |  from d group by g),
        |pairs as (select a.g g_a, b.g g_b, a.n n_a, b.n n_b,
        |    (a.mu - b.mu) / sqrt(((a.n - 1) * a.s2 + (b.n - 1) * b.s2)
        |      / (a.n + b.n - 2)) d
        |  from per a join per b on a.g < b.g)
        |select g_a, g_b, n_a, n_b, round(d, 6) cohen_d,
        |  round(d * (1.0 - 3.0 / (4 * (n_a + n_b) - 9)), 6) hedges_g
        |from pairs order by g_a, g_b""".stripMargin)
}
