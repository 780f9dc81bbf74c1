package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 46: causal inference — stratified
  * adjustment (direct standardization), difference-in-differences,
  * and a sharp regression-discontinuity estimate. Every group mean
  * comes from exact decimal cents moments; the causal contrasts are
  * settled closed forms. The observational-data companions to the
  * randomized-experiment suite (E-212, E-195, E-254, E-262..E-264).
  */
object ExtensionQueries46 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Per-customer outcome (total order cents) + treatment (BUILDING). */
  private def frame(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "orders")
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("yc"))
    t(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey").as("nk"),
        (col("c_mktsegment") === "BUILDING").as("treated"))
      .join(rev, Seq("c_custkey"), "left")
      .withColumn("yc", coalesce(col("yc"), lit(0L)).cast("decimal(38,0)"))
  }

  // ---- E-295 stratified adjustment -----------------------------------------------
  // Does the BUILDING segment spend more, adjusting for nation? The
  // naive contrast mixes nation composition into the effect; the
  // adjusted one standardizes: ATT = Σ_n w_n·(ȳ_Tn − ȳ_Cn) with w_n =
  // the stratum's share of TREATED customers. Strata needing both
  // arms only; every term an exact ratio of decimal sums, the final
  // weighted sum runs over ≤25 strata.
  def extStratadj(s: SparkSession, dir: String): DataFrame = {
    val f = frame(s, dir)
    val per = f.groupBy("nk")
      .agg(sum(when(col("treated"), 1L).otherwise(0L)).as("nt"),
        sum(when(!col("treated"), 1L).otherwise(0L)).as("nc"),
        sum(when(col("treated"), col("yc"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("st"),
        sum(when(!col("treated"), col("yc"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("sc"))
      .filter(col("nt") > 0 && col("nc") > 0)
    val overall = f.agg(
      (sum(when(col("treated"), col("yc"))
        .otherwise(lit(0).cast("decimal(38,0)"))).cast("double") /
        sum(when(col("treated"), 1L).otherwise(0L))).as("mu_t"),
      (sum(when(!col("treated"), col("yc"))
        .otherwise(lit(0).cast("decimal(38,0)"))).cast("double") /
        sum(when(!col("treated"), 1L).otherwise(0L))).as("mu_c"))
    val adj = per.agg(sum("nt").as("n_treated"),
      sum(col("nt").cast("double") *
        (col("st").cast("double") / col("nt") -
          col("sc").cast("double") / col("nc"))).as("wsum"))
    adj.crossJoin(broadcast(overall))
      .select(col("n_treated"),
        round((col("mu_t") - col("mu_c")) / 100, 2).as("naive_diff"),
        round(col("wsum") / col("n_treated") / 100, 2).as("adjusted_att"))
  }

  // ---- E-296 difference-in-differences -------------------------------------------
  // Did BUILDING's spending CHANGE differently 1995→1996? DiD =
  // (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre) over per-customer
  // yearly revenue — the parallel-trends contrast, all four cell
  // means exact-decimal ratios, one settled subtraction chain.
  def extDid(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "orders")
      .filter(year(col("o_orderdate")).isin(1995, 1996))
      .groupBy(col("o_custkey").as("c_custkey"),
        (year(col("o_orderdate")) === 1996).as("post"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long"))
        .cast("decimal(38,0)").as("yc"))
    val f = t(s, dir, "customer")
      .select(col("c_custkey"),
        (col("c_mktsegment") === "BUILDING").as("treated"))
      .join(rev, "c_custkey")
    val cells = f.groupBy("treated", "post")
      .agg(count(lit(1)).as("n"), sum("yc").as("sy"))
      .select(col("treated"), col("post"), col("n"),
        (col("sy").cast("double") / col("n")).as("mu"))
    val wide = cells.agg(
      max(when(col("treated") && col("post"), col("mu"))).as("tp"),
      max(when(col("treated") && !col("post"), col("mu"))).as("tr"),
      max(when(!col("treated") && col("post"), col("mu"))).as("cp"),
      max(when(!col("treated") && !col("post"), col("mu"))).as("cr"),
      sum("n").as("n_cells_total"))
    wide.select(col("n_cells_total"),
      round((col("tp") - col("tr")) / 100, 2).as("treated_change"),
      round((col("cp") - col("cr")) / 100, 2).as("control_change"),
      round(((col("tp") - col("tr")) - (col("cp") - col("cr"))) / 100, 2)
        .as("did"))
  }

  // ---- E-297 regression discontinuity --------------------------------------------
  // Sharp RD at the zero-balance cutoff: does crossing into negative
  // balance jump order activity? Local linear fits on each side
  // within a ±$2000 bandwidth (running variable = balance cents,
  // outcome = order count), both fits in closed form from exact
  // decimal moments; the jump is the difference of the two intercepts
  // AT the cutoff. The parallel-slopes diagnostic is reported beside
  // the estimate.
  def extRdd(s: SparkSession, dir: String): DataFrame = {
    val cnt = t(s, dir, "orders")
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(count(lit(1)).as("no"))
    val f = t(s, dir, "customer")
      .select(col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long").as("x"))
      .join(cnt, Seq("c_custkey"), "left")
      .withColumn("y", coalesce(col("no"), lit(0L)))
      .filter(abs(col("x")) <= 200000)
      .select(col("x").cast("decimal(38,0)").as("x"),
        col("y").cast("decimal(38,0)").as("y"),
        (col("x") < 0).as("below"))
    def fit(df: DataFrame, label: String) = df
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(lit(label).as("side"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("slope"),
        ((col("sy").cast("double") -
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
            col("sx").cast("double")) / col("n")).as("icept"))
    val lo = fit(f.filter(col("below")), "below")
    val hi = fit(f.filter(!col("below")), "above")
    lo.select(col("n").as("n_below"), col("slope").as("slope_below"),
        col("icept").as("icept_below"))
      .crossJoin(broadcast(hi.select(col("n").as("n_above"),
        col("slope").as("slope_above"), col("icept").as("icept_above"))))
      .select(col("n_below"), col("n_above"),
        round(col("icept_below"), 4).as("icept_below"),
        round(col("icept_above"), 4).as("icept_above"),
        round(col("icept_above") - col("icept_below"), 4).as("rd_jump"),
        round(col("slope_above") - col("slope_below"), 8).as("slope_gap"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_stratadj" -> (extStratadj _),
    "ext_did" -> (extDid _),
    "ext_rdd" -> (extRdd _))

  val oracleSql: Map[String, String] = Map(
    // E-295: identical stratum ratios and treated-share weights.
    "ext_stratadj" ->
      """with rev as (select o_custkey c_custkey,
        |    cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint)
        |      yc
        |  from orders group by 1),
        |f as (select c.c_custkey, c_nationkey nk,
        |    c_mktsegment = 'BUILDING' treated,
        |    cast(coalesce(yc, 0) as hugeint) yc
        |  from customer c left join rev using (c_custkey)),
        |per as (select nk,
        |    cast(sum(case when treated then 1 else 0 end) as bigint) nt,
        |    cast(sum(case when not treated then 1 else 0 end) as bigint) nc,
        |    sum(case when treated then yc else 0::hugeint end) st,
        |    sum(case when not treated then yc else 0::hugeint end) sc
        |  from f group by nk having sum(case when treated then 1 else 0 end)
        |    > 0 and sum(case when not treated then 1 else 0 end) > 0),
        |overall as (select
        |    cast(sum(case when treated then yc else 0::hugeint end)
        |      as double) / sum(case when treated then 1 else 0 end) mu_t,
        |    cast(sum(case when not treated then yc else 0::hugeint end)
        |      as double) / sum(case when not treated then 1 else 0 end) mu_c
        |  from f),
        |adj as (select cast(sum(nt) as bigint) n_treated,
        |    sum(cast(nt as double) * (cast(st as double) / nt -
        |      cast(sc as double) / nc)) wsum
        |  from per)
        |select n_treated,
        |  round((mu_t - mu_c) / 100, 2) naive_diff,
        |  round(wsum / n_treated / 100, 2) adjusted_att
        |from adj cross join overall""".stripMargin,

    // E-296: identical four cell means and contrast.
    "ext_did" ->
      """with rev as (select o_custkey c_custkey,
        |    year(o_orderdate) = 1996 post,
        |    cast(sum(cast(round(o_totalprice * 100) as bigint)) as hugeint)
        |      yc
        |  from orders where year(o_orderdate) in (1995, 1996)
        |  group by 1, 2),
        |f as (select c_mktsegment = 'BUILDING' treated, post, yc
        |  from customer join rev using (c_custkey)),
        |cells as (select treated, post, cast(count(*) as bigint) n,
        |    cast(sum(yc) as double) / count(*) mu
        |  from f group by treated, post),
        |wide as (select
        |    max(case when treated and post then mu end) tp,
        |    max(case when treated and not post then mu end) tr,
        |    max(case when not treated and post then mu end) cp,
        |    max(case when not treated and not post then mu end) cr,
        |    cast(sum(n) as bigint) n_cells_total
        |  from cells)
        |select n_cells_total,
        |  round((tp - tr) / 100, 2) treated_change,
        |  round((cp - cr) / 100, 2) control_change,
        |  round(((tp - tr) - (cp - cr)) / 100, 2) did
        |from wide""".stripMargin,

    // E-297: identical exact-moment local fits.
    "ext_rdd" ->
      """with cnt as (select o_custkey c_custkey,
        |    cast(count(*) as bigint) n_ord from orders group by 1),
        |f as (select cast(cast(round(c_acctbal * 100) as bigint)
        |      as hugeint) x,
        |    cast(coalesce(n_ord, 0) as hugeint) y,
        |    round(c_acctbal * 100) < 0 below
        |  from customer left join cnt using (c_custkey)
        |  where abs(cast(round(c_acctbal * 100) as bigint)) <= 200000),
        |lo as (select cast(count(*) as bigint) n, sum(x) sx, sum(y) sy,
        |    sum(x * y) sxy, sum(x * x) sxx from f where below),
        |hi as (select cast(count(*) as bigint) n, sum(x) sx, sum(y) sy,
        |    sum(x * y) sxy, sum(x * x) sxx from f where not below),
        |lf as (select n n_below,
        |    cast(n * sxy - sx * sy as double)
        |      / cast(n * sxx - sx * sx as double) slope_below,
        |    (cast(sy as double) - cast(n * sxy - sx * sy as double)
        |      / cast(n * sxx - sx * sx as double) * cast(sx as double)) / n
        |      icept_below
        |  from lo),
        |hf as (select n n_above,
        |    cast(n * sxy - sx * sy as double)
        |      / cast(n * sxx - sx * sx as double) slope_above,
        |    (cast(sy as double) - cast(n * sxy - sx * sy as double)
        |      / cast(n * sxx - sx * sx as double) * cast(sx as double)) / n
        |      icept_above
        |  from hi)
        |select n_below, n_above,
        |  round(icept_below, 4) icept_below,
        |  round(icept_above, 4) icept_above,
        |  round(icept_above - icept_below, 4) rd_jump,
        |  round(slope_above - slope_below, 8) slope_gap
        |from lf cross join hf""".stripMargin)
}
