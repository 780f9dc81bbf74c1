package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 75: decision fairness and survey
  * weighting — the 80%-rule disparate-impact audit, equalized-odds
  * TPR/FPR gaps across segments, and the Kish design effect of
  * post-stratification weights.
  */
object ExtensionQueries75 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Customer decision frame: label y (order count ≥ the global exact
    * median) and decision ŷ (balance above the global exact p75), both
    * cut on integer-exact percentiles so the flags are engine-stable.
    */
  private def decisions(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
        round(col("c_acctbal") * 100).cast("long").as("bal"))
      .join(t(s, dir, "orders").groupBy(col("o_custkey").as("k"))
        .agg(count(lit(1)).as("oc")), Seq("k"), "left")
      .select(col("k"), col("seg"), col("bal"),
        coalesce(col("oc"), lit(0L)).as("oc"))
    val cuts = c.agg(
      expr("percentile(bal, 0.75)").as("p75"),
      expr("percentile(oc, 0.5)").as("med")).limit(1)
    c.crossJoin(broadcast(cuts))
      .select(col("k"), col("seg"),
        (col("bal").cast("double") > col("p75")).as("pred"),
        (col("oc").cast("double") >= col("med")).as("label"))
  }

  // ---- E-373 disparate-impact ratio (80% rule) -----------------------------------
  // Does the premium flag select segments at materially different
  // rates? Per-segment selection rates as exact integer pairs, the
  // min∕max-rate ratio decided and REPORTED from one settled division,
  // and the four-fifths verdict by INTEGER cross-multiply
  // (5·min_num·max_den ≥ 4·max_num·min_den) so the boundary can't
  // straddle an ULP. Extreme segments pinned by (rate, name) order.
  def extDisparateimpact(s: SparkSession, dir: String): DataFrame = {
    val rates = decisions(s, dir)
      .groupBy("seg")
      .agg(sum(when(col("pred"), 1L).otherwise(0L)).as("pos"),
        count(lit(1)).as("n"))
    val lo = rates
      .orderBy((col("pos").cast("double") / col("n")).asc, col("seg").asc)
      .limit(1)
      .select(col("seg").as("min_seg"), col("pos").as("minp"),
        col("n").as("minn"))
    val hi = rates
      .orderBy((col("pos").cast("double") / col("n")).desc, col("seg").asc)
      .limit(1)
      .select(col("seg").as("max_seg"), col("pos").as("maxp"),
        col("n").as("maxn"))
    lo.crossJoin(broadcast(hi))
      .select(col("min_seg"), col("max_seg"),
        round(col("minp").cast("double") / col("minn"), 6).as("min_rate"),
        round(col("maxp").cast("double") / col("maxn"), 6).as("max_rate"),
        round(col("minp").cast("double") * col("maxn") /
          (col("maxp").cast("double") * col("minn")), 6).as("di_ratio"),
        (col("minp") * col("maxn") * 5 >= col("maxp") * col("minn") * 4)
          .as("passes_four_fifths"))
  }

  // ---- E-374 equalized-odds gaps -------------------------------------------------
  // Beyond selection rates: does the flag err differently per segment
  // GIVEN the outcome? Per-segment TPR and FPR from exact confusion
  // counts (one division each), plus the max−min gap across segments —
  // the equalized-odds audit; near-zero gaps mean the decision is
  // conditionally independent of segment.
  def extEqodds(s: SparkSession, dir: String): DataFrame = {
    val conf = decisions(s, dir)
      .groupBy("seg")
      .agg(sum(when(col("pred") && col("label"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("pred") && !col("label"), 1L).otherwise(0L)).as("fp"),
        sum(when(!col("pred") && col("label"), 1L).otherwise(0L)).as("fn"),
        sum(when(!col("pred") && !col("label"), 1L).otherwise(0L)).as("tn"))
      .select(col("seg"),
        round(col("tp").cast("double") / (col("tp") + col("fn")), 6)
          .as("tpr"),
        round(col("fp").cast("double") / (col("fp") + col("tn")), 6)
          .as("fpr"))
    val gaps = conf.agg(
      round(max("tpr") - min("tpr"), 6).as("tpr_gap"),
      round(max("fpr") - min("fpr"), 6).as("fpr_gap")).limit(1)
    conf.crossJoin(broadcast(gaps)).orderBy("seg")
  }

  // ---- E-375 Kish design effect --------------------------------------------------
  // What do post-stratification weights cost in precision? Weights
  // equalize the five segment shares (w_g = N∕(G·n_g), identical
  // within segment), so Σw and Σw² collapse to per-group closed forms;
  // the 1∕n_g terms are 1e-15-quantized before the cross-group fold.
  // deff = n·Σw²∕(Σw)², n_eff = n∕deff — the survey-practice headline
  // numbers for any reweighted metric downstream.
  def extKish(s: SparkSession, dir: String): DataFrame = {
    val g = t(s, dir, "customer")
      .groupBy(col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("ng"))
    val tot = g.agg(sum("ng").as("n"), count(lit(1)).as("gg")).limit(1)
    val terms = g.crossJoin(broadcast(tot))
      .select(col("n"), col("gg"), col("ng"),
        round(lit(1e15) / col("ng")).cast("long").as("inv"))
    terms.agg(first("n").as("n"), first("gg").as("n_groups"),
        sum("inv").as("sinv"))
      .select(col("n"), col("n_groups"),
        round(col("n").cast("double") * col("sinv").cast("double") / 1e15 /
          (col("n_groups") * col("n_groups")).cast("double"), 6).as("deff"),
        round(col("n").cast("double") /
          (col("n").cast("double") * col("sinv").cast("double") / 1e15 /
            (col("n_groups") * col("n_groups")).cast("double")), 2)
          .as("n_eff"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_disparateimpact" -> (extDisparateimpact _),
    "ext_eqodds" -> (extEqodds _),
    "ext_kish" -> (extKish _))

  private val decSql =
    """c as (select c_custkey k, c_mktsegment seg,
      |    cast(round(c_acctbal * 100) as bigint) bal,
      |    cast(coalesce(o.oc, 0) as bigint) oc
      |  from customer
      |  left join (select o_custkey ck, count(*) oc from orders
      |    group by 1) o on o.ck = c_custkey),
      |cuts as (select quantile_cont(bal, 0.75) p75,
      |    quantile_cont(oc, 0.5) med
      |  from c),
      |dcs as (select k, seg,
      |    cast(bal as double) > p75 pred,
      |    cast(oc as double) >= med lbl
      |  from c cross join cuts)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // E-373: identical exact-percentile cuts, integer 4/5 verdict.
    "ext_disparateimpact" ->
      s"""with $decSql,
        |rates as (select seg,
        |    cast(sum(case when pred then 1 else 0 end) as bigint) pos,
        |    cast(count(*) as bigint) n
        |  from dcs group by 1),
        |lo as (select seg min_seg, pos minp, n minn from rates
        |  order by cast(pos as double) / n asc, seg asc limit 1),
        |hi as (select seg max_seg, pos maxp, n maxn from rates
        |  order by cast(pos as double) / n desc, seg asc limit 1)
        |select min_seg, max_seg,
        |  round(cast(minp as double) / minn, 6) min_rate,
        |  round(cast(maxp as double) / maxn, 6) max_rate,
        |  round(cast(minp as double) * maxn /
        |    (cast(maxp as double) * minn), 6) di_ratio,
        |  (minp * maxn * 5 >= maxp * minn * 4) passes_four_fifths
        |from lo cross join hi""".stripMargin,

    // E-374: identical confusion counts and gap fold.
    "ext_eqodds" ->
      s"""with $decSql,
        |conf as (select seg,
        |    round(cast(sum(case when pred and lbl then 1 else 0 end)
        |        as double) /
        |      sum(case when lbl then 1 else 0 end), 6) tpr,
        |    round(cast(sum(case when pred and not lbl then 1 else 0 end)
        |        as double) /
        |      sum(case when not lbl then 1 else 0 end), 6) fpr
        |  from dcs group by 1),
        |gaps as (select round(max(tpr) - min(tpr), 6) tpr_gap,
        |    round(max(fpr) - min(fpr), 6) fpr_gap
        |  from conf)
        |select seg, tpr, fpr, tpr_gap, fpr_gap
        |from conf cross join gaps
        |order by seg""".stripMargin,

    // E-375: identical per-group closed forms and quantized 1/n terms.
    "ext_kish" ->
      """with g as (select c_mktsegment seg,
        |    cast(count(*) as bigint) ng
        |  from customer group by 1),
        |tot as (select cast(sum(ng) as bigint) n,
        |    cast(count(*) as bigint) gg
        |  from g),
        |terms as (select n, gg, ng,
        |    cast(round(1e15 / ng) as bigint) inv
        |  from g cross join tot),
        |agg as (select any_value(n) n, any_value(gg) n_groups,
        |    cast(sum(inv) as bigint) sinv
        |  from terms)
        |select n, n_groups,
        |  round(cast(n as double) * cast(sinv as double) / 1e15 /
        |    cast(n_groups * n_groups as double), 6) deff,
        |  round(cast(n as double) /
        |    (cast(n as double) * cast(sinv as double) / 1e15 /
        |      cast(n_groups * n_groups as double)), 2) n_eff
        |from agg""".stripMargin)
}
