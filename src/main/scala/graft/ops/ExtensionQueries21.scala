package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 21: graph structure, classifier
  * evaluation, and economics — degree assortativity, binary confusion
  * with MCC, Brier decomposition of a backtested forecaster, log-log
  * price elasticity, and simplified silhouette.
  */
object ExtensionQueries21 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-199 degree assortativity ------------------------------------------------
  // Do high-degree suppliers connect to high-degree parts? Pearson
  // correlation of endpoint degrees over the distinct supplier–part
  // edge list — the one-scalar mixing diagnostic of the bipartite graph
  // ext_cocite projects. Two keyed degree aggregates + two equi joins +
  // the corr() built-in both engines share.
  def extAssort(s: SparkSession, dir: String): DataFrame = {
    val edges = t(s, dir, "lineitem")
      .select(col("l_suppkey").as("sk"), col("l_partkey").as("pk")).distinct()
    val degS = edges.groupBy("sk").agg(count(lit(1)).as("deg_s"))
    val degP = edges.groupBy("pk").agg(count(lit(1)).as("deg_p"))
    edges.join(degS, "sk").join(degP, "pk")
      .agg(count(lit(1)).as("n_edges"),
        round(avg(col("deg_s").cast("double")), 4).as("avg_deg_s"),
        round(avg(col("deg_p").cast("double")), 4).as("avg_deg_p"),
        round(corr(col("deg_s").cast("double"), col("deg_p").cast("double")),
          6).as("assortativity"))
  }

  // ---- E-200 binary confusion report with MCC ------------------------------------
  // The rule-audit primitive: any boolean predictor vs any boolean
  // outcome → tp/fp/fn/tn and the scores that summarize them —
  // accuracy, balanced accuracy, and Matthews correlation (the one
  // single-number score that survives class imbalance). Here: does a
  // positive account balance threshold predict a high-revenue customer?
  // All four cells are exact integers; every score is settled divisions.
  def extConfusion(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "orders")
      .groupBy(col("o_custkey").as("ck"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val cells = t(s, dir, "customer")
      .join(rev, col("c_custkey") === col("ck"), "left")
      .select((col("c_acctbal") > 5000.0).as("pred"),
        (coalesce(col("cents"), lit(0L)) > 150000000L).as("actual"))
      .agg(
        sum(when(col("pred") && col("actual"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("pred") && !col("actual"), 1L).otherwise(0L)).as("fp"),
        sum(when(!col("pred") && col("actual"), 1L).otherwise(0L)).as("fn"),
        sum(when(!col("pred") && !col("actual"), 1L).otherwise(0L)).as("tn"))
    cells.select(col("tp"), col("fp"), col("fn"), col("tn"),
      round((col("tp") + col("tn")).cast("double") /
        (col("tp") + col("fp") + col("fn") + col("tn")), 6).as("accuracy"),
      round((col("tp").cast("double") / (col("tp") + col("fn")) +
        col("tn").cast("double") / (col("tn") + col("fp"))) / 2.0, 6)
        .as("balanced_acc"),
      round((col("tp") * col("tn") - col("fp") * col("fn")).cast("double") /
        sqrt((col("tp") + col("fp")).cast("double") *
          (col("tp") + col("fn")).cast("double") *
          (col("tn") + col("fp")).cast("double") *
          (col("tn") + col("fn")).cast("double")), 6).as("mcc"))
  }

  // ---- E-201 Brier score with Murphy decomposition -------------------------------
  // Backtest of a per-user base-rate forecaster: train on the first
  // week (P(purchase) per user), score the rest, and decompose the
  // Brier score into reliability − resolution + uncertainty over
  // 2-decimal forecast bins. Users unseen in week one fall back to the
  // global train rate. Forecasts are one settled division per user; the
  // decomposition runs over the ≤101-bin aggregate, never the fact
  // table.
  def extBrier(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-07").cast("date")
    val e = t(s, dir, "events")
    val train = e.filter(to_date(col("ts")) <= cut)
      .groupBy("user_id")
      .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .cast("double") / count(lit(1))).as("p_user"))
    val gtrain = e.filter(to_date(col("ts")) <= cut)
      .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .cast("double") / count(lit(1))).as("p_global"))
    val scored = e.filter(to_date(col("ts")) > cut)
      .select(col("user_id"),
        when(col("event_type") === "purchase", 1.0).otherwise(0.0).as("y"))
      .join(broadcast(train), Seq("user_id"), "left")
      .crossJoin(gtrain)
      .select(round(coalesce(col("p_user"), col("p_global")), 2).as("p"),
        col("y"))
    val bins = scored.groupBy("p")
      .agg(count(lit(1)).as("n_g"), sum("y").as("k_g"))
    val tot = bins.agg(sum("n_g").as("n"), sum("k_g").as("k"))
    bins.crossJoin(tot)
      .select(col("n_g"), col("p"), col("n"),
        (col("k_g").cast("double") / col("n_g")).as("o_g"),
        (col("k").cast("double") / col("n")).as("o"))
      .agg(
        max("n").as("n_test"),
        round(sum(col("n_g") * ((col("p") - col("o_g")) * (col("p") - col("o_g")) -
          (col("o_g") - col("o")) * (col("o_g") - col("o")) +
          col("o") * (lit(1.0) - col("o")))) / max("n"), 6).as("brier"),
        round(sum(col("n_g") * (col("p") - col("o_g")) * (col("p") - col("o_g"))) /
          max("n"), 6).as("reliability"),
        round(sum(col("n_g") * (col("o_g") - col("o")) * (col("o_g") - col("o"))) /
          max("n"), 6).as("resolution"),
        round(max(col("o") * (lit(1.0) - col("o"))), 6).as("uncertainty"))
  }

  // ---- E-202 log-log price elasticity --------------------------------------------
  // Per-brand elasticity of demand: regr_slope(ln qty, ln unit price)
  // over order lines — the textbook log-log estimator, unit price
  // derived in-row. One grouped regression aggregate; both engines
  // share regr_slope.
  def extElasticity(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").join(t(s, dir, "part"),
      col("l_partkey") === col("p_partkey"))
      .filter(col("l_quantity") > 0 && col("l_extendedprice") > 0)
    li.groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n"),
        round(expr("regr_slope(ln(l_quantity), ln(l_extendedprice / l_quantity))"),
          6).as("elasticity"))
      .orderBy("brand")
  }

  // ---- E-203 simplified silhouette -----------------------------------------------
  // Per-label clustering quality of the embedding space: a = distance
  // to the own-label centroid, b = distance to the nearest OTHER
  // centroid, s = (b−a)/max(a,b) — the Vendramin centroid-silhouette
  // that needs |labels| centroid distances per vector instead of the
  // all-pairs original. Rides the E-68 nearest-centroid machinery
  // (dims × broadcast(640-row centroid grid), equi on the dim).
  def extSilhouette(s: SparkSession, dir: String): DataFrame = {
    val dims = t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("i", "x")))
      .withColumn("x", col("x").cast("double"))
    val cent = dims.groupBy(col("label").as("clabel"), col("i"))
      .agg(avg("x").as("cx"))
    val d2 = dims.join(broadcast(cent), "i")
      .groupBy("vec_id", "label", "clabel")
      .agg(sum((col("x") - col("cx")) * (col("x") - col("cx"))).as("d2"))
    val ab = d2.groupBy("vec_id", "label")
      .agg(min(when(col("clabel") === col("label"), col("d2"))).as("a2"),
        min(when(col("clabel") =!= col("label"), col("d2"))).as("b2"))
    ab.select(col("label"),
        ((sqrt(col("b2")) - sqrt(col("a2"))) /
          greatest(sqrt(col("a2")), sqrt(col("b2")))).as("s"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), round(avg("s"), 6).as("sil"))
      .orderBy("label")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_assort" -> (extAssort _),
    "ext_confusion" -> (extConfusion _),
    "ext_brier" -> (extBrier _),
    "ext_elasticity_unit" -> (extElasticity _),
    "ext_silhouette_grid" -> (extSilhouette _))

  val oracleSql: Map[String, String] = Map(
    "ext_assort" ->
      """with edges as (select distinct l_suppkey sk, l_partkey pk from lineitem),
        |ds as (select sk, cast(count(*) as bigint) deg_s from edges group by 1),
        |dp as (select pk, cast(count(*) as bigint) deg_p from edges group by 1)
        |select cast(count(*) as bigint) n_edges,
        |  round(avg(cast(deg_s as double)), 4) avg_deg_s,
        |  round(avg(cast(deg_p as double)), 4) avg_deg_p,
        |  round(corr(cast(deg_s as double), cast(deg_p as double)), 6)
        |    assortativity
        |from edges join ds using (sk) join dp using (pk)""".stripMargin,

    "ext_confusion" ->
      """with rev as (select o_custkey ck,
        |    cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint) cents
        |  from orders group by 1),
        |cells as (select
        |    cast(sum(case when pred and actual then 1 else 0 end) as bigint) tp,
        |    cast(sum(case when pred and not actual then 1 else 0 end) as bigint) fp,
        |    cast(sum(case when not pred and actual then 1 else 0 end) as bigint) fn,
        |    cast(sum(case when not pred and not actual then 1 else 0 end) as bigint) tn
        |  from (select c_acctbal > 5000.0 pred,
        |      coalesce(cents, 0) > 150000000 actual
        |    from customer left join rev on c_custkey = ck))
        |select tp, fp, fn, tn,
        |  round(cast(tp + tn as double) / (tp + fp + fn + tn), 6) accuracy,
        |  round((cast(tp as double) / (tp + fn)
        |    + cast(tn as double) / (tn + fp)) / 2.0, 6) balanced_acc,
        |  round(cast(tp * tn - fp * fn as double)
        |    / sqrt(cast(tp + fp as double) * cast(tp + fn as double)
        |      * cast(tn + fp as double) * cast(tn + fn as double)), 6) mcc
        |from cells""".stripMargin,

    "ext_brier" ->
      """with train as (select user_id,
        |    cast(sum(case when event_type = 'purchase' then 1 else 0 end)
        |      as double) / count(*) p_user
        |  from events where cast(ts as date) <= date '2024-01-07' group by 1),
        |gt as (select cast(sum(case when event_type = 'purchase' then 1 else 0
        |    end) as double) / count(*) p_global
        |  from events where cast(ts as date) <= date '2024-01-07'),
        |scored as (select round(coalesce(p_user, p_global), 2) p,
        |    case when event_type = 'purchase' then 1.0 else 0.0 end y
        |  from events e left join train using (user_id) cross join gt
        |  where cast(e.ts as date) > date '2024-01-07'),
        |bins as (select p, cast(count(*) as bigint) n_g, sum(y) k_g
        |  from scored group by 1),
        |tot as (select cast(sum(n_g) as bigint) n, sum(k_g) k from bins),
        |terms as (select n_g, p, n,
        |    cast(k_g as double) / n_g o_g, cast(k as double) / n o
        |  from bins cross join tot)
        |select max(n) n_test,
        |  round(sum(n_g * ((p - o_g) * (p - o_g) - (o_g - o) * (o_g - o)
        |    + o * (1.0 - o))) / max(n), 6) brier,
        |  round(sum(n_g * (p - o_g) * (p - o_g)) / max(n), 6) reliability,
        |  round(sum(n_g * (o_g - o) * (o_g - o)) / max(n), 6) resolution,
        |  round(max(o * (1.0 - o)), 6) uncertainty
        |from terms""".stripMargin,

    "ext_elasticity_unit" ->
      """select p_brand brand, cast(count(*) as bigint) n,
        |  round(regr_slope(ln(l_quantity), ln(l_extendedprice / l_quantity)), 6)
        |    elasticity
        |from lineitem join part on l_partkey = p_partkey
        |where l_quantity > 0 and l_extendedprice > 0
        |group by 1 order by brand""".stripMargin,

    "ext_silhouette_grid" ->
      """with dims as (select vec_id, label,
        |    generate_subscripts(embedding, 1) i,
        |    cast(unnest(embedding) as double) x from embeddings),
        |cent as (select label clabel, i, avg(x) cx from dims group by 1, 2),
        |d2 as (select vec_id, label, clabel,
        |    sum((x - cx) * (x - cx)) d2
        |  from dims join cent using (i) group by 1, 2, 3),
        |ab as (select vec_id, label,
        |    min(case when clabel = label then d2 end) a2,
        |    min(case when clabel <> label then d2 end) b2
        |  from d2 group by 1, 2)
        |select label, cast(count(*) as bigint) n,
        |  round(avg((sqrt(b2) - sqrt(a2))
        |    / greatest(sqrt(a2), sqrt(b2))), 6) sil
        |from ab group by label order by label""".stripMargin)
}
