package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 57: in-database ML scoring —
  * naive-Bayes propensity with decile calibration (quantized
  * log-odds, the E-257 discipline), and cost-sensitive threshold
  * selection over the E-256 scored frame with a fully-integer
  * expected-cost argmin.
  */
object ExtensionQueries57 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-326 naive-Bayes propensity + calibration --------------------------------
  // Score every customer's propensity to place an URGENT order from
  // two categorical features (segment, nation-group) with
  // Laplace-smoothed naive Bayes: per-value log-odds QUANTIZED to
  // 1e-6 ints so per-customer scores are exact integer sums; the
  // readout is the decile calibration table — predicted rank vs
  // actual urgent rate, the monotonicity check that validates the
  // model without a single float fold.
  def extNbayes(s: SparkSession, dir: String): DataFrame = {
    val urgent = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey")).distinct()
      .withColumn("t", lit(1L))
    val base = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment").as("seg"),
        pmod(col("c_nationkey"), lit(5L)).as("ng"))
      .join(urgent, Seq("c_custkey"), "left")
      .withColumn("t", coalesce(col("t"), lit(0L)))
    val tot = base.agg(count(lit(1)).as("n"), sum("t").as("nt"))
    def lo(feature: String, k: Int) = base.groupBy(feature)
      .agg(count(lit(1)).as("nf"), sum("t").as("ct"))
      .crossJoin(broadcast(tot))
      .select(col(feature),
        round((log((col("ct") + 1).cast("double") / (col("nt") + k)) -
          log((col("nf") - col("ct") + 1).cast("double") /
            (col("n") - col("nt") + k))) * 1e6).cast("long")
          .as(s"lo_$feature"))
    val scored = base
      .join(broadcast(lo("seg", 5)), "seg")
      .join(broadcast(lo("ng", 5)), "ng")
      .withColumn("score", col("lo_seg") + col("lo_ng"))
    val deciles = scored.withColumn("decile",
      ntile(10).over(Window.orderBy(desc("score"), asc("c_custkey")))
        .cast("long"))
    deciles.groupBy("decile")
      .agg(count(lit(1)).as("n"),
        round(avg(col("score").cast("double")) / 1e6, 4).as("avg_logodds"),
        sum("t").as("n_urgent"))
      .withColumn("actual_rate",
        round(col("n_urgent").cast("double") / col("n"), 4))
      .orderBy("decile")
  }

  // ---- E-327 cost-sensitive threshold selection ----------------------------------
  // The decision layer over E-256's PR curve: with FP costing 5 and
  // FN costing 1, expected cost per threshold is an EXACT integer
  // (5·FP + FN) over the k/20 grid — the argmin threshold is flagged
  // by an integer min-join, no float anywhere in the choice.
  def extCostthresh(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = t(s, dir, "embeddings")
    val centroid = e.filter(col("label") === 0)
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("pos").agg(avg("v").as("m"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("c"))
    val scored = e.crossJoin(broadcast(centroid))
      .select(round(call_function("cosine_sim", col("embedding"), col("c")),
        6).as("score"), (col("label") === 0).as("pos"))
    val ths = s.range(0, 20)
      .select((col("id").cast("double") / 20).as("th"))
    val costs = scored.crossJoin(broadcast(ths))
      .groupBy("th")
      .agg(sum(when(col("score") >= col("th") && !col("pos"), 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("score") < col("th") && col("pos"), 1L)
          .otherwise(0L)).as("fn"))
      .withColumn("tot_cost", col("fp") * 5 + col("fn"))
    val best = costs.agg(min(struct(col("tot_cost"), col("th"))).as("b"))
      .select(col("b.th").as("best_th"))
    costs.crossJoin(broadcast(best))
      .select(round(col("th"), 2).as("th"), col("fp"), col("fn"),
        col("tot_cost"), (col("th") === col("best_th")).as("chosen"))
      .orderBy("th")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_nbayes" -> (extNbayes _),
    "ext_costthresh" -> (extCostthresh _))

  val oracleSql: Map[String, String] = Map(
    // E-326: identical smoothed quantized log-odds and decile table.
    "ext_nbayes" ->
      """with urgent as (select distinct o_custkey c_custkey, 1 t
        |  from orders where o_orderpriority = '1-URGENT'),
        |base as (select c.c_custkey, c_mktsegment seg,
        |    c_nationkey % 5 ng, coalesce(t, 0) t
        |  from customer c left join urgent using (c_custkey)),
        |tot as (select cast(count(*) as bigint) n,
        |    cast(sum(t) as bigint) nt from base),
        |ls as (select seg, cast(round((ln(cast(ct + 1 as double)
        |      / (nt + 5)) - ln(cast(nf - ct + 1 as double)
        |      / (n - nt + 5))) * 1e6) as bigint) lo_seg
        |  from (select seg, cast(count(*) as bigint) nf,
        |      cast(sum(t) as bigint) ct from base group by seg)
        |    cross join tot),
        |lg as (select ng, cast(round((ln(cast(ct + 1 as double)
        |      / (nt + 5)) - ln(cast(nf - ct + 1 as double)
        |      / (n - nt + 5))) * 1e6) as bigint) lo_ng
        |  from (select ng, cast(count(*) as bigint) nf,
        |      cast(sum(t) as bigint) ct from base group by ng)
        |    cross join tot),
        |scored as (select base.c_custkey, t, lo_seg + lo_ng score
        |  from base join ls using (seg) join lg using (ng)),
        |dd as (select t, score,
        |    cast(ntile(10) over (order by score desc, c_custkey)
        |      as bigint) decile
        |  from scored)
        |select decile, cast(count(*) as bigint) n,
        |  round(avg(cast(score as double)) / 1e6, 4) avg_logodds,
        |  cast(sum(t) as bigint) n_urgent,
        |  round(cast(sum(t) as double) / count(*), 4) actual_rate
        |from dd group by decile order by decile""".stripMargin,

    // E-327: the E-256 oracle's scoring + the integer cost argmin.
    "ext_costthresh" ->
      """with c as (select i, avg(cast(embedding[i] as double)) m
        |  from embeddings, unnest(range(1, len(embedding) + 1)) u(i)
        |  where label = 0 group by i),
        |sc as (select vec_id, label = 0 pos,
        |    round(
        |      (select sum(cast(e.embedding[c.i] as double) * c.m) from c)
        |      / (sqrt(list_sum(list_transform(e.embedding,
        |           x -> cast(x as double) * x)))
        |         * (select sqrt(sum(m * m)) from c)), 6) score
        |  from embeddings e),
        |costs as (select th,
        |    cast(sum(case when score >= th and not pos then 1 else 0 end)
        |      as bigint) fp,
        |    cast(sum(case when score < th and pos then 1 else 0 end)
        |      as bigint) fn
        |  from sc cross join (select cast(k as double) / 20 th
        |    from unnest(range(0, 20)) u(k))
        |  group by th),
        |wc as (select th, fp, fn, fp * 5 + fn tot_cost from costs),
        |best as (select min(th) best_th from wc
        |  where tot_cost = (select min(tot_cost) from wc))
        |select round(th, 2) th, fp, fn, tot_cost, th = best_th chosen
        |from wc cross join best order by th""".stripMargin)
}
