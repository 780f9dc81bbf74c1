package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 79: decision policies — greedy
  * knapsack stocking under a budget, UCB1 exploration indices per
  * event-type arm, and inverse-propensity off-policy evaluation of
  * the personalized-favorite policy.
  */
object ExtensionQueries79 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-385 greedy knapsack selection -------------------------------------------
  // Which parts to stock under a $1M catalog budget? The density
  // greedy (optimal for the fractional relaxation, ≥½-optimal 0/1):
  // value = net lineitem revenue per part (exact cents), cost =
  // retail price; parts ranked by value∕cost density (settled double,
  // partkey tiebreak), prefix-cost window, keep while the cumulative
  // cost fits. One summary row — the shelf-planning primitive.
  def extKnapsack(s: SparkSession, dir: String): DataFrame = {
    val v = t(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) *
        100).cast("long")).as("vcents"))
    val parts = t(s, dir, "part")
      .select(col("p_partkey").as("pk"),
        round(col("p_retailprice") * 100).cast("long").as("ccents"))
      .join(v, Seq("pk"))
      .withColumn("density",
        col("vcents").cast("double") / col("ccents"))
    val w = Window.orderBy(desc("density"), asc("pk"))
    val sel = parts
      .withColumn("cumcost", sum("ccents").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cumcost") <= 100000000L)
    sel.agg(count(lit(1)).as("n_selected"),
        round(sum("ccents").cast("double") / 100, 2)
          .as("total_cost_dollars"),
        round(sum("vcents").cast("double") / 100, 2)
          .as("total_value_dollars"),
        round(min("density"), 6).as("marginal_density"))
      .select(col("n_selected"), col("total_cost_dollars"),
        col("total_value_dollars"), col("marginal_density"),
        round(col("total_cost_dollars") / 1e6 * 100, 4)
          .as("budget_utilization_pct"))
  }

  // ---- E-386 UCB1 arm indices ----------------------------------------------------
  // What should an explore-exploit policy try next? UCB1 index per
  // event-type arm: normalized mean reward (value ∕ global max, the
  // boundedness UCB needs) + √(2·ln N ∕ n_a) exploration bonus —
  // rewards in exact cents, normalization and bonus each one settled
  // expression. The index vs the naive mean shows WHERE the bonus
  // flips the ranking (small-sample arms float up).
  def extUcb(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("event_type").as("arm"),
        round(col("value") * 100).cast("long").as("r"))
    val g = e.agg(count(lit(1)).as("nn"), max("r").as("maxr")).limit(1)
    val arms = e.groupBy("arm")
      .agg(count(lit(1)).as("na"),
        sum(col("r").cast("decimal(38,0)")).as("sr"))
    arms.crossJoin(broadcast(g))
      .select(col("arm"), col("na"),
        round(col("sr").cast("double") / col("na") /
          col("maxr").cast("double"), 6).as("mean_norm"),
        round(sqrt(lit(2.0) * log(col("nn").cast("double")) /
          col("na").cast("double")), 6).as("bonus"))
      .withColumn("ucb_index",
        round(col("mean_norm") + col("bonus"), 6))
      .withColumn("rank_by_mean", row_number().over(
        Window.orderBy(desc("mean_norm"), asc("arm"))).cast("long"))
      .withColumn("rank_by_ucb", row_number().over(
        Window.orderBy(desc("ucb_index"), asc("arm"))).cast("long"))
      .orderBy("rank_by_ucb")
  }

  // ---- E-387 IPS off-policy evaluation -------------------------------------------
  // What would the "serve each user their historical favorite" policy
  // be worth, measured only from the logged stream? Inverse-propensity
  // scoring with the logging policy = observed global arm frequencies:
  // V̂ = (1∕N)·Σ 1{a=π(u)}·r∕p(a), plus the self-normalized SNIPS
  // variant that divides by the mean importance weight. Favorites by
  // (count desc, type) per user; per-row weighted terms quantized to
  // 1e-4 cents before the fold.
  def extIps(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), col("event_type").as("arm"),
        round(col("value") * 100).cast("long").as("r"))
    val fav = e.groupBy("user_id", "arm").agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("user_id").orderBy(desc("c"), asc("arm"))))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("arm").as("fav"))
    val g = e.agg(count(lit(1)).as("nn")).limit(1)
    val props = e.groupBy("arm").agg(count(lit(1)).as("na"))
    val terms = e.join(fav, Seq("user_id"))
      .join(broadcast(props), Seq("arm"))
      .crossJoin(broadcast(g))
      .select(col("nn"),
        when(col("arm") === col("fav"),
          round(col("r").cast("double") * col("nn") /
            col("na").cast("double") * 1e4).cast("long"))
          .otherwise(0L).as("vq"),
        when(col("arm") === col("fav"),
          round(col("nn").cast("double") / col("na") * 1e9).cast("long"))
          .otherwise(0L).as("wq"),
        when(col("arm") === col("fav"), 1L).otherwise(0L).as("m"))
    terms.agg(first("nn").as("n_events"),
        sum("m").as("n_matched"),
        sum(col("vq").cast("decimal(38,0)")).as("sv"),
        sum(col("wq").cast("decimal(38,0)")).as("sw"))
      .select(col("n_events"), col("n_matched"),
        round(col("n_matched").cast("double") * 100 / col("n_events"), 4)
          .as("match_rate_pct"),
        round(col("sv").cast("double") / 1e4 / 100 /
          col("n_events").cast("double"), 4).as("v_ips_dollars"),
        round(col("sv").cast("double") / 1e4 / 100 /
          (col("sw").cast("double") / 1e9), 4).as("v_snips_dollars"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_knapsack" -> (extKnapsack _),
    "ext_ucb" -> (extUcb _),
    "ext_ips" -> (extIps _))

  val oracleSql: Map[String, String] = Map(
    // E-385: identical density order, prefix-cost cut.
    "ext_knapsack" ->
      """with v as (select l_partkey pk,
        |    cast(sum(cast(round(l_extendedprice * (1 - l_discount) * 100)
        |      as bigint)) as bigint) vcents
        |  from lineitem group by 1),
        |parts as (select p_partkey pk,
        |    cast(round(p_retailprice * 100) as bigint) ccents, vcents,
        |    cast(vcents as double) / cast(round(p_retailprice * 100)
        |      as bigint) density
        |  from part join v on v.pk = p_partkey),
        |sel as (select * from (select pk, ccents, vcents, density,
        |    cast(sum(ccents) over (order by density desc, pk asc
        |      rows between unbounded preceding and current row)
        |      as bigint) cumcost
        |  from parts) where cumcost <= 100000000)
        |select cast(count(*) as bigint) n_selected,
        |  round(cast(sum(ccents) as double) / 100, 2) total_cost_dollars,
        |  round(cast(sum(vcents) as double) / 100, 2) total_value_dollars,
        |  round(min(density), 6) marginal_density,
        |  round(round(cast(sum(ccents) as double) / 100, 2) / 1e6 * 100,
        |    4) budget_utilization_pct
        |from sel""".stripMargin,

    // E-386: identical normalization, bonus, double ranking.
    "ext_ucb" ->
      """with e as (select event_type arm,
        |    cast(round(value * 100) as bigint) r
        |  from events),
        |g as (select cast(count(*) as bigint) nn,
        |    cast(max(r) as bigint) maxr from e),
        |arms as (select arm, cast(count(*) as bigint) na,
        |    sum(cast(r as hugeint)) sr from e group by 1),
        |idx as (select arm, na,
        |    round(cast(sr as double) / na / cast(maxr as double), 6)
        |      mean_norm,
        |    round(sqrt(2.0 * ln(cast(nn as double)) /
        |      cast(na as double)), 6) bonus
        |  from arms cross join g),
        |u as (select arm, na, mean_norm, bonus,
        |    round(mean_norm + bonus, 6) ucb_index from idx)
        |select arm, na, mean_norm, bonus, ucb_index,
        |  cast(row_number() over (order by mean_norm desc, arm asc)
        |    as bigint) rank_by_mean,
        |  cast(row_number() over (order by ucb_index desc, arm asc)
        |    as bigint) rank_by_ucb
        |from u order by rank_by_ucb""".stripMargin,

    // E-387: identical favorites, propensities, quantized IPS folds.
    "ext_ips" ->
      """with e as (select user_id, event_type arm,
        |    cast(round(value * 100) as bigint) r
        |  from events),
        |fav as (select user_id, arm fav from (
        |    select user_id, arm,
        |      row_number() over (partition by user_id
        |        order by count(*) desc, arm asc) rk
        |    from e group by user_id, arm) where rk = 1),
        |g as (select cast(count(*) as bigint) nn from e),
        |props as (select arm, cast(count(*) as bigint) na
        |  from e group by 1),
        |terms as (select nn,
        |    case when e.arm = fav.fav
        |      then cast(round(cast(r as double) * nn /
        |        cast(na as double) * 1e4) as bigint) else 0 end vq,
        |    case when e.arm = fav.fav
        |      then cast(round(cast(nn as double) / na * 1e9) as bigint)
        |      else 0 end wq,
        |    case when e.arm = fav.fav then 1 else 0 end m
        |  from e join fav using (user_id)
        |  join props on props.arm = e.arm
        |  cross join g)
        |select any_value(nn) n_events,
        |  cast(sum(m) as bigint) n_matched,
        |  round(cast(sum(m) as double) * 100 / any_value(nn), 4)
        |    match_rate_pct,
        |  round(cast(sum(cast(vq as hugeint)) as double) / 1e4 / 100 /
        |    cast(any_value(nn) as double), 4) v_ips_dollars,
        |  round(cast(sum(cast(vq as hugeint)) as double) / 1e4 / 100 /
        |    (cast(sum(cast(wq as hugeint)) as double) / 1e9), 4)
        |    v_snips_dollars
        |from terms""".stripMargin)
}
