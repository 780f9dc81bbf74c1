package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 10: event-funnel economics
  * (last-touch attribution, inter-arrival fits, DAU/WAU stickiness,
  * Pareto revenue concentration) and corpus geometry (lexical richness,
  * label-centroid cosine matrix).
  *
  * House float discipline as in batch 9 (SURVEY §5.2): integer counts
  * until the last expression, cents-exact money cumsums, every emitted
  * double rounded, output totally ordered.
  */
object ExtensionQueries10 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-145 last-touch attribution ----------------------------------------------
  // Which channel gets credit for a purchase: the most recent prior
  // non-purchase event by the same user (event-time as-of, strictly
  // before). One window per user — partition-local at any event volume,
  // the same shape Spark plans for sessionization. Purchases with no
  // prior touch attribute to 'none'.
  def extAttribution(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    t(s, dir, "events")
      .withColumn("touch",
        last(when(col("event_type") =!= "purchase", col("event_type")), ignoreNulls = true)
          .over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("touch"), lit("none")).as("touch_type"))
      .agg(count(lit(1)).as("n_purchases"), round(sum("value"), 2).as("revenue"))
      .orderBy("touch_type")
  }

  // ---- E-146 inter-arrival statistics --------------------------------------------
  // Per event type: mean gap, coefficient of variation, and the MLE
  // exponential rate (λ = 1/mean) over per-user inter-arrival times —
  // CV≈1 is the Poisson sanity check, CV≫1 is bursty traffic. Gaps are
  // exact microsecond longs (lag over a per-user window) converted to
  // seconds only inside the final aggregate.
  def extInterarrival(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev", lag("us", 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("event_type"), ((col("us") - col("prev")) / lit(1000000.0)).as("gap"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        round(avg("gap"), 6).as("mean_gap_s"),
        round(stddev_samp("gap") / avg("gap"), 6).as("cv"),
        round(lit(1.0) / avg("gap"), 6).as("lambda_mle"))
      .orderBy("event_type")
  }

  // ---- E-147 DAU/WAU stickiness --------------------------------------------------
  // Daily actives, trailing-7-day actives, and their ratio. WAU without
  // a rolling COUNT DISTINCT (not a window aggregate anywhere): each
  // (user, day) row is exploded onto the 7 window-end days it supports,
  // then one countDistinct per end day — the standard scalable rewrite,
  // shuffle O(7·|user-days|). Window-end days with no same-day actives
  // (and the 6-day tail past the data) drop out via the inner join.
  def extStickiness(s: SparkSession, dir: String): DataFrame = {
    val ud = t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val dau = ud.groupBy("d").agg(countDistinct("user_id").as("dau"))
    val wau = ud
      .select(col("user_id"), explode(sequence(col("d"), date_add(col("d"), 6))).as("wend"))
      .groupBy("wend").agg(countDistinct("user_id").as("wau"))
    dau.join(wau, col("d") === col("wend"))
      .select(col("d"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
      .orderBy("d")
  }

  // ---- E-148 Pareto revenue concentration ----------------------------------------
  // Share of total revenue captured by the top 1/5/10/20/50% of
  // customers. Revenue is rounded to cents and cumulated as exact longs,
  // so every share is one settled float at the end; the cut row is
  // found by EQUI-join on rank = k with k = ⌈n·pct/100⌉ computed in
  // integer math ((n·pct+99) div 100) — no range join, no float ceil.
  // The rank window is unpartitioned over the customer DIM (same
  // documented tradeoff as ext_rfm; swap for a 2-pass quantile cut if
  // the dim itself is huge).
  def extPareto(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "orders").groupBy("o_custkey")
      .agg(round(sum("o_totalprice"), 2).as("rev"))
      .select(col("o_custkey"), round(col("rev") * 100).cast("long").as("cents"))
    val w = Window.orderBy(col("cents").desc, col("o_custkey"))
    val ranked = per.select(col("cents"),
        row_number().over(w).as("rn"),
        sum("cents").over(w.rowsBetween(Window.unboundedPreceding, 0)).as("cum"))
    val cuts = ranked.agg(sum("cents").as("totc"), count(lit(1)).as("n"))
      .select(col("totc"), col("n"),
        explode(array(lit(1L), lit(5L), lit(10L), lit(20L), lit(50L))).as("pct"))
      .withColumn("k", expr("((n * pct) + 99) div 100"))
    ranked.join(cuts, col("rn") === col("k"))
      .select(col("pct"), col("k").as("n_top"),
        round(col("cum").cast("double") / col("totc"), 6).as("rev_share"))
      .orderBy("pct")
  }

  // ---- E-149 lexical richness ----------------------------------------------------
  // Type-token ratio and hapax-legomena share per source — the lexical
  // diversity screen next to ext_vocabgrowth (corpus-level Heaps fit)
  // and ext_entropy (distributional): a source whose TTR collapses is
  // template spam even when its quality score looks fine. Pure integer
  // aggregates over one (source, token) count table.
  def extLexical(s: SparkSession, dir: String): DataFrame = {
    val perTok = t(s, dir, "documents")
      .select(col("source"),
        explode(filter(split(col("text"), " "), x => x =!= lit(""))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
    perTok.groupBy("source")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
        round(col("n_types").cast("double") / col("n_tokens"), 6).as("ttr"),
        round(col("n_hapax").cast("double") / col("n_types"), 6).as("hapax_share"))
      .orderBy("source")
  }

  // ---- E-150 label-centroid cosine matrix ----------------------------------------
  // Pairwise cosine between per-label embedding centroids — the domain
  // similarity matrix that decides which corpus shards are near-
  // interchangeable for mixture planning. Everything is an EQUI-join on
  // the dimension index: centroids are a (labels × dims) table, dots a
  // join on dim, so nothing here is quadratic in ROWS — only in the
  // label count, which is the small dimension by construction.
  def extDomainSim(s: SparkSession, dir: String): DataFrame = {
    val cent = t(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("label", "i").agg(avg(col("x").cast("double")).as("cx"))
    val dots = cent.select(col("label").as("la"), col("i"), col("cx").as("xa"))
      .join(cent.select(col("label").as("lb"), col("i"), col("cx").as("xb")), "i")
      .filter(col("la") < col("lb"))
      .groupBy("la", "lb").agg(sum(col("xa") * col("xb")).as("dot"))
    val norms = cent.groupBy("label").agg(sqrt(sum(col("cx") * col("cx"))).as("nrm"))
    dots
      .join(norms.select(col("label").as("la"), col("nrm").as("na")), "la")
      .join(norms.select(col("label").as("lb"), col("nrm").as("nb")), "lb")
      .select(col("la"), col("lb"),
        round(col("dot") / (col("na") * col("nb")), 6).as("cosine"))
      .orderBy("la", "lb")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_attribution" -> (extAttribution _),
    "ext_interarrival" -> (extInterarrival _),
    "ext_stickiness" -> (extStickiness _),
    "ext_pareto" -> (extPareto _),
    "ext_lexical" -> (extLexical _),
    "ext_domainsim" -> (extDomainSim _))

  val oracleSql: Map[String, String] = Map(
    "ext_attribution" ->
      """with e as (select user_id, ts, event_id, event_type, value,
        |    last_value(case when event_type <> 'purchase' then event_type end
        |        ignore nulls)
        |      over (partition by user_id order by ts, event_id
        |            rows between unbounded preceding and 1 preceding) touch
        |  from events)
        |select coalesce(touch, 'none') touch_type, count(*) n_purchases,
        |  round(sum(value), 2) revenue
        |from e where event_type = 'purchase'
        |group by 1 order by 1""".stripMargin,

    "ext_interarrival" ->
      """with g as (select event_type,
        |    (epoch_us(ts) - lag(epoch_us(ts)) over (
        |      partition by user_id, event_type order by ts, event_id))
        |      / cast(1000000 as double) gap
        |  from events)
        |select event_type, count(*) n_gaps,
        |  round(avg(gap), 6) mean_gap_s,
        |  round(stddev_samp(gap) / avg(gap), 6) cv,
        |  round(cast(1 as double) / avg(gap), 6) lambda_mle
        |from g where gap is not null
        |group by event_type order by event_type""".stripMargin,

    "ext_stickiness" ->
      """with ud as (select distinct user_id, cast(ts as date) d from events),
        |dau as (select d, count(distinct user_id) dau from ud group by d),
        |ex as (select user_id, d + cast(i as integer) wend
        |  from ud cross join (select unnest(generate_series(0, 6)) i) t),
        |wau as (select wend, count(distinct user_id) wau from ex group by wend)
        |select d, dau, wau,
        |  round(cast(dau as double) / wau, 6) stickiness
        |from dau join wau on wend = d order by d""".stripMargin,

    "ext_pareto" ->
      """with per as (select o_custkey,
        |    cast(round(round(sum(o_totalprice), 2) * 100) as bigint) cents
        |  from orders group by o_custkey),
        |ranked as (select cents,
        |    row_number() over (order by cents desc, o_custkey) rn,
        |    sum(cents) over (order by cents desc, o_custkey
        |      rows between unbounded preceding and current row) cum
        |  from per),
        |cuts as (select tot.totc, tot.n, p.pct, ((tot.n * p.pct) + 99) // 100 k
        |  from (select sum(cents) totc, count(*) n from ranked) tot
        |  cross join (select unnest([1, 5, 10, 20, 50]) pct) p)
        |select pct, k n_top,
        |  round(cast(cum as double) / totc, 6) rev_share
        |from ranked join cuts on rn = k order by pct""".stripMargin,

    "ext_lexical" ->
      """with perTok as (select source, tok, count(*) c from (
        |    select source,
        |      unnest(list_filter(string_split(text, ' '), w -> w <> '')) tok
        |    from documents) group by source, tok)
        |select source, cast(sum(c) as bigint) n_tokens, count(*) n_types,
        |  cast(sum(case when c = 1 then 1 else 0 end) as bigint) n_hapax,
        |  round(cast(count(*) as double) / sum(c), 6) ttr,
        |  round(cast(sum(case when c = 1 then 1 else 0 end) as double)
        |    / count(*), 6) hapax_share
        |from perTok group by source order by source""".stripMargin,

    "ext_domainsim" ->
      """with dims as (select label, generate_subscripts(embedding, 1) i,
        |    cast(unnest(embedding) as double) x from embeddings),
        |cent as (select label, i, avg(x) cx from dims group by 1, 2),
        |dots as (select a.label la, b.label lb, sum(a.cx * b.cx) dot
        |  from cent a join cent b using(i) where a.label < b.label group by 1, 2),
        |norms as (select label, sqrt(sum(cx * cx)) nrm from cent group by label)
        |select la, lb, round(dot / (na.nrm * nb.nrm), 6) cosine
        |from dots join norms na on la = na.label join norms nb on lb = nb.label
        |order by la, lb""".stripMargin)
}
