package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 74: attribution, retrieval and
  * inventory — Markov removal-effect channel attribution by truncated
  * absorbing-chain propagation in exact integer arithmetic, mean
  * average precision@10 over the shared probe-retrieval frame, and
  * the economic-order-quantity policy per brand.
  */
object ExtensionQueries74 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-370 Markov removal-effect attribution -----------------------------------
  // Which channel's disappearance would cost the most conversions?
  // Per-user event streams truncated at the FIRST purchase feed a
  // first-order chain (START → types, purchase absorbing); removal of
  // channel c deletes every transition touching c WITHOUT
  // renormalizing (lost paths are lost — the removal-effect
  // convention). Conversion = P(absorb within 6 steps from START),
  // propagated by SIX unrolled matrix-vector steps where probabilities
  // live as 1e-9 integers and each step re-rounds by integer
  // (s+5e8)∕1e9 division — every intermediate exact on both engines.
  // Effect(c) = 1 − conv₋c∕conv, shares normalized over channels.
  def extRemovaleffect(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(w).cast("long"))
    val fp = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min("rn").as("fpn"))
    val trimmed = ev.join(fp, Seq("user_id"), "left")
      .filter(col("fpn").isNull || col("rn") <= col("fpn"))
      .withColumn("prev",
        coalesce(lag("event_type", 1).over(w), lit("_start")))
    val counts = trimmed
      .groupBy(col("prev").as("f"), col("event_type").as("tt"))
      .agg(count(lit(1)).as("c"))
    val tot = counts.groupBy("f").agg(sum("c").as("ct"))
    // pin the ≤42-row transition table: it is the only frame derived
    // from the EVENTS scan (window + two aggregates), and without the
    // pin every downstream reference (strans appears 6× in the unrolled
    // chain, states twice, plus the conv/eff tail) re-embeds — and at
    // action time re-EXECUTES — that whole events pipeline; the measured
    // plan was 784k chars of explain text for a 5-row result
    val probs = counts.join(tot, Seq("f"))
      .select(col("f"), col("tt"),
        round(col("c").cast("double") * 1e9 / col("ct")).cast("long")
          .as("p"))
      .limit(42) // ≤ (5 types + START) × 6 states: structurally bounded
      .localCheckpoint()
    val scen = probs.sparkSession
      .createDataFrame(Seq(Tuple1("none"), Tuple1("click"), Tuple1("error"),
        Tuple1("signup"), Tuple1("view")))
      .toDF("scenario").limit(5)
    val strans = scen.crossJoin(probs)
      .filter(col("scenario") === "none" ||
        (col("f") =!= col("scenario") && col("tt") =!= col("scenario")))
    val states = probs.select(col("f").as("state"))
      .union(probs.select(col("tt").as("state"))).distinct().limit(7)
    var ak = scen.crossJoin(states)
      .select(col("scenario"), col("state"),
        when(col("state") === "purchase", 1000000000L).otherwise(0L)
          .as("a"))
    for (_ <- 1 to 6) {
      val stepped = strans
        .join(ak.select(col("scenario"), col("state").as("tt"), col("a")),
          Seq("scenario", "tt"))
        .groupBy(col("scenario"), col("f").as("state"))
        .agg(sum(col("p") * col("a")).as("sraw"))
        .select(col("scenario"), col("state"),
          expr("CAST((sraw + 500000000L) DIV 1000000000L AS BIGINT)")
            .as("a"))
        .filter(col("state") =!= "purchase")
      ak = stepped.union(
        scen.select(col("scenario"), lit("purchase").as("state"),
          lit(1000000000L).as("a")))
    }
    // pin the 6-step chain's tail (≤6 rows): base/eff/sums each re-embed
    // conv, so without the pin the whole 6-step aggregate chain executes
    // ~7 times inside the one final action
    val conv = ak.filter(col("state") === "_start")
      .select(col("scenario"), col("a"))
      .localCheckpoint()
    val base = conv.filter(col("scenario") === "none")
      .select(col("a").as("ab")).limit(1)
    val eff = conv.filter(col("scenario") =!= "none")
      .crossJoin(broadcast(base))
      .select(col("scenario").as("channel"),
        round(col("ab").cast("double") / 1e9, 6).as("conv_base"),
        round(col("a").cast("double") / 1e9, 6).as("conv_removed"),
        (col("ab") - col("a")).as("d"), col("ab"))
    val sums = eff.agg(sum("d").as("sd")).limit(1)
    eff.crossJoin(broadcast(sums))
      .select(col("channel"), col("conv_base"), col("conv_removed"),
        round(col("d").cast("double") / col("ab"), 6).as("removal_effect"),
        round(when(col("sd") > 0,
          col("d").cast("double") / col("sd")), 6).as("effect_share"))
      .orderBy("channel")
  }

  // ---- E-371 mean average precision@10 -------------------------------------------
  // The position-sensitive retrieval summary E-232's P@k flattens:
  // AP@10 = Σ_{i≤10} rel_i·(hits≤i ∕ i) ∕ min(n_rel, 10) per probe
  // over the shared E-67 ranked frame (rounded-cos, id tiebreaks),
  // each precision term 1e-9-quantized before the per-probe fold, the
  // final MAP one settled mean over quantized APs. Probes with no
  // relevant candidate are excluded (the MAP convention).
  def extMapk(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = t(s, dir, "embeddings")
    val probes = e.filter(col("vec_id") % 97 === 0)
      .orderBy("vec_id").limit(128)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
        col("label").as("plabel"))
    val w = Window.partitionBy("probe_id").orderBy(desc("cos"), asc("vec_id"))
    val ranked = e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(call_function("cosine_sim", col("embedding"), col("pv")), 4)
          .as("cos"),
        when(col("label") === col("plabel"), 1L).otherwise(0L).as("rel"))
      .withColumn("rk", row_number().over(w).cast("long"))
    val per = ranked
      .withColumn("cum", sum("rel").over(
        Window.partitionBy("probe_id").orderBy("rk")))
      .groupBy("probe_id")
      .agg(sum(when(col("rk") <= 10 && col("rel") === 1L,
          round(col("cum").cast("double") * 1e9 / col("rk")).cast("long"))
          .otherwise(0L)).as("apnum"),
        sum("rel").as("nrel"))
      .filter(col("nrel") > 0)
      .select(round(col("apnum").cast("double") /
        least(col("nrel"), lit(10L)).cast("double")).cast("long").as("apq"))
    per.agg(count(lit(1)).as("n_probes"),
      round(avg(col("apq").cast("double")) / 1e9, 6).as("map_at_10"))
  }

  // ---- E-372 economic order quantity ---------------------------------------------
  // The inventory policy per brand: EOQ q* = √(2DS∕H) with demand D =
  // total shipped quantity, pinned order cost S = $100, holding H =
  // 20% of the demand-weighted unit price (Σ cents ∕ Σ qty — one
  // settled division of exact integers); reorder point = mean daily
  // demand × pinned 7-day lead over the global shipping calendar.
  // Orders per year D∕q* closes the policy. Top-15 brands by demand.
  def extEoq(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .join(t(s, dir, "part").select(col("p_partkey").as("l_partkey"),
        col("p_brand")), Seq("l_partkey"))
    val cal = li.agg(countDistinct(col("l_shipdate").cast("date"))
      .as("n_days")).limit(1)
    val byBrand = li.groupBy("p_brand")
      .agg(sum(col("l_quantity").cast("long")).as("d"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
    byBrand.crossJoin(broadcast(cal))
      .select(col("p_brand"), col("d").as("demand_units"), {
          val h = lit(0.2) * col("cents").cast("double") / 100 /
            col("d").cast("double")
          val q = sqrt(lit(2.0) * col("d").cast("double") * lit(100.0) / h)
          round(q, 2).as("eoq_units")
        },
        round(lit(0.2) * col("cents").cast("double") / 100 /
          col("d").cast("double"), 4).as("holding_per_unit"),
        round(col("d").cast("double") * 7 / col("n_days"), 2)
          .as("reorder_point_units"),
        round(col("d").cast("double") /
          sqrt(lit(2.0) * col("d").cast("double") * lit(100.0) /
            (lit(0.2) * col("cents").cast("double") / 100 /
              col("d").cast("double"))), 2).as("orders_per_horizon"))
      .orderBy(desc("demand_units"), asc("p_brand"))
      .limit(15)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_removaleffect" -> (extRemovaleffect _),
    "ext_mapk" -> (extMapk _),
    "ext_eoq" -> (extEoq _))

  private val chainSql =
    """ev as (select user_id, event_type, ts, event_id,
      |    cast(row_number() over (partition by user_id
      |      order by ts, event_id) as bigint) rn
      |  from events),
      |fp as (select user_id, min(rn) fpn from ev
      |  where event_type = 'purchase' group by 1),
      |trimmed as (select ev.user_id, ev.event_type, ev.ts, ev.event_id,
      |    ev.rn
      |  from ev left join fp on fp.user_id = ev.user_id
      |  where fp.fpn is null or ev.rn <= fp.fpn),
      |seq as (select user_id, event_type,
      |    coalesce(lag(event_type) over (partition by user_id
      |      order by ts, event_id), '_start') prev
      |  from trimmed),
      |counts as (select prev f, event_type tt,
      |    cast(count(*) as bigint) c
      |  from seq group by 1, 2),
      |tot as (select f, cast(sum(c) as bigint) ct from counts group by 1),
      |probs as (select counts.f, tt,
      |    cast(round(cast(c as double) * 1e9 / ct) as bigint) p
      |  from counts join tot on tot.f = counts.f),
      |scen as (select unnest(['none', 'click', 'error', 'signup',
      |    'view']) scenario),
      |strans as (select scenario, f, tt, p
      |  from scen cross join probs
      |  where scenario = 'none' or (f <> scenario and tt <> scenario)),
      |states as (select distinct f state from probs
      |  union select distinct tt from probs),
      |a0 as (select scenario, state,
      |    case when state = 'purchase'
      |      then cast(1000000000 as bigint) else cast(0 as bigint) end a
      |  from scen cross join states)""".stripMargin

  private def stepSql(k: Int): String = {
    val prev = if (k == 1) "a0" else s"a${k - 1}"
    s"""a$k as (select * from (
       |    select s.scenario, s.f state,
       |      cast((sum(s.p * a.a) + 500000000) // 1000000000 as bigint) a
       |    from strans s join $prev a
       |      on a.scenario = s.scenario and a.state = s.tt
       |    group by 1, 2)
       |  where state <> 'purchase'
       |  union all
       |  select scenario, 'purchase', cast(1000000000 as bigint)
       |  from scen)""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    // E-370: identical chain build, 6 exact integer steps, removal form.
    "ext_removaleffect" ->
      s"""with $chainSql,
        |${(1 to 6).map(stepSql).mkString(",\n")},
        |conv as (select scenario, a from a6 where state = '_start'),
        |base as (select a ab from conv where scenario = 'none'),
        |eff as (select scenario channel,
        |    round(cast(ab as double) / 1e9, 6) conv_base,
        |    round(cast(a as double) / 1e9, 6) conv_removed,
        |    ab - a d, ab
        |  from conv cross join base
        |  where scenario <> 'none'),
        |sums as (select cast(sum(d) as bigint) sd from eff)
        |select channel, conv_base, conv_removed,
        |  round(cast(d as double) / ab, 6) removal_effect,
        |  round(case when sd > 0 then cast(d as double) / sd end, 6)
        |    effect_share
        |from eff cross join sums
        |order by channel""".stripMargin,

    // E-371: identical ranked frame (E-67 oracle CTEs), quantized
    // precision terms, the same AP and MAP folds.
    "ext_mapk" ->
      """with n as (select vec_id, label, embedding e,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> cast(x as double) * x))) nrm
        |  from embeddings),
        |pr as (select vec_id probe_id, label plabel, e pv, nrm pnrm
        |  from n where vec_id % 97 = 0 order by vec_id limit 128),
        |sc as (select probe_id, vec_id, plabel, label,
        |    round(list_sum(list_transform(n.e,
        |      (x, i) -> cast(x as double) * pv[i])) / (nrm * pnrm), 4) cos
        |  from n cross join pr where vec_id <> probe_id),
        |rk as (select probe_id, vec_id,
        |    case when label = plabel then 1 else 0 end rel,
        |    cast(row_number() over (partition by probe_id
        |      order by cos desc, vec_id) as bigint) rk
        |  from sc),
        |cum as (select probe_id, rel, rk,
        |    cast(sum(rel) over (partition by probe_id order by rk)
        |      as bigint) cum
        |  from rk),
        |per as (select probe_id,
        |    cast(sum(case when rk <= 10 and rel = 1
        |      then cast(round(cast(cum as double) * 1e9 / rk) as bigint)
        |      else 0 end) as bigint) apnum,
        |    cast(sum(rel) as bigint) nrel
        |  from cum group by 1),
        |ap as (select cast(round(cast(apnum as double) /
        |      cast(least(nrel, 10) as double)) as bigint) apq
        |  from per where nrel > 0)
        |select cast(count(*) as bigint) n_probes,
        |  round(avg(cast(apq as double)) / 1e9, 6) map_at_10
        |from ap""".stripMargin,

    // E-372: identical demand-weighted holding, EOQ closed form.
    "ext_eoq" ->
      """with li as (select p_brand,
        |    cast(l_quantity as bigint) q,
        |    cast(round(l_extendedprice * 100) as bigint) cents,
        |    cast(l_shipdate as date) sd
        |  from lineitem join part on p_partkey = l_partkey),
        |cal as (select cast(count(distinct sd) as bigint) n_days from li),
        |b as (select p_brand, cast(sum(q) as bigint) d,
        |    cast(sum(cents) as bigint) cents
        |  from li group by 1)
        |select p_brand, d demand_units,
        |  round(sqrt(2.0 * cast(d as double) * 100.0 /
        |    (0.2 * cast(cents as double) / 100 / cast(d as double))), 2)
        |    eoq_units,
        |  round(0.2 * cast(cents as double) / 100 / cast(d as double), 4)
        |    holding_per_unit,
        |  round(cast(d as double) * 7 / n_days, 2) reorder_point_units,
        |  round(cast(d as double) /
        |    sqrt(2.0 * cast(d as double) * 100.0 /
        |      (0.2 * cast(cents as double) / 100 / cast(d as double))), 2)
        |    orders_per_horizon
        |from b cross join cal
        |order by demand_units desc, p_brand limit 15""".stripMargin)
}
