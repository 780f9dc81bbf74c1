package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 extension queries, batch 112: classic mining completions —
  * Apriori level 3 with candidate pruning (E-59 stopped at order-2
  * rules; the level-wise candidate-generation step is the algorithm's
  * actual signature move) and a Markov next-event backtest (E-? built
  * the transition matrix; this SCORES it — a model row is only worth
  * keeping if its predictions beat the marginal guess).
  */
object ExtensionQueries112 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-452 Apriori level-3 frequent itemsets --------------------------------------
  // Level-wise mining on order→brand baskets: L2 = frequent brand
  // pairs (support ≥ 20 baskets), C3 = candidates joined from L2 on a
  // shared prefix — the Apriori PRUNE: a triple is counted only if
  // BOTH generating pairs are frequent (the third sub-pair check
  // happens for free at count time, infrequent triples just miss
  // support) — then L3 = candidates with support ≥ 20 counted by one
  // per-basket membership join. Never enumerates all C(brands, 3)
  // triples; candidate count is bounded by |L2|², itself bounded by
  // frequency. Baskets are per-order DISTINCT brands so no multiset
  // inflation.
  def extApriori3(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .join(t(s, dir, "part").select(col("p_partkey"),
        col("p_brand")), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("bk"), col("p_brand").as("it"))
      .distinct()
      .localCheckpoint()
    val minSup = 20L
    val l2 = items.select(col("bk"), col("it").as("a"))
      .join(items.select(col("bk"), col("it").as("b")), Seq("bk"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minSup)
      .localCheckpoint()
    // C3: join L2(a,b) × L2(a,c) on the shared first item, b < c;
    // prune to candidates whose (b, c) pair is ALSO in L2
    val c3 = l2.select(col("a"), col("b"))
      .join(l2.select(col("a"), col("b").as("c")), Seq("a"))
      .filter(col("b") < col("c"))
      .join(l2.select(col("a").as("b"), col("b").as("c")), Seq("b", "c"),
        "left_semi")
    // L3 support is counted by generating each basket's own ordered
    // triples (baskets are per-order DISTINCT brands, so they are small)
    // and semi-filtering against the pruned C3. The previous form
    // attached candidates to baskets by joining on the FIRST item — a
    // ~25-value brand key — fanning out to |C3|·(basket rows per brand)
    // ≈ tens of millions of rows before its two semi-join rechecks;
    // per-basket generation emits O(Σ C(|basket|,3)) rows instead. Same
    // triples, same supports: a<b<c makes (bk,a,b,c) unique, so the
    // count(1) equals the old countDistinct(bk).
    val l3 = items.select(col("bk"), col("it").as("a"))
      .join(items.select(col("bk"), col("it").as("b")), Seq("bk"))
      .filter(col("a") < col("b"))
      .join(items.select(col("bk"), col("it").as("c")), Seq("bk"))
      .filter(col("b") < col("c"))
      .join(c3, Seq("a", "b", "c"), "left_semi")
      .groupBy("a", "b", "c").agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSup)
    l3.orderBy(desc("support"), asc("a"), asc("b"), asc("c"))
      .limit(20)
  }

  // ---- E-453 Markov next-event backtest ----------------------------------------------
  // Score the first-order transition model: for each user the stream
  // is split per-event — the model predicts argmax P(next | current)
  // from transition COUNTS over the whole stream (counts desc, type
  // asc ties), the baseline predicts the global modal event type.
  // Accuracy of both as exact integer hits + half-up bp — the model
  // earns its row only if acc_model > acc_base. One lead() pass for
  // (from, to) truths, one counts table join — no per-user loops.
  def extMarkovEval(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("event_id"))
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val steps = ev
      .withColumn("to_s", lead(col("event_type"), 1).over(w))
      .filter(col("to_s").isNotNull)
      .select(col("event_type").as("from_s"), col("to_s"))
      .localCheckpoint()
    val pred = steps.groupBy("from_s", "to_s").agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(Window.partitionBy("from_s")
        .orderBy(desc("n"), asc("to_s"))))
      .filter(col("rk") === 1)
      .select(col("from_s"), col("to_s").as("pred"))
      .limit(32) // structural bound: one row per event type
    val base = steps.groupBy("to_s").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("to_s")).limit(1)
      .select(col("to_s").as("bpred"))
    steps.join(broadcast(pred), Seq("from_s"))
      .crossJoin(broadcast(base))
      .agg(count(lit(1)).as("n_steps"),
        sum(when(col("to_s") === col("pred"), 1L).otherwise(0L))
          .as("hits_model"),
        sum(when(col("to_s") === col("bpred"), 1L).otherwise(0L))
          .as("hits_base"))
      .select(col("n_steps"), col("hits_model"), col("hits_base"),
        expr("(20000 * hits_model + n_steps) DIV (2 * n_steps)")
          .as("acc_model_bp"),
        expr("(20000 * hits_base + n_steps) DIV (2 * n_steps)")
          .as("acc_base_bp"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_apriori3" -> (extApriori3 _),
    "ext_markov_eval" -> (extMarkovEval _))

  val oracleSql: Map[String, String] = Map(
    // E-452: identical level-wise generation and prune.
    "ext_apriori3" ->
      """with items as (select distinct l_orderkey bk, p_brand it
        |  from lineitem join part on l_partkey = p_partkey),
        |l2 as (select a.it a, b.it b, count(*) n
        |  from items a join items b on a.bk = b.bk and a.it < b.it
        |  group by 1, 2 having count(*) >= 20),
        |c3 as (select x.a, x.b, y.b c from l2 x join l2 y
        |    on x.a = y.a and x.b < y.b
        |  where exists (select 1 from l2 z where z.a = x.b and z.b = y.b)),
        |l3 as (select c3.a, c3.b, c3.c, count(distinct ia.bk) support
        |  from c3 join items ia on ia.it = c3.a
        |  where exists (select 1 from items ib
        |      where ib.bk = ia.bk and ib.it = c3.b)
        |    and exists (select 1 from items ic
        |      where ic.bk = ia.bk and ic.it = c3.c)
        |  group by 1, 2, 3 having count(distinct ia.bk) >= 20)
        |select a, b, c, support from l3
        |order by support desc, a, b, c limit 20""".stripMargin,

    // E-453: identical transition truths, argmax, and bp idiom.
    "ext_markov_eval" ->
      """with ev as (select user_id, event_type,
        |    epoch_us(cast(ts as timestamp)) us, event_id from events),
        |steps as (select event_type from_s,
        |    lead(event_type) over (partition by user_id
        |      order by us, event_id) to_s from ev),
        |st as (select from_s, to_s from steps where to_s is not null),
        |pred as (select from_s, to_s pred from (
        |    select from_s, to_s, row_number() over (partition by from_s
        |      order by count(*) desc, to_s) rk
        |    from st group by from_s, to_s) t where rk = 1),
        |base as (select to_s bpred from (
        |    select to_s, count(*) n from st group by to_s) t
        |  order by n desc, to_s limit 1),
        |sc as (select count(*) n_steps,
        |    cast(count(*) filter (where st.to_s = p.pred) as bigint)
        |      hits_model,
        |    cast(count(*) filter (where st.to_s = b.bpred) as bigint)
        |      hits_base
        |  from st join pred p on p.from_s = st.from_s, base b)
        |select n_steps, hits_model, hits_base,
        |  cast((20000 * hits_model + n_steps) // (2 * n_steps) as bigint)
        |    acc_model_bp,
        |  cast((20000 * hits_base + n_steps) // (2 * n_steps) as bigint)
        |    acc_base_bp
        |from sc""".stripMargin)
}
