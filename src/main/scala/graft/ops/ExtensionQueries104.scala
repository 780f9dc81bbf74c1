package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 extension queries, batch 104: multi-touch attribution (the
  * credit-splitting models beyond E-145's last-touch) and an
  * entity-resolution blocking audit (reduction ratio + pair
  * completeness — the honest-knob measurement for ANY blocked fuzzy
  * join, computed without materializing a single candidate pair).
  */
object ExtensionQueries104 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-441 multi-touch attribution ----------------------------------------------
  // Every purchase splits 1,000,000 micro-credits across that user's
  // strictly-prior touches, two models side by side: LINEAR (equal
  // split, 1e6 DIV k each, integer remainder to the MOST RECENT touch
  // so each purchase's credits sum to exactly 1e6) and TIME-DECAY
  // (dyadic halving by recency rank, 1e6 >> r — exact integers, no
  // float decay constant). Per-user purchase×prior-touch pair join —
  // bounded by touches-per-user, the E-145 per-user frame discipline;
  // ranks/counts from one (user, purchase) window. Output: credit
  // totals per touch channel — which behaviors actually precede
  // conversion, weighted two ways.
  def extAttribMulti(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("event_id"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us").as("p_us"),
        col("event_id").as("p_eid"))
    val touch = ev.filter(col("event_type") =!= "purchase")
    val pairs = touch.join(purch, Seq("user_id"))
      .filter(struct(col("us"), col("event_id")) <
        struct(col("p_us"), col("p_eid")))
    val w = Window.partitionBy("user_id", "p_eid")
    val ranked = pairs
      .withColumn("r", row_number().over(
        w.orderBy(desc("us"), desc("event_id"))))
      .withColumn("k", count(lit(1)).over(w))
    ranked
      .select(col("event_type"),
        (expr("CAST(1000000 AS BIGINT) DIV k") +
          when(col("r") === 1,
            lit(1000000L) - col("k") * expr("CAST(1000000 AS BIGINT) DIV k"))
            .otherwise(lit(0L))).as("lin"),
        when(col("r") <= 19,
          expr("shiftright(CAST(1000000 AS BIGINT), CAST(r AS INT))"))
          .otherwise(lit(0L)).as("dec_c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_touches"), sum("lin").as("linear_credit"),
        sum("dec_c").as("decay_credit"))
      .orderBy("event_type")
  }

  // ---- E-442 blocking audit: reduction ratio + pair completeness ------------------
  // How good is prefix-4 blocking for the E-37 fuzzy join? Two honest
  // numbers: REDUCTION RATIO (share of the all-pairs space the
  // blocker prunes — from per-block counts Σ C(n_b,2), never a
  // materialized pair) and PAIR COMPLETENESS (share of true
  // edit-distance-1..2 pairs that land in one block — truth from the
  // exact-recall length-banded join, bounded, never all-pairs). Both
  // reported as half-up basis points via the (2·10000·x + y) DIV (2y)
  // integer idiom — no ratio ever floats. The E-407 sketch-error
  // discipline applied to ER blocking: measure the knob, don't trust
  // it.
  def extBlockaudit(s: SparkSession, dir: String): DataFrame = {
    val names = t(s, dir, "part").select("p_name").distinct()
    val truth = BandJoin.joinWithin(
        names.select(col("p_name").as("na")), length(col("na")),
        names.select(col("p_name").as("nb")), length(col("nb")),
        width = 2,
        extra = col("na") < col("nb") &&
          levenshtein(col("na"), col("nb")).between(1, 2))
      .select(col("na"), col("nb"))
    val caught = truth
      .filter(substring(col("na"), 1, 4) === substring(col("nb"), 1, 4))
    val blocks = names
      .groupBy(substring(col("p_name"), 1, 4).as("pfx"))
      .agg(count(lit(1)).as("nb_"))
      .agg(sum(expr("nb_ * (nb_ - 1) DIV 2")).cast("long").as("n_cand"))
    val counts = names.agg(count(lit(1)).as("n_names"))
      .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_truth")).limit(1)))
      .crossJoin(broadcast(caught.agg(count(lit(1)).as("n_caught")).limit(1)))
      .crossJoin(broadcast(blocks.limit(1)))
    counts.select(col("n_names"), col("n_truth"), col("n_caught"),
        col("n_cand"),
        expr("(20000 * n_caught + n_truth) DIV (2 * n_truth)").as("pc_bp"),
        expr("""(20000 * (n_names * (n_names - 1) DIV 2 - n_cand)
                 + n_names * (n_names - 1) DIV 2)
                DIV (2 * (n_names * (n_names - 1) DIV 2))""").as("rr_bp"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_attrib_multi" -> (extAttribMulti _),
    "ext_blockaudit" -> (extBlockaudit _))

  val oracleSql: Map[String, String] = Map(
    // E-441: identical pair join, ranks, and integer credit algebra.
    "ext_attrib_multi" ->
      """with ev as (select user_id, event_type,
        |    epoch_us(cast(ts as timestamp)) us, event_id from events),
        |purch as (select user_id, us p_us, event_id p_eid from ev
        |  where event_type = 'purchase'),
        |touch as (select * from ev where event_type <> 'purchase'),
        |pairs as (select t.event_type, t.user_id, p.p_eid,
        |    row_number() over (partition by t.user_id, p.p_eid
        |      order by t.us desc, t.event_id desc) r,
        |    count(*) over (partition by t.user_id, p.p_eid) k
        |  from touch t join purch p on t.user_id = p.user_id
        |    and (t.us, t.event_id) < (p.p_us, p.p_eid)),
        |credits as (select event_type,
        |    cast(1000000 // k + case when r = 1
        |      then 1000000 - k * (1000000 // k) else 0 end as bigint) lin,
        |    cast(case when r <= 19 then 1000000 >> r else 0 end
        |      as bigint) dec_c
        |  from pairs)
        |select event_type, count(*) n_touches,
        |  cast(sum(lin) as bigint) linear_credit,
        |  cast(sum(dec_c) as bigint) decay_credit
        |from credits group by event_type order by event_type""".stripMargin,

    // E-442: identical truth join, block counts, and bp idiom.
    "ext_blockaudit" ->
      """with names as (select distinct p_name from part),
        |truth as (select a.p_name na, b.p_name nb
        |  from names a join names b
        |    on abs(length(a.p_name) - length(b.p_name)) <= 2
        |    and a.p_name < b.p_name
        |    and levenshtein(a.p_name, b.p_name) between 1 and 2),
        |caught as (select count(*) n_caught from truth
        |  where substr(na, 1, 4) = substr(nb, 1, 4)),
        |cand as (select cast(sum(nb_ * (nb_ - 1) // 2) as bigint) n_cand
        |  from (select substr(p_name, 1, 4) pfx, count(*) nb_
        |        from names group by 1) t),
        |base as (select count(*) n_names from names),
        |tr as (select count(*) n_truth from truth)
        |select n_names, n_truth, n_caught, n_cand,
        |  cast((20000 * n_caught + n_truth) // (2 * n_truth) as bigint) pc_bp,
        |  cast((20000 * (n_names * (n_names - 1) // 2 - n_cand)
        |        + n_names * (n_names - 1) // 2)
        |       // (2 * (n_names * (n_names - 1) // 2)) as bigint) rr_bp
        |from base, tr, caught, cand""".stripMargin)
}
