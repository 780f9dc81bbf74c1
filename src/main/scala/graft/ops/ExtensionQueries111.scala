package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 extension queries, batch 111: warehouse governance ops —
  * the right-to-be-forgotten sweep (erasure + PROOF of erasure in one
  * relation) and incremental surrogate-key assignment (dense ids that
  * survive incremental loads without renumbering history).
  */
object ExtensionQueries111 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-450 right-to-be-forgotten sweep --------------------------------------------
  // Erasure is an anti-join; the hard part is the AUDIT: per table,
  // rows matched, rows surviving, and a residual-trace count that
  // MUST be zero (the regulator's question). The forget-list is the
  // 5 heaviest event users (deterministic); events and customer are
  // swept (events on user_id, customer on c_custkey). At 100 TB the
  // sweep is a partition-pruned rewrite of only the partitions whose
  // min/max span a forgotten key — the relational shape (broadcast
  // anti-join) is unchanged.
  def extForget(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val forget = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("user_id")).limit(5)
      .select(col("user_id").as("fid"))
      .localCheckpoint()
    def sweep(tbl: DataFrame, key: String, name: String): DataFrame = {
      val matched = tbl.join(broadcast(forget), tbl(key) === col("fid"),
        "left_semi")
      val survived = tbl.join(broadcast(forget), tbl(key) === col("fid"),
        "left_anti")
      val residual = survived.join(broadcast(forget),
        survived(key) === col("fid"), "left_semi")
      matched.agg(count(lit(1)).as("n_erased"))
        .crossJoin(broadcast(survived.agg(count(lit(1)).as("n_survived"))
          .limit(1)))
        .crossJoin(broadcast(residual.agg(count(lit(1)).as("n_residual"))
          .limit(1)))
        .select(lit(name).as("tbl"), col("n_erased"), col("n_survived"),
          col("n_residual"))
    }
    sweep(ev, "user_id", "events")
      .unionAll(sweep(t(s, dir, "customer"), "c_custkey", "customer"))
      .orderBy("tbl")
  }

  // ---- E-451 incremental surrogate keys ---------------------------------------------
  // Dense warehouse keys across incremental loads: load 1 (parts with
  // p_partkey ≤ 400) assigns 1..n by the deterministic member order;
  // load 2 (all parts) must KEEP every existing key and extend new
  // members from the high-water mark — no renumbering, no gaps,
  // idempotent re-run. One anti-join + one row_number over the new
  // slice + a 1-row high-water broadcast; at scale the window runs on
  // the NEW members only (the W-7 note stays confined to the delta).
  def extSurrogate(s: SparkSession, dir: String): DataFrame = {
    val all = t(s, dir, "part").select(col("p_name")).distinct()
    val batch1 = all.filter(length(col("p_name")) % 2 === 0)
    val w = Window.orderBy("p_name")
    val dim1 = batch1.withColumn("sk", row_number().over(w).cast("long"))
      .localCheckpoint()
    val hw = dim1.agg(coalesce(max("sk"), lit(0L)).as("hw")).limit(1)
    val newbies = all.join(dim1.select("p_name"), Seq("p_name"), "left_anti")
      .withColumn("rn", row_number().over(w))
      .crossJoin(broadcast(hw))
      .select(col("p_name"), (col("hw") + col("rn")).as("sk"))
    val dim2 = dim1.unionAll(newbies)
    dim2.agg(count(lit(1)).as("n_members"), min("sk").as("min_sk"),
        max("sk").as("max_sk"),
        countDistinct("sk").as("n_distinct_sk"),
        sum(when(col("sk") <= 0, 1L).otherwise(0L)).as("n_bad"))
      .crossJoin(broadcast(
        dim2.orderBy(desc("sk"), asc("p_name")).limit(3)
          // sort the collected structs (collect_list alone is unordered)
          .agg(concat_ws("|", transform(
            reverse(sort_array(collect_list(struct(col("sk"), col("p_name"))))),
            x => x.getField("p_name"))).as("top3"))
          .limit(1)))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_forget" -> (extForget _),
    "ext_surrogate" -> (extSurrogate _))

  val oracleSql: Map[String, String] = Map(
    // E-450: identical forget-list and anti-join audit.
    "ext_forget" ->
      """with f as (select user_id fid from (
        |    select user_id, count(*) n from events group by 1) t
        |  order by n desc, user_id limit 5),
        |ev as (select
        |    count(*) filter (where user_id in (select fid from f)) n_erased,
        |    count(*) filter (where user_id not in (select fid from f))
        |      n_survived
        |  from events),
        |cu as (select
        |    count(*) filter (where c_custkey in (select fid from f)) n_erased,
        |    count(*) filter (where c_custkey not in (select fid from f))
        |      n_survived
        |  from customer)
        |select 'customer' tbl, n_erased, n_survived,
        |  cast(0 as bigint) n_residual from cu
        |union all
        |select 'events', n_erased, n_survived, cast(0 as bigint) from ev
        |order by tbl""".stripMargin,

    // E-451: identical two-load key algebra.
    "ext_surrogate" ->
      """with a as (select distinct p_name from part),
        |b1 as (select p_name from a where length(p_name) % 2 = 0),
        |d1 as (select p_name,
        |    cast(row_number() over (order by p_name) as bigint) sk from b1),
        |hw as (select coalesce(max(sk), 0) hw from d1),
        |nb as (select p_name, cast(h.hw + row_number()
        |      over (order by p_name) as bigint) sk
        |  from (select p_name from a where p_name not in
        |    (select p_name from d1)) n, hw h),
        |d2 as (select p_name, sk from d1 union all select p_name, sk from nb),
        |agg as (select count(*) n_members, min(sk) min_sk, max(sk) max_sk,
        |    count(distinct sk) n_distinct_sk,
        |    cast(count(*) filter (where sk <= 0) as bigint) n_bad from d2),
        |t3 as (select string_agg(p_name, '|' order by sk desc) top3 from (
        |  select p_name, sk from d2 order by sk desc, p_name limit 3) t)
        |select n_members, min_sk, max_sk, n_distinct_sk, n_bad, top3
        |from agg, t3""".stripMargin)
}
