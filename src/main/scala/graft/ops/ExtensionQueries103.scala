package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 extension queries, batch 103: time-respecting reachability
  * (the honest propagation model for event data — static reachability
  * overstates what can actually spread forward in time) and order-2
  * sequential pattern support (which behavior pairs actually happen
  * in sequence, the mining step behind funnel design).
  */
object ExtensionQueries103 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-439 temporal reachability ------------------------------------------------
  // Earliest-arrival search from suppliers S1..S3 over the
  // supplier–part graph where each link carries its SHIP DATES: a
  // disruption starting at S1 on day 0 reaches part P only through
  // chains of shipments with non-decreasing dates. 3 relaxation
  // rounds (≤3 time-respecting edges); arrivals are exact integer
  // days since 1992-01-01. Output per seed: reach count + the arrival
  // mass (sum/max of arrival days) — the propagation-speed profile.
  def extTempreach(s: SparkSession, dir: String): DataFrame = {
    // long-encoded node ids (SpIds): the temporal-edge distinct and
    // every relaxation round shuffle key on longs; seeds decode at the
    // output boundary only
    val pe = t(s, dir, "lineitem")
      .select(SpIds.s(col("l_suppkey")).as("sn"),
        SpIds.p(col("l_partkey")).as("pn"),
        datediff(col("l_shipdate").cast("date"), lit("1992-01-01"))
          .cast("long").as("d"))
      .distinct()
    val edges = pe.select(col("sn").as("src"), col("pn").as("dst"),
        col("d").as("t"))
      .unionAll(pe.select(col("pn").as("src"), col("sn").as("dst"),
        col("d").as("t")))
    val spark = s
    import spark.implicits._
    val sources = (1 to 3).map(i => (2L * i, 2L * i)).toDF("seed", "id")
    TemporalReach.earliestArrival(edges, sources, rounds = 3)
      .filter(col("id") =!= col("seed"))
      .groupBy("seed")
      .agg(count(lit(1)).as("reached"), sum("arr").as("sum_arr"),
        max("arr").as("max_arr"))
      .select(SpIds.decode(col("seed")).as("seed"), col("reached"),
        col("sum_arr"), col("max_arr"))
      .orderBy("seed")
  }

  // ---- E-440 sequential pattern support -------------------------------------------
  // Support of every ordered event-type pair (a THEN b) as a user
  // SUBSEQUENCE: user counts iff their first a strictly precedes
  // their last b under the total (ts, event_id) order — the exact
  // existence test for "a ... b" (first-occurrence greedy), no
  // per-user scan of the O(n²) pair space. One (user, type) profile
  // aggregate + a per-user 5×5 self-join + a 5-row marginal
  // broadcast: linear in events at any scale. (a, a) rows read as
  // "did it happen at least twice". The E-59 itemset slice ignores
  // ORDER; this is the sequence-aware upgrade.
  def extSeqpat(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("event_id"))
    val prof = ev.groupBy("user_id", "event_type")
      .agg(min(struct(col("us"), col("event_id"))).as("first_oc"),
        max(struct(col("us"), col("event_id"))).as("last_oc"))
    val marg = prof.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"))
      .limit(32) // structural bound: one row per event type
    val pairs = prof.select(col("user_id"),
        col("event_type").as("t_first"), col("first_oc"))
      .join(prof.select(col("user_id"), col("event_type").as("t_then"),
        col("last_oc")), Seq("user_id"))
      .filter(col("first_oc") < col("last_oc"))
      .groupBy("t_first", "t_then")
      .agg(count(lit(1)).as("support"))
    pairs
      .join(broadcast(marg.select(col("event_type").as("t_first"),
        col("n_users").as("n_first"))), Seq("t_first"))
      .join(broadcast(marg.select(col("event_type").as("t_then"),
        col("n_users").as("n_then"))), Seq("t_then"))
      .select(col("t_first"), col("t_then"), col("support"),
        col("n_first"), col("n_then"))
      .orderBy("t_first", "t_then")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_tempreach" -> (extTempreach _),
    "ext_seqpat" -> (extSeqpat _))

  // E-439 oracle: identical unrolled earliest-arrival rounds (full
  // relaxation ≡ the frontier-pruned form, see TemporalReach).
  private def tempreachOracle(rounds: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """with pe as (select distinct 'S' || l_suppkey sn, 'P' || l_partkey pn,
        |    date_diff('day', DATE '1992-01-01', cast(l_shipdate as date)) d
        |  from lineitem),
        |e as (select sn src, pn dst, d tt from pe
        |      union all select pn, sn, d from pe),
        |a0 as (select 'S' || g seed, 'S' || g id, cast(0 as bigint) arr
        |  from generate_series(1, 3) t(g)),
        |""".stripMargin)
    for (k <- 1 to rounds) {
      sb.append(s"a$k as (select seed, id, min(arr) arr from (")
      sb.append(s"select seed, id, arr from a${k - 1} union all ")
      sb.append(s"select f.seed, e.dst id, cast(e.tt as bigint) arr ")
      sb.append(s"from a${k - 1} f join e on e.src = f.id and e.tt >= f.arr")
      sb.append(s") t group by seed, id)")
      sb.append(if (k < rounds) ",\n" else "\n")
    }
    sb.append(s"select seed, count(*) reached, ")
    sb.append(s"cast(sum(arr) as bigint) sum_arr, max(arr) max_arr ")
    sb.append(s"from a$rounds where id <> seed group by seed order by seed")
    sb.toString
  }

  val oracleSql: Map[String, String] = Map(
    "ext_tempreach" -> tempreachOracle(3),

    // E-440: identical (first, last) profile + strict tuple compare.
    "ext_seqpat" ->
      """with ev as (select user_id, event_type,
        |    epoch_us(cast(ts as timestamp)) us, event_id from events),
        |prof as (select user_id, event_type,
        |    min(row(us, event_id)) first_oc, max(row(us, event_id)) last_oc
        |  from ev group by user_id, event_type),
        |marg as (select event_type, count(*) n_users from prof group by 1),
        |pairs as (select a.event_type t_first, b.event_type t_then,
        |    count(*) support
        |  from prof a join prof b on a.user_id = b.user_id
        |  where a.first_oc < b.last_oc
        |  group by 1, 2)
        |select t_first, t_then, support, f.n_users n_first, g.n_users n_then
        |from pairs join marg f on f.event_type = t_first
        |           join marg g on g.event_type = t_then
        |order by t_first, t_then""".stripMargin)
}
