package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 51: sequence similarity, supply
  * risk, and incident detection — journey edit distance over per-user
  * event strings, single-source supplier concentration flags, and
  * error-burst incidents via gaps-and-islands on the error stream.
  */
object ExtensionQueries51 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-309 journey edit distance -----------------------------------------------
  // How similar are user journeys as SEQUENCES? Each user's ordered
  // event-type initials collapse into a string (c/e/p/s/v under the
  // (ts, event_id) total order); pairwise Levenshtein over the
  // user-pair frame — both engines ship the same DP builtin — ranked
  // ascending on the normalized distance. The sequence view the
  // set-based journey ops (E-207/E-211) can't give.
  def extJourneydist(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val strs = t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("ch"))
      .withColumn("rn", row_number().over(w))
      .groupBy("user_id")
      .agg(concat_ws("",
        transform(array_sort(collect_list(struct(col("rn"), col("ch")))),
          x => x.getField("ch"))).as("j"))
      .withColumn("len", length(col("j")).cast("long"))
    val pairs = strs.select(col("user_id").as("ua"), col("j").as("ja"),
        col("len").as("la"))
      .crossJoin(strs.select(col("user_id").as("ub"), col("j").as("jb"),
        col("len").as("lb")))
      .filter(col("ua") < col("ub"))
      .select(col("ua"), col("ub"), col("la"), col("lb"),
        levenshtein(col("ja"), col("jb")).cast("long").as("dist"))
      .withColumn("norm_dist",
        round(col("dist").cast("double") / greatest(col("la"), col("lb")),
          6))
    pairs.orderBy(asc("norm_dist"), asc("ua"), asc("ub")).limit(15)
  }

  // ---- E-310 single-source supplier risk -----------------------------------------
  // Parts whose top supplier carries > 50% of shipped quantity — the
  // procurement risk register. Shares decided by INTEGER
  // cross-multiply (2·top_qty > total_qty); top supplier per part by
  // (qty desc, suppkey) rank. Top-15 by top share.
  def extSinglesource(s: SparkSession, dir: String): DataFrame = {
    val q = t(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .agg(sum(col("l_quantity").cast("long")).as("qty"))
    val w = Window.partitionBy("pk").orderBy(desc("qty"), asc("sk"))
    val ranked = q.withColumn("rk", row_number().over(w))
      .withColumn("total", sum("qty").over(Window.partitionBy("pk")))
      .withColumn("n_suppliers",
        count(lit(1)).over(Window.partitionBy("pk")))
    ranked.filter(col("rk") === 1)
      .select(col("pk"), col("sk").as("top_supplier"),
        col("n_suppliers"), col("qty").as("top_qty"), col("total"),
        round(col("qty").cast("double") / col("total"), 4)
          .as("top_share"),
        (col("qty") * 2 > col("total")).as("single_source_risk"))
      .orderBy(desc("top_share"), asc("pk"))
      .limit(15)
  }

  // ---- E-311 error-burst incidents -----------------------------------------------
  // Incident profiling over the error stream: bursts = islands of
  // errors per user with < 6-hour internal gaps (gaps-and-islands
  // anchors, E-216 discipline), reported as the per-user burst
  // profile — island count, worst burst size, longest burst — all
  // integer; the alerting view beside E-280's velocity flags and
  // ST-18's live counters. (No minimum-size cut: the profile stays
  // populated at every fixture scale; an alert rule thresholds it.)
  def extErrorbursts(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val e = t(s, dir, "events")
      .filter(col("event_type") === "error")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .withColumn("anchor",
        when(lag("us", 1).over(w).isNull ||
          col("us") - lag("us", 1).over(w) >= 21600L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("island", sum("anchor").over(w))
    val islands = e.groupBy("user_id", "island")
      .agg(count(lit(1)).as("n_errors"),
        ((max("us") - min("us")) / 60000000L).cast("long")
          .as("duration_min"))
    islands.groupBy("user_id")
      .agg(count(lit(1)).as("n_incidents"),
        max("n_errors").as("worst_burst"),
        max("duration_min").as("longest_min"))
      .orderBy(desc("n_incidents"), desc("worst_burst"), asc("user_id"))
      .limit(15)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_journeydist" -> (extJourneydist _),
    "ext_singlesource" -> (extSinglesource _),
    "ext_errorbursts" -> (extErrorbursts _))

  val oracleSql: Map[String, String] = Map(
    // E-309: identical journey strings and Levenshtein DP.
    "ext_journeydist" ->
      """with o as (select user_id, substring(event_type, 1, 1) ch,
        |    row_number() over (partition by user_id
        |      order by ts, event_id) rn
        |  from events),
        |strs as (select user_id, string_agg(ch, '' order by rn) j
        |  from o group by user_id),
        |ls as (select user_id, j, cast(length(j) as bigint) len from strs)
        |select a.user_id ua, b.user_id ub, a.len la, b.len lb,
        |  cast(levenshtein(a.j, b.j) as bigint) dist,
        |  round(cast(levenshtein(a.j, b.j) as double) /
        |    greatest(a.len, b.len), 6) norm_dist
        |from ls a join ls b on a.user_id < b.user_id
        |order by norm_dist, ua, ub limit 15""".stripMargin,

    // E-310: identical rank and cross-multiplied risk flag.
    "ext_singlesource" ->
      """with q as (select l_partkey pk, l_suppkey sk,
        |    cast(sum(cast(l_quantity as bigint)) as bigint) qty
        |  from lineitem group by 1, 2),
        |r as (select pk, sk, qty,
        |    row_number() over (partition by pk
        |      order by qty desc, sk) rk,
        |    cast(sum(qty) over (partition by pk) as bigint) total,
        |    cast(count(*) over (partition by pk) as bigint) n_suppliers
        |  from q)
        |select pk, sk top_supplier, n_suppliers, qty top_qty, total,
        |  round(cast(qty as double) / total, 4) top_share,
        |  qty * 2 > total single_source_risk
        |from r where rk = 1
        |order by top_share desc, pk limit 15""".stripMargin,

    // E-311: identical island anchors and incident thresholds.
    "ext_errorbursts" ->
      """with e as (select user_id, epoch_us(ts) us, event_id,
        |    case when lag(epoch_us(ts)) over (partition by user_id
        |        order by epoch_us(ts), event_id) is null
        |      or epoch_us(ts) - lag(epoch_us(ts)) over (partition by
        |        user_id order by epoch_us(ts), event_id) >= 21600000000
        |      then 1 else 0 end anchor
        |  from events where event_type = 'error'),
        |isl as (select user_id, us, event_id,
        |    sum(anchor) over (partition by user_id order by us, event_id
        |      rows unbounded preceding) island
        |  from e),
        |islands as (select user_id, island,
        |    cast(count(*) as bigint) n_errors,
        |    cast((max(us) - min(us)) // 60000000 as bigint) duration_min
        |  from isl group by user_id, island)
        |select user_id, cast(count(*) as bigint) n_incidents,
        |  cast(max(n_errors) as bigint) worst_burst,
        |  cast(max(duration_min) as bigint) longest_min
        |from islands
        |group by user_id
        |order by n_incidents desc, worst_burst desc, user_id
        |limit 15""".stripMargin)
}
