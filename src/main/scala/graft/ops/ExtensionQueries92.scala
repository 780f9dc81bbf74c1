package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 92: ingestion integrity — missing
  * ranges in the order-key sequence and the per-table freshness-lag
  * audit, the two checks a loader's monitoring page starts with.
  */
object ExtensionQueries92 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-418 ID-sequence gap audit -----------------------------------------------
  // Where are the holes in an ID subsequence? Missing ranges via one
  // lead() over the distinct keys — each gap row is (first missing,
  // last missing, length), all integers; the summary columns (total
  // ids, missing count, density) broadcast in-row. Audited here on
  // the URGENT-priority key subsequence (the fixtures' full key space
  // is dense by construction — a filtered subsequence exercises the
  // gap machinery a real loader audit runs on its raw keys). Top-15
  // widest gaps; the sequence-completeness complement to E-121.
  def extSeqgaps(s: SparkSession, dir: String): DataFrame = {
    val ids = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("id"))
      .distinct()
    val w = Window.orderBy("id")
    val gaps = ids.withColumn("nxt", lead("id", 1).over(w))
      .filter(col("nxt") - col("id") > 1)
      .select((col("id") + 1).as("gap_start"),
        (col("nxt") - 1).as("gap_end"),
        (col("nxt") - col("id") - 1).as("gap_len"))
    val summ = ids.agg(count(lit(1)).as("n_ids"), min("id").as("mn"),
        max("id").as("mx")).limit(1)
      .select(col("n_ids"),
        (col("mx") - col("mn") + 1 - col("n_ids")).as("n_missing"),
        round(col("n_ids").cast("double") /
          (col("mx") - col("mn") + 1), 6).as("density"))
    gaps.crossJoin(broadcast(summ))
      .orderBy(desc("gap_len"), asc("gap_start"))
      .limit(15)
  }

  // ---- E-419 freshness-lag audit -------------------------------------------------
  // Which feed is stale? Per table the newest business timestamp and
  // its lag in days behind the freshest table — one aggregate per
  // table unioned into a 3-row report (independent parallel stages,
  // the E-121 shape), integer day arithmetic only.
  def extFreshness(s: SparkSession, dir: String): DataFrame = {
    val perTable =
      t(s, dir, "orders")
        .agg(max(col("o_orderdate").cast("date")).as("newest"))
        .select(lit("orders").as("table_name"), col("newest")).limit(1)
      .unionByName(t(s, dir, "lineitem")
        .agg(max(col("l_shipdate").cast("date")).as("newest"))
        .select(lit("lineitem").as("table_name"), col("newest")).limit(1))
      .unionByName(t(s, dir, "events")
        .agg(max(col("ts").cast("date")).as("newest"))
        .select(lit("events").as("table_name"), col("newest")).limit(1))
    val global = perTable.agg(max("newest").as("freshest")).limit(1)
    perTable.crossJoin(broadcast(global))
      .select(col("table_name"), col("newest"),
        datediff(col("freshest"), col("newest")).cast("long")
          .as("lag_days"),
        (datediff(col("freshest"), col("newest")) > 30).as("stale_30d"))
      .orderBy("table_name")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_seqgaps" -> (extSeqgaps _),
    "ext_freshness" -> (extFreshness _))

  val oracleSql: Map[String, String] = Map(
    // E-418: identical lead() gaps and in-row summary.
    "ext_seqgaps" ->
      """with ids as (select distinct o_orderkey id from orders
        |  where o_orderpriority = '1-URGENT'),
        |gaps as (select id + 1 gap_start, nxt - 1 gap_end,
        |    nxt - id - 1 gap_len
        |  from (select id, lead(id) over (order by id) nxt from ids)
        |  where nxt - id > 1),
        |summ as (select cast(count(*) as bigint) n_ids,
        |    cast(max(id) - min(id) + 1 - count(*) as bigint) n_missing,
        |    round(cast(count(*) as double) / (max(id) - min(id) + 1), 6)
        |      density
        |  from ids)
        |select gap_start, gap_end, gap_len, n_ids, n_missing, density
        |from gaps cross join summ
        |order by gap_len desc, gap_start asc limit 15""".stripMargin,

    // E-419: identical per-table maxima and day arithmetic.
    "ext_freshness" ->
      """with pt as (
        |  select 'orders' table_name,
        |    max(cast(o_orderdate as date)) newest from orders
        |  union all
        |  select 'lineitem', max(cast(l_shipdate as date)) from lineitem
        |  union all
        |  select 'events', max(cast(ts as date)) from events),
        |g as (select max(newest) freshest from pt)
        |select table_name, newest,
        |  cast(date_diff('day', newest, freshest) as bigint) lag_days,
        |  (date_diff('day', newest, freshest) > 30) stale_30d
        |from pt cross join g
        |order by table_name""".stripMargin)
}
