package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 44: calendar semantics — the
  * fiscal-calendar rollup (FY starting February) and business-day
  * lead times computed with pure epoch-day residue arithmetic (no
  * engine weekday functions — the off-by-one trap between Spark's
  * 1-based and DuckDB's 0-based dayofweek never enters).
  */
object ExtensionQueries44 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-289 fiscal-calendar rollup ----------------------------------------------
  // FY starts Feb 1 (FY-n = Feb n−1 … Jan n): fiscal year and quarter
  // from month arithmetic only — fy = year + (month ≥ 2),
  // fq = ((month − 2 + 12) mod 12) div 3 + 1. Revenue cents per
  // (fy, fq): the finance view every calendar-year report misstates.
  def extFiscal(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(
      year(col("o_orderdate")).cast("long").as("y"),
      month(col("o_orderdate")).cast("long").as("m"),
      round(col("o_totalprice") * 100).cast("long").as("c"))
    o.select(
        (col("y") + when(col("m") >= 2, 1L).otherwise(0L)).as("fy"),
        ((pmod(col("m") - 2 + 12, lit(12L)) / 3).cast("long") + 1).as("fq"),
        col("c"))
      .groupBy("fy", "fq")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("c").cast("double") / 100, 2).as("revenue"))
      .orderBy("fy", "fq")
  }

  // ---- E-290 business-day lead time ----------------------------------------------
  // Order → first-ship lead time in BUSINESS days, from epoch-day
  // residues alone: Saturdays have ed ≡ 2 (mod 7), Sundays ed ≡ 3
  // (1970-01-01 was a Thursday), and the count of residue-r days in
  // (a, b] is ((b−r) div 7) − ((a−r) div 7) — all integer, identical
  // on both engines, no dayofweek() anywhere. Per-priority profile
  // beside E-214's calendar-day SLA view.
  def extBizdays(s: SparkSession, dir: String): DataFrame = {
    val firstShip = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(min(to_date(col("l_shipdate"))).as("ship"))
    val j = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority").as("prio"),
        to_date(col("o_orderdate")).as("od"))
      .join(firstShip, "o_orderkey")
      .select(col("prio"),
        datediff(col("od"), lit("1970-01-01").cast("date")).cast("long")
          .as("e1"),
        datediff(col("ship"), lit("1970-01-01").cast("date")).cast("long")
          .as("e2"))
    def cnt(x: Column, r: Int): Column = floor((x - r) / 7)
    val bd = j.select(col("prio"),
      ((col("e2") - col("e1")) -
        (cnt(col("e2"), 2) - cnt(col("e1"), 2)) -
        (cnt(col("e2"), 3) - cnt(col("e1"), 3))).cast("long").as("bd"))
    bd.groupBy("prio")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("bd").cast("double") / count(lit(1)), 4).as("mean_bd"),
        max("bd").as("max_bd"),
        sum(when(col("bd") <= 20, 1L).otherwise(0L)).as("n_within_20bd"))
      .orderBy("prio")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_fiscal" -> (extFiscal _),
    "ext_bizdays" -> (extBizdays _))

  val oracleSql: Map[String, String] = Map(
    // E-289: identical month arithmetic.
    "ext_fiscal" ->
      """with o as (select year(o_orderdate) y, month(o_orderdate) m,
        |    cast(round(o_totalprice * 100) as bigint) c
        |  from orders)
        |select cast(y + case when m >= 2 then 1 else 0 end as bigint) fy,
        |  cast((m - 2 + 12) % 12 // 3 + 1 as bigint) fq,
        |  cast(count(*) as bigint) n_orders,
        |  round(cast(sum(c) as double) / 100, 2) revenue
        |from o group by 1, 2 order by fy, fq""".stripMargin,

    // E-290: identical residue arithmetic (Sat ed≡2, Sun ed≡3 mod 7).
    "ext_bizdays" ->
      """with fs as (select l_orderkey o_orderkey,
        |    min(cast(l_shipdate as date)) ship
        |  from lineitem group by 1),
        |j as (select o_orderpriority prio,
        |    datediff('day', date '1970-01-01', cast(o_orderdate as date)) e1,
        |    datediff('day', date '1970-01-01', ship) e2
        |  from orders join fs using (o_orderkey)),
        |bd as (select prio,
        |    cast((e2 - e1)
        |      - (((e2 - 2) // 7) - ((e1 - 2) // 7))
        |      - (((e2 - 3) // 7) - ((e1 - 3) // 7)) as bigint) bd
        |  from j)
        |select prio, cast(count(*) as bigint) n_orders,
        |  round(cast(sum(bd) as double) / count(*), 4) mean_bd,
        |  cast(max(bd) as bigint) max_bd,
        |  cast(sum(case when bd <= 20 then 1 else 0 end) as bigint)
        |    n_within_20bd
        |from bd group by prio order by prio""".stripMargin)
}
