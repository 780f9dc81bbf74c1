package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 43: scenario analysis and shuffle
  * planning — the discount-cap what-if (counterfactual revenue in
  * exact cents) and the shuffle-key skew pre-flight (which candidate
  * key hash-partitions the fact table most evenly).
  */
object ExtensionQueries43 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def h60(c: Column) =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  // ---- E-287 discount-cap what-if ------------------------------------------------
  // Counterfactual: cap every discount at 5%. Actual and scenario
  // revenue are both exact integer arithmetic — revenue cents =
  // price_cents·(10000 − disc_bp) carried at basis-point scale (÷10000
  // only at display), so the uplift is computed without a single float
  // until the final three display divisions. Per-year ledger.
  def extWhatif(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(year(col("l_shipdate")).cast("long").as("yr"),
        round(col("l_extendedprice") * 100).cast("long")
          .cast("decimal(38,0)").as("pc"),
        round(col("l_discount") * 10000).cast("long").as("bp"))
    li.groupBy("yr")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("pc") * (lit(10000) - col("bp"))).as("actual_x"),
        sum(col("pc") * (lit(10000) - least(col("bp"), lit(500L))))
          .as("capped_x"))
      .select(col("yr"), col("n_lines"),
        round(col("actual_x").cast("double") / 1e6, 2).as("actual_rev"),
        round(col("capped_x").cast("double") / 1e6, 2).as("capped_rev"),
        round((col("capped_x") - col("actual_x")).cast("double") / 1e6, 2)
          .as("uplift"))
      .orderBy("yr")
  }

  // ---- E-288 shuffle-key skew pre-flight -----------------------------------------
  // Before repartitioning a 100 TB fact table: which candidate key
  // spreads it most evenly over 32 hash buckets? Each key's bucket
  // histogram comes from one cheap aggregate with the portable hash
  // standing in for the partitioner; the report is max/mean bucket
  // load per key — the skew number that decides the shuffle key (the
  // bucket-level companion to E-? skewstats' per-key histogram).
  def extPartskew(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    def buckets(key: Column, name: String) = li
      .groupBy(pmod(h60(key.cast("string")), lit(32L)).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .agg(lit(name).as("candidate_key"), count(lit(1)).as("n_buckets"),
        sum("n").as("n_rows"), max("n").as("max_bucket"),
        (sum("n") / count(lit(1))).cast("long").as("mean_bucket"))
    buckets(col("l_orderkey"), "l_orderkey")
      .unionAll(buckets(col("l_partkey"), "l_partkey"))
      .unionAll(buckets(col("l_suppkey"), "l_suppkey"))
      .select(col("candidate_key"), col("n_buckets"), col("n_rows"),
        col("max_bucket"), col("mean_bucket"),
        round(col("max_bucket").cast("double") / col("mean_bucket"), 4)
          .as("skew_ratio"))
      .orderBy("candidate_key")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_whatif" -> (extWhatif _),
    "ext_partskew" -> (extPartskew _))

  val oracleSql: Map[String, String] = Map(
    // E-287: identical basis-point integer scenario arithmetic.
    "ext_whatif" ->
      """with li as (select year(l_shipdate) yr,
        |    cast(cast(round(l_extendedprice * 100) as bigint) as hugeint) pc,
        |    cast(round(l_discount * 10000) as bigint) bp
        |  from lineitem)
        |select cast(yr as bigint) yr, cast(count(*) as bigint) n_lines,
        |  round(cast(sum(pc * (10000 - bp)) as double) / 1e6, 2) actual_rev,
        |  round(cast(sum(pc * (10000 - least(bp, 500))) as double) / 1e6, 2)
        |    capped_rev,
        |  round(cast(sum(pc * (10000 - least(bp, 500)))
        |    - sum(pc * (10000 - bp)) as double) / 1e6, 2) uplift
        |from li group by yr order by yr""".stripMargin,

    // E-288: identical portable-hash bucket histograms.
    "ext_partskew" ->
      """with b1 as (select ('0x' || substr(sha256(cast(l_orderkey
        |      as varchar)), 1, 15))::bigint % 32 bucket,
        |    cast(count(*) as bigint) n
        |  from lineitem group by 1),
        |b2 as (select ('0x' || substr(sha256(cast(l_partkey
        |      as varchar)), 1, 15))::bigint % 32 bucket,
        |    cast(count(*) as bigint) n
        |  from lineitem group by 1),
        |b3 as (select ('0x' || substr(sha256(cast(l_suppkey
        |      as varchar)), 1, 15))::bigint % 32 bucket,
        |    cast(count(*) as bigint) n
        |  from lineitem group by 1),
        |u as (
        |  select 'l_orderkey' candidate_key, cast(count(*) as bigint)
        |      n_buckets, cast(sum(n) as bigint) n_rows,
        |    cast(max(n) as bigint) max_bucket,
        |    cast(sum(n) // count(*) as bigint) mean_bucket from b1
        |  union all
        |  select 'l_partkey', cast(count(*) as bigint),
        |    cast(sum(n) as bigint), cast(max(n) as bigint),
        |    cast(sum(n) // count(*) as bigint) from b2
        |  union all
        |  select 'l_suppkey', cast(count(*) as bigint),
        |    cast(sum(n) as bigint), cast(max(n) as bigint),
        |    cast(sum(n) // count(*) as bigint) from b3)
        |select candidate_key, n_buckets, n_rows, max_bucket, mean_bucket,
        |  round(cast(max_bucket as double) / mean_bucket, 4) skew_ratio
        |from u order by candidate_key""".stripMargin)
}
