package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 37: feature engineering and
  * demand analytics — the hashing trick with its collision audit,
  * classic STL-style decomposition kept integer by cross-multiplied
  * detrending, log-log price elasticity on quantized logs, and the
  * safety-stock formula over exact demand moments.
  */
object ExtensionQueries37 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def h60(c: Column) =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  // ---- E-265 feature hashing (the hashing trick) ---------------------------------
  // Tokens → 256 hashed feature buckets via the portable hash: the
  // fixed-width featurization that needs no vocabulary (and no second
  // pass) at 100 TB. The audit is the part that matters: buckets by
  // distinct-token load, share of collided buckets, and the max-load
  // bucket — the information-loss profile of the chosen width.
  def extFeathash(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(explode(array_distinct(filter(split(col("text"), " "),
        x => x =!= ""))).as("tok")).distinct()
    val buckets = toks
      .select(pmod(h60(col("tok")), lit(256L)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_toks"))
    buckets.agg(count(lit(1)).as("n_buckets_used"),
        sum("n_toks").as("vocab"),
        max("n_toks").as("max_load"),
        sum(when(col("n_toks") >= 2, 1L).otherwise(0L)).as("n_collided"))
      .select(col("n_buckets_used"), col("vocab"), col("max_load"),
        col("n_collided"),
        round(col("n_collided").cast("double") / col("n_buckets_used"), 6)
          .as("collided_share"))
  }

  // ---- E-266 STL-style decomposition ---------------------------------------------
  // Daily revenue = trend + weekly seasonal + residual: trend is the
  // centered 29-day moving average, kept EXACT by cross-multiply
  // (detrended·29 = 29·x − Σframe, all integer cents); the seasonal
  // component is the per-weekday mean of the scaled detrended series
  // (integer sums, one division); the residual is what's left. Only
  // full 29-day frames decompose (head/tail excluded — half-frame MAs
  // differ across dialects). Windows run over the day series only.
  def extStl(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("dy"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"))
    val w = Window.orderBy("dy").rowsBetween(-14, 14)
    val framed = daily
      .withColumn("nf", count(lit(1)).over(w))
      .withColumn("sf", sum("x").over(w))
      .filter(col("nf") === 29)
      .withColumn("det29", col("x") * 29 - col("sf")) // 29·(x − trend), exact
      .withColumn("dow", dayofweek(col("dy")))
    val seasonal = framed.groupBy("dow")
      .agg(count(lit(1)).as("nd"), sum("det29").as("sd"))
      .select(col("dow"),
        (col("sd").cast("double") / (col("nd") * 29 * 100)).as("seas_d"))
    framed.join(broadcast(seasonal), "dow")
      .select(col("dy").cast("string").as("dy"),
        round(col("x").cast("double") / 100, 2).as("revenue"),
        round(col("sf").cast("double") / (29 * 100), 2).as("trend"),
        round(col("seas_d"), 2).as("seasonal"),
        round(col("x").cast("double") / 100 -
          col("sf").cast("double") / (29 * 100) - col("seas_d"), 2)
          .as("residual"))
      .orderBy(desc("dy")).limit(20)
  }

  // ---- E-267 log-log price elasticity --------------------------------------------
  // Elasticity = d ln(qty)/d ln(1+disc) per brand — but raw-float log
  // regressions are cross-row folds, so both logs are QUANTIZED to the
  // 1e-6 grid first (the E-257 discipline): every OLS moment is then
  // an exact decimal and the slope is one settled division. Brands
  // with |elasticity| > 1 flag as elastic.
  def extElasticity(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        round(log(lit(1.0) + col("l_discount")) * 1e6).cast("long")
          .cast("decimal(38,0)").as("lx"),
        round(log(col("l_quantity").cast("double")) * 1e6).cast("long")
          .cast("decimal(38,0)").as("ly"))
    base.groupBy("brand")
      .agg(count(lit(1)).as("n"), sum("lx").as("sx"), sum("ly").as("sy"),
        sum(col("lx") * col("ly")).as("sxy"),
        sum(col("lx") * col("lx")).as("sxx"))
      .select(col("brand"), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 4)
          .as("elasticity"))
      .withColumn("elastic", abs(col("elasticity")) > 1.0)
      .orderBy("brand")
  }

  // ---- E-268 safety stock --------------------------------------------------------
  // Per-brand safety stock z·σ_d·√L (z = 1.645 for a 95% service
  // level, lead time L = 7 days, both pinned): σ_d is the per-day
  // demand standard deviation from exact integer quantity sums over
  // the (brand, day) series. Top 15 by requirement — the
  // inventory-sizing number next to E-210's price index.
  def extSafetystock(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"), to_date(col("l_shipdate")).as("dy"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
    daily.groupBy("brand")
      .agg(count(lit(1)).as("n_days"),
        sum("q").as("sq"),
        sum(col("q").cast("decimal(38,0)") * col("q")).as("sqq"))
      .select(col("brand"), col("n_days"),
        round(col("sq").cast("double") / col("n_days"), 4).as("mean_daily"),
        round(sqrt((col("n_days").cast("double") * col("sqq").cast("double") -
          col("sq").cast("double") * col("sq").cast("double")) /
          (col("n_days").cast("double") * col("n_days").cast("double"))), 4)
          .as("sd_daily"))
      .withColumn("safety_stock",
        round(lit(1.645) * col("sd_daily") * sqrt(lit(7.0)), 2))
      .orderBy(desc("safety_stock"), asc("brand")).limit(15)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_feathash" -> (extFeathash _),
    "ext_stl" -> (extStl _),
    "ext_elasticity" -> (extElasticity _),
    "ext_safetystock" -> (extSafetystock _))

  val oracleSql: Map[String, String] = Map(
    // E-265: identical hash buckets over the distinct vocabulary.
    "ext_feathash" ->
      """with toks as (select distinct unnest(list_distinct(list_filter(
        |    string_split(text, ' '), w -> w <> ''))) tok from documents),
        |buckets as (select
        |    ('0x' || substr(sha256(tok), 1, 15))::bigint % 256 bucket,
        |    cast(count(*) as bigint) n_toks
        |  from toks group by 1)
        |select cast(count(*) as bigint) n_buckets_used,
        |  cast(sum(n_toks) as bigint) vocab,
        |  cast(max(n_toks) as bigint) max_load,
        |  cast(sum(case when n_toks >= 2 then 1 else 0 end) as bigint)
        |    n_collided,
        |  round(cast(sum(case when n_toks >= 2 then 1 else 0 end) as double)
        |    / count(*), 6) collided_share
        |from buckets""".stripMargin,

    // E-266: identical integer detrend and weekday means; DuckDB
    // dayofweek differs from Spark's (0-based Sun vs 1-based Sun) —
    // aligned via +1.
    "ext_stl" ->
      """with daily as (select cast(o_orderdate as date) dy,
        |    cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint) x
        |  from orders group by 1),
        |framed as (select dy, x,
        |    count(*) over (order by dy rows between 14 preceding
        |      and 14 following) nf,
        |    sum(x) over (order by dy rows between 14 preceding
        |      and 14 following) sf
        |  from daily),
        |det as (select dy, x, sf, x * 29 - sf det29,
        |    dayofweek(dy) + 1 dow
        |  from framed where nf = 29),
        |seasonal as (select dow,
        |    cast(sum(det29) as double) / (count(*) * 29 * 100) seas_d
        |  from det group by dow)
        |select strftime(dy, '%Y-%m-%d') dy,
        |  round(cast(x as double) / 100, 2) revenue,
        |  round(cast(sf as double) / (29 * 100), 2) trend,
        |  round(seas_d, 2) seasonal,
        |  round(cast(x as double) / 100 - cast(sf as double) / (29 * 100)
        |    - seas_d, 2) residual
        |from det join seasonal using (dow)
        |order by dy desc limit 20""".stripMargin,

    // E-267: identical 1e-6 log quantization and exact moments.
    "ext_elasticity" ->
      """with base as (select p_brand brand,
        |    cast(cast(round(ln(1.0 + l_discount) * 1e6) as bigint)
        |      as hugeint) lx,
        |    cast(cast(round(ln(cast(l_quantity as double)) * 1e6) as bigint)
        |      as hugeint) ly
        |  from lineitem join part on l_partkey = p_partkey)
        |select brand, cast(count(*) as bigint) n,
        |  round(cast(count(*) * sum(lx * ly) - sum(lx) * sum(ly) as double) /
        |    cast(count(*) * sum(lx * lx) - sum(lx) * sum(lx) as double), 4)
        |    elasticity,
        |  abs(round(cast(count(*) * sum(lx * ly) - sum(lx) * sum(ly)
        |    as double) /
        |    cast(count(*) * sum(lx * lx) - sum(lx) * sum(lx) as double), 4))
        |    > 1.0 elastic
        |from base group by brand order by brand""".stripMargin,

    // E-268: identical exact demand moments and pinned z·√L.
    "ext_safetystock" ->
      """with daily as (select p_brand brand, cast(l_shipdate as date) dy,
        |    cast(sum(cast(l_quantity as bigint)) as bigint) q
        |  from lineitem join part on l_partkey = p_partkey
        |  group by 1, 2),
        |st as (select brand, cast(count(*) as bigint) n_days,
        |    cast(sum(q) as bigint) sq,
        |    sum(cast(q as hugeint) * q) sqq
        |  from daily group by brand)
        |select brand, n_days,
        |  round(cast(sq as double) / n_days, 4) mean_daily,
        |  round(sqrt((cast(n_days as double) * cast(sqq as double) -
        |    cast(sq as double) * cast(sq as double)) /
        |    (cast(n_days as double) * cast(n_days as double))), 4) sd_daily,
        |  round(1.645 * round(sqrt((cast(n_days as double)
        |    * cast(sqq as double) - cast(sq as double) * cast(sq as double))
        |    / (cast(n_days as double) * cast(n_days as double))), 4)
        |    * sqrt(7.0), 2) safety_stock
        |from st
        |order by safety_stock desc, brand limit 15""".stripMargin)
}
