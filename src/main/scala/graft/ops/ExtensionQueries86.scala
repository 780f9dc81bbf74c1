package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 86: actuarial development and
  * FP&A bridges — the chain-ladder run-off triangle with
  * chain-ladder AND Bornhuetter-Ferguson ultimates, and the YoY
  * revenue waterfall by nation.
  */
object ExtensionQueries86 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-405 chain-ladder development --------------------------------------------
  // The actuarial run-off triangle on order fulfilment: cohorts =
  // order months, development lag = months to line shipment (capped
  // at 5), C(i,j) cumulative shipped lines. Development factors
  // f_j = ΣC(·,j+1)∕ΣC(·,j) over cohorts where lag j+1 is OBSERVED
  // (i+j+1 ≤ latest month), 1e-9-quantized; each open cohort's
  // ultimate = C_latest·Πf_remaining via a quantized ln-fold (order-
  // free), and the Bornhuetter-Ferguson blend C + (1−1∕Πf)·a-priori
  // (a-priori = cohort orders × the global lines∕order rate) beside
  // it. Last 12 cohorts.
  def extChainladder(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "lineitem")
      .join(t(s, dir, "orders").select(col("o_orderkey").as("l_orderkey"),
        col("o_orderdate")), Seq("l_orderkey"))
      .select(
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("cm"),
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate")) - 1)
          .cast("long").as("sm"))
      .withColumn("j", least(greatest(col("sm") - col("cm"), lit(0L)),
        lit(5L)))
    val tmax = base.agg(max("sm").as("tm")).limit(1)
    val cells = base.groupBy("cm", "j").agg(count(lit(1)).as("nc"))
    val cohorts = cells.select("cm").distinct()
    val grid = cohorts.select(col("cm"),
        explode(sequence(lit(0), lit(5))).as("j"))
      .join(cells, Seq("cm", "j"), "left")
      .withColumn("nc", coalesce(col("nc"), lit(0L)))
      .withColumn("cum", sum("nc").over(
        Window.partitionBy("cm").orderBy("j")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(tmax))
      .withColumn("observed", col("cm") + col("j") <= col("tm"))
    val fac = grid.filter(col("observed"))
      .withColumn("cnext", lead("cum", 1).over(
        Window.partitionBy("cm").orderBy("j")))
      .withColumn("nextobs", col("cm") + col("j") + 1 <= col("tm"))
      .filter(col("nextobs") && col("cnext").isNotNull && col("j") < 5)
      .groupBy("j")
      .agg(sum("cnext").as("snext"), sum("cum").as("scur"))
      .select(col("j"),
        round(col("snext").cast("double") * 1e9 / col("scur")).cast("long")
          .as("fq"))
      .limit(5)
    val latest = grid.filter(col("observed"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("cm").orderBy(desc("j"))))
      .filter(col("rk") === 1)
      .select(col("cm"), col("j").as("jlat"), col("cum").as("clat"))
    val devs = latest.join(fac, col("j") >= col("jlat"), "left")
      .groupBy(col("cm"), col("jlat"), col("clat"))
      .agg(coalesce(sum(
        round(log(col("fq").cast("double") / 1e9) * lit(1e9))
          .cast("long")), lit(0L)).as("lnsum"))
      .withColumn("pif", exp(col("lnsum").cast("double") / 1e9))
    val aprior = t(s, dir, "orders")
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
        .cast("long").as("cm"))
      .groupBy("cm").agg(count(lit(1)).as("n_orders"))
    val rate = base.agg(count(lit(1)).as("nl")).limit(1)
      .crossJoin(broadcast(t(s, dir, "orders")
        .agg(count(lit(1)).as("no")).limit(1)))
      .select(round(col("nl").cast("double") * 1e9 / col("no"))
        .cast("long").as("rateq")).limit(1)
    devs.join(aprior, Seq("cm"))
      .crossJoin(broadcast(rate))
      .select(col("cm").as("cohort_month"), col("jlat").as("latest_lag"),
        col("clat").as("lines_observed"),
        round(col("clat").cast("double") * col("pif"), 1)
          .as("ultimate_cl"),
        round(col("clat").cast("double") +
          (lit(1.0) - lit(1.0) / col("pif")) *
            (col("n_orders").cast("double") * col("rateq") / 1e9), 1)
          .as("ultimate_bf"),
        round(lit(100.0) / col("pif"), 2).as("pct_developed"))
      .orderBy(desc("cohort_month"))
      .limit(12)
  }

  // ---- E-406 YoY revenue waterfall -----------------------------------------------
  // Where did the 1999→2000 revenue change come from? Per-nation
  // deltas in exact cents, ranked (delta desc, nation) with the
  // running cumulative — the waterfall chart's data contract: the
  // last running value IS the total change (an exact integer
  // identity, asserted by construction).
  def extWaterfall(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "orders")
      .filter(year(col("o_orderdate")).isin(1999, 2000))
      .join(t(s, dir, "customer").select(col("c_custkey").as("o_custkey"),
        col("c_nationkey")), Seq("o_custkey"))
      .join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nationkey"), col("n_name"))),
        Seq("c_nationkey"))
      .groupBy("n_name")
      .agg(
        sum(when(year(col("o_orderdate")) === 1999,
          round(col("o_totalprice") * 100).cast("long")).otherwise(0L))
          .as("rev_a"),
        sum(when(year(col("o_orderdate")) === 2000,
          round(col("o_totalprice") * 100).cast("long")).otherwise(0L))
          .as("rev_b"))
      .withColumn("delta", col("rev_b") - col("rev_a"))
    val w = Window.orderBy(desc("delta"), asc("n_name"))
      .rowsBetween(Window.unboundedPreceding, 0)
    rev.withColumn("running", sum("delta").over(w))
      .select(col("n_name"),
        round(col("rev_a").cast("double") / 100, 2).as("rev_1999"),
        round(col("rev_b").cast("double") / 100, 2).as("rev_2000"),
        round(col("delta").cast("double") / 100, 2).as("delta_dollars"),
        round(col("running").cast("double") / 100, 2)
          .as("running_dollars"))
      .orderBy(desc("delta_dollars"), asc("n_name"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_chainladder" -> (extChainladder _),
    "ext_waterfall" -> (extWaterfall _))

  val oracleSql: Map[String, String] = Map(
    // E-405: identical triangle, factors, quantized ln-folds, BF blend.
    "ext_chainladder" ->
      """with base as (select
        |    (year(o_orderdate) * 12 + month(o_orderdate) - 1) cm,
        |    least(greatest((year(l_shipdate) * 12 + month(l_shipdate)
        |      - 1) -
        |      (year(o_orderdate) * 12 + month(o_orderdate) - 1), 0), 5) j,
        |    (year(l_shipdate) * 12 + month(l_shipdate) - 1) sm
        |  from lineitem join orders on o_orderkey = l_orderkey),
        |tmax as (select cast(max(sm) as bigint) tm from base),
        |cells as (select cast(cm as bigint) cm, cast(j as bigint) j,
        |    cast(count(*) as bigint) nc
        |  from base group by 1, 2),
        |cohorts as (select distinct cm from cells),
        |grid as (select c.cm, j.j,
        |    cast(coalesce(cells.nc, 0) as bigint) nc
        |  from cohorts c
        |  cross join (select unnest(generate_series(0, 5)) j) j
        |  left join cells on cells.cm = c.cm and cells.j = j.j),
        |cum as (select cm, j,
        |    cast(sum(nc) over (partition by cm order by j
        |      rows between unbounded preceding and current row)
        |      as bigint) cum
        |  from grid),
        |obs as (select cum.*, tm, cm + j <= tm observed
        |  from cum cross join tmax),
        |fac as (select j,
        |    cast(round(cast(sum(cnext) as double) * 1e9 / sum(cum))
        |      as bigint) fq
        |  from (select cm, j, cum, tm,
        |      lead(cum) over (partition by cm order by j) cnext
        |    from obs where observed)
        |  where cm + j + 1 <= tm and cnext is not null and j < 5
        |  group by j),
        |latest as (select cm, j jlat, cum clat from (
        |    select cm, j, cum,
        |      row_number() over (partition by cm order by j desc) rk
        |    from obs where observed) where rk = 1),
        |devs as (select l.cm, l.jlat, l.clat,
        |    exp(cast(coalesce(sum(cast(round(ln(cast(fq as double) / 1e9)
        |      * 1e9) as bigint)), 0) as double) / 1e9) pif
        |  from latest l left join fac on fac.j >= l.jlat
        |  group by 1, 2, 3),
        |apr as (select (year(o_orderdate) * 12 + month(o_orderdate) - 1)
        |      cm,
        |    cast(count(*) as bigint) n_orders
        |  from orders group by 1),
        |rate as (select cast(round(
        |    cast((select count(*) from lineitem) as double) * 1e9 /
        |    (select count(*) from orders)) as bigint) rateq)
        |select devs.cm cohort_month, jlat latest_lag,
        |  clat lines_observed,
        |  round(cast(clat as double) * pif, 1) ultimate_cl,
        |  round(cast(clat as double) + (1.0 - 1.0 / pif) *
        |    (cast(n_orders as double) * rateq / 1e9), 1) ultimate_bf,
        |  round(100.0 / pif, 2) pct_developed
        |from devs join apr on apr.cm = devs.cm
        |cross join rate
        |order by cohort_month desc limit 12""".stripMargin,

    // E-406: identical year split, exact deltas, pinned running order.
    "ext_waterfall" ->
      """with rev as (select n_name,
        |    cast(sum(case when year(o_orderdate) = 1999
        |      then cast(round(o_totalprice * 100) as bigint) else 0 end)
        |      as bigint) rev_a,
        |    cast(sum(case when year(o_orderdate) = 2000
        |      then cast(round(o_totalprice * 100) as bigint) else 0 end)
        |      as bigint) rev_b
        |  from orders
        |  join customer on c_custkey = o_custkey
        |  join nation on n_nationkey = c_nationkey
        |  where year(o_orderdate) in (1999, 2000)
        |  group by 1),
        |d as (select n_name, rev_a, rev_b, rev_b - rev_a delta from rev),
        |r as (select n_name, rev_a, rev_b, delta,
        |    cast(sum(delta) over (order by delta desc, n_name asc
        |      rows between unbounded preceding and current row)
        |      as bigint) running
        |  from d)
        |select n_name,
        |  round(cast(rev_a as double) / 100, 2) rev_1999,
        |  round(cast(rev_b as double) / 100, 2) rev_2000,
        |  round(cast(delta as double) / 100, 2) delta_dollars,
        |  round(cast(running as double) / 100, 2) running_dollars
        |from r
        |order by delta_dollars desc, n_name asc""".stripMargin)
}
