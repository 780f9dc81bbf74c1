package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 64: graph-structure and
  * forecastability profiles — the average-neighbor-degree curve (the
  * per-k view E-199's assortativity scalar summarizes), Theil's U
  * forecast-skill ratio of seasonal-naive vs naive, and the
  * Syntetos-Boylan ADI/CV² demand-pattern quadrant per brand.
  */
object ExtensionQueries64 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-342 average-neighbor-degree profile -------------------------------------
  // knn(k) over the supplier-part incidence graph: for suppliers of
  // degree k, the mean degree of the PARTS they touch — the rising or
  // falling curve behind the single assortativity number (E-199).
  // Exact integer sums; one division per k row.
  def extNbrdegree(s: SparkSession, dir: String): DataFrame = {
    val edges = t(s, dir, "lineitem")
      .select(col("l_suppkey").as("s"), col("l_partkey").as("p"))
      .distinct()
    val sdeg = edges.groupBy("s").agg(count(lit(1)).as("ds"))
    val pdeg = edges.groupBy("p").agg(count(lit(1)).as("dp"))
    edges.join(sdeg, "s").join(pdeg, "p")
      .groupBy(col("ds").as("k"))
      .agg(countDistinct("s").as("n_suppliers"),
        count(lit(1)).as("n_edges"),
        round(sum("dp").cast("double") / count(lit(1)), 4)
          .as("avg_nbr_degree"))
      .orderBy("k")
      .limit(30)
  }

  // ---- E-343 Theil's U forecast skill --------------------------------------------
  // Does weekly seasonality beat persistence on daily revenue?
  // U = RMSE(seasonal-naive, lag 7) / RMSE(naive, lag 1) — U < 1 means
  // the weekly pattern carries real signal. Errors are exact cent
  // integers; squared-error sums stay in decimal (no float fold), one
  // sqrt ratio at the end, computed over days where BOTH lags exist.
  def extTheilu(s: SparkSession, dir: String): DataFrame = {
    val day = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("dy"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
    val w = Window.orderBy("dy")
    val lagged = day
      .withColumn("e1", col("y") - lag("y", 1).over(w))
      .withColumn("e7", col("y") - lag("y", 7).over(w))
      .filter(col("e1").isNotNull && col("e7").isNotNull)
      .select(col("e1").cast("decimal(38,0)").as("e1"),
        col("e7").cast("decimal(38,0)").as("e7"))
    lagged.agg(count(lit(1)).as("n"),
        sum(col("e1") * col("e1")).as("s1"),
        sum(col("e7") * col("e7")).as("s7"))
      .select(col("n"),
        round(sqrt(col("s1").cast("double") / col("n")) / 100, 2)
          .as("rmse_naive"),
        round(sqrt(col("s7").cast("double") / col("n")) / 100, 2)
          .as("rmse_seasonal"),
        round(sqrt(col("s7").cast("double") / col("s1").cast("double")), 6)
          .as("theil_u"))
  }

  // ---- E-344 demand-pattern quadrant ---------------------------------------------
  // Syntetos-Boylan forecastability per brand: ADI = demand days /
  // nonzero-demand days... here every observed day has demand, so ADI
  // uses the CALENDAR span: span_days / demand_days; CV² of the
  // nonzero sizes from exact moments. Quadrants at the canonical cuts
  // ADI 1.32 / CV² 0.49 by integer cross-multiply (100·span vs
  // 132·days; CV² via 49·mean² vs 100·var scaled) — smooth /
  // intermittent / erratic / lumpy. Top-15 brands by ADI.
  def extDemandclass(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "lineitem")
      .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"),
        to_date(col("l_shipdate")).as("dy"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
    val span = d.agg((datediff(max("dy"), min("dy")) + 1).cast("long")
      .as("span_days"))
    val per = d.withColumn("qd", col("q").cast("decimal(38,0)"))
      .groupBy("brand")
      .agg(count(lit(1)).as("demand_days"), sum("qd").as("sq"),
        sum(col("qd") * col("qd")).as("sqq"))
      .filter(col("demand_days") >= 2)
      .crossJoin(broadcast(span))
    per.select(col("brand"), col("demand_days"), col("span_days"),
        round(col("span_days").cast("double") / col("demand_days"), 4)
          .as("adi"),
        // CV² = var/mean² = (n·Sqq − Sq²)/(n−1) · n²/(n·Sq²) — all from
        // decimals; rounded once
        round(((col("demand_days") * col("sqq") - col("sq") * col("sq"))
          .cast("double") / (col("demand_days") - 1).cast("double")) *
          col("demand_days").cast("double") /
          (col("sq") * col("sq")).cast("double"), 6).as("cv2"))
      .withColumn("quadrant",
        when(col("adi") * 100 <= 132 && col("cv2") * 100 <= 49, "smooth")
          .when(col("adi") * 100 > 132 && col("cv2") * 100 <= 49,
            "intermittent")
          .when(col("adi") * 100 <= 132, "erratic")
          .otherwise("lumpy"))
      .orderBy(desc("adi"), asc("brand"))
      .limit(15)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_nbrdegree" -> (extNbrdegree _),
    "ext_theilu" -> (extTheilu _),
    "ext_demandclass" -> (extDemandclass _))

  val oracleSql: Map[String, String] = Map(
    // E-342: identical degree tables and per-k means.
    "ext_nbrdegree" ->
      """with e as (select distinct l_suppkey s, l_partkey p from lineitem),
        |sd as (select s, cast(count(*) as bigint) ds from e group by s),
        |pd as (select p, cast(count(*) as bigint) dp from e group by p)
        |select ds k,
        |  cast(count(distinct e.s) as bigint) n_suppliers,
        |  cast(count(*) as bigint) n_edges,
        |  round(cast(sum(dp) as double) / count(*), 4) avg_nbr_degree
        |from e join sd on e.s = sd.s join pd on e.p = pd.p
        |group by ds order by k limit 30""".stripMargin,

    // E-343: identical lags and decimal squared-error sums.
    "ext_theilu" ->
      """with day as (select cast(o_orderdate as date) dy,
        |    cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint) y
        |  from orders group by 1),
        |lg as (select y - lag(y, 1) over (order by dy) e1,
        |    y - lag(y, 7) over (order by dy) e7
        |  from day),
        |f as (select cast(e1 as hugeint) e1, cast(e7 as hugeint) e7
        |  from lg where e1 is not null and e7 is not null)
        |select cast(count(*) as bigint) n,
        |  round(sqrt(cast(sum(e1 * e1) as double) / count(*)) / 100, 2)
        |    rmse_naive,
        |  round(sqrt(cast(sum(e7 * e7) as double) / count(*)) / 100, 2)
        |    rmse_seasonal,
        |  round(sqrt(cast(sum(e7 * e7) as double) /
        |    cast(sum(e1 * e1) as double)), 6) theil_u
        |from f""".stripMargin,

    // E-344: identical ADI/CV² forms and canonical quadrant cuts.
    "ext_demandclass" ->
      """with d as (select p_brand brand, cast(l_shipdate as date) dy,
        |    cast(sum(cast(l_quantity as bigint)) as bigint) q
        |  from lineitem join part on l_partkey = p_partkey
        |  group by 1, 2),
        |span as (select cast(date_diff('day', min(dy), max(dy)) + 1
        |    as bigint) span_days from d),
        |per as (select brand, cast(count(*) as bigint) demand_days,
        |    sum(cast(q as hugeint)) sq,
        |    sum(cast(q as hugeint) * q) sqq
        |  from d group by brand having count(*) >= 2),
        |m as (select brand, demand_days, span_days,
        |    round(cast(span_days as double) / demand_days, 4) adi,
        |    round((cast(demand_days * sqq - sq * sq as double) /
        |      cast(demand_days - 1 as double)) *
        |      cast(demand_days as double) /
        |      cast(sq * sq as double), 6) cv2
        |  from per cross join span)
        |select brand, demand_days, span_days, adi, cv2,
        |  case when adi * 100 <= 132 and cv2 * 100 <= 49 then 'smooth'
        |    when adi * 100 > 132 and cv2 * 100 <= 49 then 'intermittent'
        |    when adi * 100 <= 132 then 'erratic'
        |    else 'lumpy' end quadrant
        |from m order by adi desc, brand limit 15""".stripMargin)
}
