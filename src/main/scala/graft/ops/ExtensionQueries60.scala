package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 60: a decision-stump split search
  * over a deterministic threshold spine — the simplest learnable model,
  * learned in-database. (This batch originally also carried CUPED and
  * Shapley variants that duplicated E-195/E-307 and were removed.)
  */
object ExtensionQueries60 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def h60(c: Column) =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  // ---- E-333 decision-stump split search -----------------------------------------
  // The simplest learnable model, learned in-database: for 9 candidate
  // thresholds on order price (an equal-width spine between min and
  // max — deterministic, no percentile dialect risk), the weighted
  // Gini impurity of the (status = 'F') split. Counts are exact
  // integers per threshold; one float impurity per spine row. The
  // argmin row is the stump an external tree-builder would grow first.
  def extStump(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(round(col("o_totalprice") * 100).cast("long").as("p"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("pos"))
    val mm = o.agg(min("p").as("mn"), max("p").as("mx"),
      count(lit(1)).as("n"), sum("pos").as("npos"))
    val spine = o.sparkSession.range(1, 10)
      .select(col("id").cast("long").as("k"))
      .crossJoin(broadcast(mm))
      .select(col("k"),
        (col("mn") + floor((col("mx") - col("mn")) * col("k") / lit(10.0))
          .cast("long")).as("thr"),
        col("n"), col("npos"))
    o.crossJoin(broadcast(spine))
      .groupBy("k", "thr", "n", "npos")
      .agg(sum(when(col("p") <= col("thr"), 1L).otherwise(0L)).as("n_l"),
        sum(when(col("p") <= col("thr"), col("pos")).otherwise(0L)).as("pos_l"))
      .select(col("k"), col("thr"), col("n_l"),
        (col("n") - col("n_l")).as("n_r"),
        round(
          when(col("n_l") > 0,
            lit(2.0) * col("pos_l") * (col("n_l") - col("pos_l")) / col("n_l"))
            .otherwise(0.0) +
          when(col("n") - col("n_l") > 0,
            lit(2.0) * (col("npos") - col("pos_l")) *
              ((col("n") - col("n_l")) - (col("npos") - col("pos_l"))) /
              (col("n") - col("n_l")))
            .otherwise(0.0), 4).as("weighted_gini"))
      .orderBy(asc("weighted_gini"), asc("k"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_stump" -> (extStump _))

  val oracleSql: Map[String, String] = Map(
    // E-333: identical spine and integer split counts.
    "ext_stump" ->
      """with o as (select cast(round(o_totalprice * 100) as bigint) p,
        |    case when o_orderstatus = 'F' then 1 else 0 end pos
        |  from orders),
        |mm as (select min(p) mn, max(p) mx,
        |    cast(count(*) as bigint) n, cast(sum(pos) as bigint) npos
        |  from o),
        |spine as (select cast(k as bigint) k,
        |    mn + cast(floor((mx - mn) * k / 10.0) as bigint) thr, n, npos
        |  from range(1, 10) r(k) cross join mm),
        |cells as (select k, thr, n, npos,
        |    cast(sum(case when p <= thr then 1 else 0 end) as bigint) n_l,
        |    cast(sum(case when p <= thr then pos else 0 end) as bigint)
        |      pos_l
        |  from o cross join spine group by k, thr, n, npos)
        |select k, thr, n_l, n - n_l n_r,
        |  round(
        |    (case when n_l > 0 then
        |      2.0 * pos_l * (n_l - pos_l) / n_l else 0 end) +
        |    (case when n - n_l > 0 then
        |      2.0 * (npos - pos_l) * ((n - n_l) - (npos - pos_l)) /
        |        (n - n_l) else 0 end), 4) weighted_gini
        |from cells order by weighted_gini, k""".stripMargin)
}
