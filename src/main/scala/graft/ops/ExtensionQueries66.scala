package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 66: the brand-presence basket
  * premium — assortment association from one distinct presence join.
  * (Elasticity and HHI variants were dropped as duplicates of
  * E-267/E-180.)
  */
object ExtensionQueries66 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-348 brand-presence basket premium ---------------------------------------
  // Does having brand B in an order travel with a bigger basket? For
  // each brand: mean order total among orders CONTAINING the brand vs
  // orders without it, from one presence flag join — the assortment
  // premium (association, not causation — the E-195 CUPED discipline
  // would be the causal follow-up). Integer cents; top-15 premiums.
  def extBrandpremium(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
      .select(col("o_orderkey").as("ok"),
        round(col("o_totalprice") * 100).cast("long").as("total"))
    val present = t(s, dir, "lineitem")
      .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("brand"))
      .distinct()
    val tot = orders.agg(count(lit(1)).as("n_all"),
      sum(col("total").cast("decimal(38,0)")).as("s_all"))
    present.join(orders, "ok")
      .groupBy("brand")
      .agg(count(lit(1)).as("n_with"),
        sum(col("total").cast("decimal(38,0)")).as("s_with"))
      .crossJoin(broadcast(tot))
      .filter(col("n_all") > col("n_with"))
      .select(col("brand"), col("n_with"),
        round(col("s_with").cast("double") / col("n_with") / 100, 2)
          .as("avg_with"),
        round((col("s_all") - col("s_with")).cast("double") /
          (col("n_all") - col("n_with")) / 100, 2).as("avg_without"))
      .withColumn("premium",
        round(col("avg_with") - col("avg_without"), 2))
      .orderBy(desc("premium"), asc("brand"))
      .limit(15)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_brandpremium" -> (extBrandpremium _))

  val oracleSql: Map[String, String] = Map(
    // E-348: identical presence flags and integer-cent means.
    "ext_brandpremium" ->
      """with o as (select o_orderkey ok,
        |    cast(round(o_totalprice * 100) as bigint) total
        |  from orders),
        |pres as (select distinct l_orderkey ok, p_brand brand
        |  from lineitem join part on l_partkey = p_partkey),
        |tot as (select cast(count(*) as bigint) n_all,
        |    sum(cast(total as hugeint)) s_all from o),
        |w as (select brand, cast(count(*) as bigint) n_with,
        |    sum(cast(total as hugeint)) s_with
        |  from pres join o using (ok) group by brand),
        |m as (select brand, n_with,
        |    round(cast(s_with as double) / n_with / 100, 2) avg_with,
        |    round(cast(s_all - s_with as double) /
        |      (n_all - n_with) / 100, 2) avg_without
        |  from w cross join tot where n_all > n_with)
        |select brand, n_with, avg_with, avg_without,
        |  round(avg_with - avg_without, 2) premium
        |from m order by premium desc, brand limit 15""".stripMargin)
}
