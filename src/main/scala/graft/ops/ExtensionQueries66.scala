package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 66: commerce economics — log-log
  * price elasticity per brand, the Herfindahl-Hirschman supplier
  * concentration index per nation, and the brand-presence basket
  * premium. Quantized-log moments and integer share cross-multiplies
  * throughout (E-257).
  */
object ExtensionQueries66 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-352 log-log price elasticity --------------------------------------------
  // ε = d ln q / d ln p per brand from the OLS slope over order lines:
  // slope = (nΣxy − ΣxΣy)/(nΣxx − Σx²) with x = ln(price), y = ln(qty)
  // QUANTIZED to 1e-6 integers per line before the moment sums (exact
  // decimal folds, one settled division). The own-price demand curve
  // behind every pricing decision; top-15 most elastic brands.
  def extElasticity(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "lineitem")
      .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .filter(col("l_extendedprice") > 0 && col("l_quantity") > 0)
      .select(col("p_brand").as("brand"),
        round(log(col("l_extendedprice")) * 1e6).cast("long")
          .cast("decimal(38,0)").as("x"),
        round(log(col("l_quantity")) * 1e6).cast("long")
          .cast("decimal(38,0)").as("y"))
    d.groupBy("brand")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .filter(col("n") >= 10)
      .select(col("brand"), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6)
          .as("elasticity"))
      .orderBy(asc("elasticity"), asc("brand"))
      .limit(15)
  }

  // ---- E-353 Herfindahl-Hirschman index ------------------------------------------
  // Supplier market concentration per nation: HHI = Σ (100·shareᵢ)²
  // over each supplier's revenue share of its nation, computed from
  // integer cents — shares never materialize (cross-multiplied:
  // HHI = 10⁴·Σ revᵢ²/(Σ revᵢ)²), one settled division per nation.
  // The antitrust screen beside ext_gini's inequality and
  // ext_pareto's top-k concentration. >2500 flags high concentration.
  def extHhi(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .join(t(s, dir, "supplier").select(col("s_suppkey"),
        col("s_nationkey")), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").as("nk"), col("l_suppkey").as("sk"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
        .cast("decimal(38,0)").as("r"))
    rev.groupBy("nk")
      .agg(count(lit(1)).as("n_suppliers"),
        sum("r").as("tot"), sum(col("r") * col("r")).as("ss"))
      .join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("nk"), col("n_name"))), "nk")
      .select(col("n_name"), col("n_suppliers"),
        round(lit(10000.0) * col("ss").cast("double") /
          (col("tot") * col("tot")).cast("double"), 2).as("hhi"))
      .withColumn("concentrated", col("hhi") > 2500)
      .orderBy(desc("hhi"), asc("n_name"))
      .limit(15)
  }

  // ---- E-354 brand-presence basket premium ---------------------------------------
  // Does having brand B in an order travel with a bigger basket? For
  // each brand: mean order total among orders CONTAINING the brand vs
  // orders without it, from one presence flag join — the assortment
  // premium (association, not causation — the E-333 CUPED discipline
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
    "ext_elasticity" -> (extElasticity _),
    "ext_hhi" -> (extHhi _),
    "ext_brandpremium" -> (extBrandpremium _))

  val oracleSql: Map[String, String] = Map(
    // E-352: identical quantized-log moments and slope form.
    "ext_elasticity" ->
      """with d as (select p_brand brand,
        |    cast(cast(round(ln(l_extendedprice) * 1e6) as bigint)
        |      as hugeint) x,
        |    cast(cast(round(ln(l_quantity) * 1e6) as bigint)
        |      as hugeint) y
        |  from lineitem join part on l_partkey = p_partkey
        |  where l_extendedprice > 0 and l_quantity > 0),
        |m as (select brand, cast(count(*) as bigint) n,
        |    sum(x) sx, sum(y) sy, sum(x * y) sxy, sum(x * x) sxx
        |  from d group by brand having count(*) >= 10)
        |select brand, n,
        |  round(cast(n * sxy - sx * sy as double) /
        |    cast(n * sxx - sx * sx as double), 6) elasticity
        |from m order by elasticity, brand limit 15""".stripMargin,

    // E-353: identical cross-multiplied HHI.
    "ext_hhi" ->
      """with rev as (select s_nationkey nk, l_suppkey sk,
        |    cast(sum(cast(round(l_extendedprice * 100) as bigint))
        |      as hugeint) r
        |  from lineitem join supplier on l_suppkey = s_suppkey
        |  group by 1, 2),
        |agg as (select nk, cast(count(*) as bigint) n_suppliers,
        |    sum(r) tot, sum(r * r) ss
        |  from rev group by nk)
        |select n_name, n_suppliers,
        |  round(10000.0 * cast(ss as double) / cast(tot * tot as double),
        |    2) hhi,
        |  round(10000.0 * cast(ss as double) / cast(tot * tot as double),
        |    2) > 2500 concentrated
        |from agg join nation on nk = n_nationkey
        |order by hhi desc, n_name limit 15""".stripMargin,

    // E-354: identical presence flags and integer-cent means.
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
