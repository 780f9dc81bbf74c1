package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 83: marketing science — the Bass
  * diffusion fit of customer adoption, Lerner optimal markups from
  * own-price elasticities, and the Ehrenberg double-jeopardy check of
  * brand penetration vs purchase frequency.
  */
object ExtensionQueries83 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-396 Bass diffusion fit --------------------------------------------------
  // Innovation vs imitation in customer adoption: the discrete Bass
  // regression n_t = a + b₁·N_{t−1} + b₂·N²_{t−1} (new adopters on
  // cumulative adopters) via the E-113 closed-form two-regressor OLS
  // over exact decimal moments; then M̂ = (−b₁−√(b₁²−4ab₂))∕2b₂,
  // p̂ = a∕M̂, q̂ = p̂+b₁ — the market-size/innovation/imitation
  // triple, all settled doubles from exact sums.
  def extBass(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("d")
    val adopt = t(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(min(col("o_orderdate").cast("date")).as("d"))
      .groupBy("d").agg(count(lit(1)).as("nt"))
      .withColumn("cum",
        sum("nt").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("nprev", coalesce(lag("cum", 1).over(w), lit(0L)))
      .select(col("nt").cast("long").as("y"), col("nprev").as("x1"),
        (col("nprev") * col("nprev")).as("x2"))
    val fit = Stats.ols2(adopt, col("y"), col("x1"), col("x2"))
    val a = col("b0")
    val b1 = col("b1")
    val b2 = col("b2")
    val m = (-b1 - sqrt(b1 * b1 - lit(4.0) * a * b2)) / (lit(2.0) * b2)
    fit.select(col("n").as("n_days"),
      round(a, 4).as("coef_a"),
      round(b1, 6).as("coef_b1"),
      round(b2 * lit(1e9), 6).as("coef_b2_x1e9"),
      round(m, 1).as("market_size_hat"),
      round(a / m, 6).as("p_innovation"),
      round(a / m + b1, 6).as("q_imitation"),
      round(col("r2"), 4).as("r2"))
  }

  // ---- E-397 Lerner optimal markup -----------------------------------------------
  // From measurement to pricing decision: per-brand own-price
  // elasticity ε (1e-6-quantized ln qty ~ ln unit price, exact-moment
  // slope — the E-267 discipline on E-202's variables), then the
  // Lerner rule: optimal (p−c)∕p = −1∕ε, optimal price multiplier
  // over marginal cost ε∕(1+ε) — defined only where demand is
  // elastic (ε < −1); inelastic brands stay in the report with NULL
  // markups (corner solution). Top-15 most-elastic-first.
  def extLerner(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .join(t(s, dir, "part").select(col("p_partkey").as("l_partkey"),
        col("p_brand")), Seq("l_partkey"))
      .filter(col("l_quantity") > 0)
      .select(col("p_brand"),
        round(log(col("l_quantity")) * 1e6).cast("long")
          .cast("decimal(38,0)").as("lq"),
        round(log(col("l_extendedprice") / col("l_quantity")) * 1e6)
          .cast("long").cast("decimal(38,0)").as("lp"))
    val mom = li.groupBy("p_brand")
      .agg(count(lit(1)).as("n"), sum("lq").as("sq"), sum("lp").as("sp"),
        sum(col("lp") * col("lq")).as("spq"),
        sum(col("lp") * col("lp")).as("spp"))
    val eps = mom.select(col("p_brand"), col("n"),
      ((col("n") * col("spq") - col("sp") * col("sq")).cast("double") /
        (col("n") * col("spp") - col("sp") * col("sp")).cast("double"))
        .as("e"))
    eps.select(col("p_brand"), col("n").as("n_lines"),
        round(col("e"), 4).as("elasticity"),
        round(when(col("e") < -1, lit(-1.0) / col("e")), 4)
          .as("lerner_markup"),
        round(when(col("e") < -1, col("e") / (col("e") + 1)), 4)
          .as("price_over_cost"))
      .orderBy(col("elasticity").asc, col("p_brand").asc)
      .limit(15)
  }

  // ---- E-398 double-jeopardy check -----------------------------------------------
  // Ehrenberg's law: small brands suffer twice — fewer buyers AND
  // lower purchase frequency per buyer. Per brand: penetration =
  // distinct buyers ∕ customers, frequency = brand orders ∕ buyers
  // (exact integers, one division each, 1e-9-quantized for the
  // cross-brand corr moments); the penetration-frequency Pearson
  // correlation broadcast onto the top-15 penetration rows — positive
  // corr = the law holds in this category.
  def extDoublejeopardy(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "lineitem")
      .join(t(s, dir, "part").select(col("p_partkey").as("l_partkey"),
        col("p_brand")), Seq("l_partkey"))
      .join(t(s, dir, "orders").select(col("o_orderkey").as("l_orderkey"),
        col("o_custkey")), Seq("l_orderkey"))
    val perBrand = base.groupBy("p_brand")
      .agg(countDistinct("o_custkey").as("buyers"),
        countDistinct("l_orderkey").as("brand_orders"))
    val tot = t(s, dir, "customer").agg(count(lit(1)).as("nc")).limit(1)
    val rates = perBrand.crossJoin(broadcast(tot))
      .select(col("p_brand"), col("buyers"), col("brand_orders"),
        round(col("buyers").cast("double") * 1e9 / col("nc")).cast("long")
          .as("penq"),
        round(col("brand_orders").cast("double") * 1e9 / col("buyers"))
          .cast("long").as("freqq"))
    val corr = rates.agg(count(lit(1)).as("g"),
        sum(col("penq").cast("decimal(38,0)")).as("sp"),
        sum(col("freqq").cast("decimal(38,0)")).as("sf"),
        sum(col("penq").cast("decimal(38,0)") * col("freqq")).as("spf"),
        sum(col("penq").cast("decimal(38,0)") * col("penq")).as("spp"),
        sum(col("freqq").cast("decimal(38,0)") * col("freqq")).as("sff"))
      .select(round(
        (col("g") * col("spf") - col("sp") * col("sf")).cast("double") /
          sqrt((col("g") * col("spp") - col("sp") * col("sp"))
            .cast("double")) /
          sqrt((col("g") * col("sff") - col("sf") * col("sf"))
            .cast("double")), 4).as("dj_corr"))
      .limit(1)
    rates.crossJoin(broadcast(corr))
      .select(col("p_brand"), col("buyers"),
        round(col("penq").cast("double") / 1e9, 6).as("penetration"),
        round(col("freqq").cast("double") / 1e9, 4).as("freq_per_buyer"),
        col("dj_corr"))
      .orderBy(desc("penetration"), asc("p_brand"))
      .limit(15)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_bass" -> (extBass _),
    "ext_lerner" -> (extLerner _),
    "ext_doublejeopardy" -> (extDoublejeopardy _))

  val oracleSql: Map[String, String] = Map(
    // E-396: identical adoption series and centered Cramer solve.
    "ext_bass" ->
      """with adopt as (select d, cast(count(*) as bigint) nt from (
        |    select o_custkey, min(cast(o_orderdate as date)) d
        |    from orders group by 1) group by d),
        |srs as (select nt y,
        |    cast(coalesce(sum(nt) over (order by d
        |      rows between unbounded preceding and 1 preceding), 0)
        |      as bigint) x1
        |  from adopt),
        |dat as (select y, x1, x1 * x1 x2 from srs),
        |agg as (select cast(count(*) as bigint) n,
        |    cast(sum(x1) as bigint) s1, cast(sum(x2) as bigint) s2,
        |    cast(sum(y) as bigint) sy,
        |    sum(cast(x1 as hugeint) * x1) s11,
        |    sum(cast(x2 as hugeint) * x2) s22,
        |    sum(cast(x1 as hugeint) * x2) s12,
        |    sum(cast(x1 as hugeint) * y) s1y,
        |    sum(cast(x2 as hugeint) * y) s2y,
        |    sum(cast(y as hugeint) * y) syy
        |  from dat),
        |ct as (select n,
        |    cast(s1 as double) / n m1, cast(s2 as double) / n m2,
        |    cast(sy as double) / n my,
        |    cast(s11 as double) - n * (cast(s1 as double) / n) *
        |      (cast(s1 as double) / n) c11,
        |    cast(s22 as double) - n * (cast(s2 as double) / n) *
        |      (cast(s2 as double) / n) c22,
        |    cast(s12 as double) - n * (cast(s1 as double) / n) *
        |      (cast(s2 as double) / n) c12,
        |    cast(s1y as double) - n * (cast(s1 as double) / n) *
        |      (cast(sy as double) / n) c1y,
        |    cast(s2y as double) - n * (cast(s2 as double) / n) *
        |      (cast(sy as double) / n) c2y,
        |    cast(syy as double) - n * (cast(sy as double) / n) *
        |      (cast(sy as double) / n) cyy
        |  from agg),
        |fit as (select n, m1, m2, my, c1y, c2y, cyy,
        |    (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) b1,
        |    (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) b2
        |  from ct),
        |fin as (select n, b1, b2, my - b1 * m1 - b2 * m2 a,
        |    (b1 * c1y + b2 * c2y) / cyy r2
        |  from fit),
        |mm as (select n, a, b1, b2, r2,
        |    (-b1 - sqrt(b1 * b1 - 4.0 * a * b2)) / (2.0 * b2) m
        |  from fin)
        |select n n_days, round(a, 4) coef_a, round(b1, 6) coef_b1,
        |  round(b2 * 1e9, 6) coef_b2_x1e9,
        |  round(m, 1) market_size_hat,
        |  round(a / m, 6) p_innovation,
        |  round(a / m + b1, 6) q_imitation,
        |  round(r2, 4) r2
        |from mm""".stripMargin,

    // E-397: identical quantized logs, exact-moment slope, Lerner rule.
    "ext_lerner" ->
      """with li as (select p_brand,
        |    cast(cast(round(ln(l_quantity) * 1e6) as bigint)
        |      as hugeint) lq,
        |    cast(cast(round(ln(l_extendedprice / l_quantity) * 1e6)
        |      as bigint) as hugeint) lp
        |  from lineitem join part on p_partkey = l_partkey
        |  where l_quantity > 0),
        |mom as (select p_brand, cast(count(*) as bigint) n,
        |    sum(lq) sq, sum(lp) sp, sum(lp * lq) spq, sum(lp * lp) spp
        |  from li group by 1),
        |eps as (select p_brand, n,
        |    cast(n * spq - sp * sq as double) /
        |      cast(n * spp - sp * sp as double) e
        |  from mom)
        |select p_brand, n n_lines, round(e, 4) elasticity,
        |  round(case when e < -1 then -1.0 / e end, 4) lerner_markup,
        |  round(case when e < -1 then e / (e + 1) end, 4)
        |    price_over_cost
        |from eps
        |order by elasticity asc, p_brand asc limit 15""".stripMargin,

    // E-398: identical rates, quantization, corr moments.
    "ext_doublejeopardy" ->
      """with base as (select p_brand, o_custkey, l_orderkey
        |  from lineitem
        |  join part on p_partkey = l_partkey
        |  join orders on o_orderkey = l_orderkey),
        |pb as (select p_brand,
        |    cast(count(distinct o_custkey) as bigint) buyers,
        |    cast(count(distinct l_orderkey) as bigint) brand_orders
        |  from base group by 1),
        |tot as (select cast(count(*) as bigint) nc from customer),
        |rates as (select p_brand, buyers, brand_orders,
        |    cast(round(cast(buyers as double) * 1e9 / nc) as bigint) penq,
        |    cast(round(cast(brand_orders as double) * 1e9 / buyers)
        |      as bigint) freqq
        |  from pb cross join tot),
        |corr as (select round(
        |    cast(count(*) * sum(cast(penq as hugeint) * freqq) -
        |      sum(cast(penq as hugeint)) * sum(cast(freqq as hugeint))
        |      as double) /
        |    sqrt(cast(count(*) * sum(cast(penq as hugeint) * penq) -
        |      sum(cast(penq as hugeint)) * sum(cast(penq as hugeint))
        |      as double)) /
        |    sqrt(cast(count(*) * sum(cast(freqq as hugeint) * freqq) -
        |      sum(cast(freqq as hugeint)) * sum(cast(freqq as hugeint))
        |      as double)), 4) dj_corr
        |  from rates)
        |select p_brand, buyers,
        |  round(cast(penq as double) / 1e9, 6) penetration,
        |  round(cast(freqq as double) / 1e9, 4) freq_per_buyer, dj_corr
        |from rates cross join corr
        |order by penetration desc, p_brand asc limit 15""".stripMargin)
}
