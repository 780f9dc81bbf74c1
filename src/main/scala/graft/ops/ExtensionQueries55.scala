package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 55: survey weighting and community
  * quality — raking (iterative proportional fitting, two unrolled
  * rounds) and the modularity of a GIVEN graph partition from exact
  * integer degree sums.
  */
object ExtensionQueries55 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-321 raking (iterative proportional fitting) -----------------------------
  // Re-weight a hash-sampled half of customers so its (nation-group ×
  // segment) margins match the full population: two unrolled IPF
  // rounds (row-scale then column-scale, each a margin ratio — exact
  // rational targets over settled products). Reported per cell with
  // the post-raking row-margin error — after round 2 the row margins
  // are exact by construction and column margins nearly so; nations
  // fold into 5 region-ish groups (nk mod 5) to keep cells populated.
  def extRaking(s: SparkSession, dir: String): DataFrame = {
    val h60 = conv(substring(sha2(col("c_custkey").cast("string"), 256),
      1, 15), 16, 10).cast("long")
    val c = t(s, dir, "customer")
      .select(pmod(col("c_nationkey"), lit(5L)).as("r"),
        col("c_mktsegment").as("sg"), pmod(h60, lit(2L)).as("coin"))
    val pop = c.groupBy("r", "sg").agg(count(lit(1)).as("n_pop"))
    val popR = c.groupBy("r").agg(count(lit(1)).as("pop_r"))
    val popS = c.groupBy("sg").agg(count(lit(1)).as("pop_s"))
    val samp = c.filter(col("coin") === 0)
      .groupBy("r", "sg").agg(count(lit(1)).as("n_s"))
    // round 1: scale each cell so ROW (r) margins match the population
    val w1 = samp
      .join(samp.groupBy("r").agg(sum("n_s").as("s_r")), "r")
      .join(popR, "r")
      .withColumn("w1",
        col("pop_r").cast("double") / col("s_r"))
    // round 2: scale so COLUMN (sg) margins match
    val colTot = w1.groupBy("sg")
      .agg(sum(col("n_s").cast("double") * col("w1")).as("s_s"))
    val w2 = w1.join(colTot, "sg").join(popS, "sg")
      .withColumn("w2", col("w1") * col("pop_s").cast("double") / col("s_s"))
    val rowErr = w2.groupBy("r")
      .agg(sum(col("n_s").cast("double") * col("w2")).as("wsum_r"))
      .join(popR, "r")
      .select(col("r"),
        round(abs(col("wsum_r") - col("pop_r")) / col("pop_r"), 6)
          .as("row_margin_err"))
    w2.join(pop, Seq("r", "sg"))
      .join(rowErr, "r")
      .select(col("r"), col("sg"), col("n_s"), col("n_pop"),
        round(col("w2"), 6).as("weight"),
        round(col("n_s").cast("double") * col("w2"), 4).as("weighted_n"),
        col("row_margin_err"))
      .orderBy("r", "sg")
  }

  // ---- E-322 partition modularity ------------------------------------------------
  // Is BRAND a real community structure on the co-order part graph?
  // Modularity Q = Σ_c (e_c/m − (d_c/2m)²) for the brand partition —
  // within-community edge share vs
  // the degree-preserving null. Every term from exact integer counts;
  // Q is a short settled fold over ≤25 communities — the partition-
  // quality number community detection optimizes, computed for the
  // catalog's own grouping.
  def extModularity(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
    val edges = li.select(col("l_orderkey").as("o"), col("l_partkey").as("u"))
      .join(li.select(col("l_orderkey").as("o"), col("l_partkey").as("v")), "o")
      .filter(col("u") < col("v")).select("u", "v").distinct()
    val brand = t(s, dir, "part")
      .select(col("p_partkey"), col("p_brand"))
    val tagged = edges
      .join(brand.select(col("p_partkey").as("u"), col("p_brand").as("bu")),
        "u")
      .join(brand.select(col("p_partkey").as("v"), col("p_brand").as("bv")),
        "v")
    val m = tagged.agg(count(lit(1)).as("m"))
    val within = tagged.filter(col("bu") === col("bv"))
      .groupBy(col("bu").as("b")).agg(count(lit(1)).as("ec"))
    val deg = tagged.select(col("bu").as("b"))
      .unionAll(tagged.select(col("bv").as("b")))
      .groupBy("b").agg(count(lit(1)).as("dc"))
    val per = deg.join(within, Seq("b"), "left")
      .select(col("b"), coalesce(col("ec"), lit(0L)).as("ec"), col("dc"))
    per.crossJoin(broadcast(m))
      .agg(max("m").as("m_edges"), count(lit(1)).as("n_communities"),
        round(sum(col("ec").cast("double") / col("m") -
          (col("dc").cast("double") / (col("m") * 2)) *
            (col("dc").cast("double") / (col("m") * 2))), 6)
          .as("modularity"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_raking" -> (extRaking _),
    "ext_modularity" -> (extModularity _))

  val oracleSql: Map[String, String] = Map(
    // E-321: identical two unrolled IPF rounds.
    "ext_raking" ->
      """with c as (select c_nationkey % 5 r, c_mktsegment sg,
        |    ('0x' || substr(sha256(cast(c_custkey as varchar)), 1, 15))::bigint
        |      % 2 coin
        |  from customer),
        |pop as (select r, sg, cast(count(*) as bigint) n_pop
        |  from c group by r, sg),
        |pop_r as (select r, cast(count(*) as bigint) pop_r
        |  from c group by r),
        |pop_s as (select sg, cast(count(*) as bigint) pop_s
        |  from c group by sg),
        |samp as (select r, sg, cast(count(*) as bigint) n_s
        |  from c where coin = 0 group by r, sg),
        |sr as (select r, cast(sum(n_s) as bigint) s_r from samp group by r),
        |w1 as (select samp.r, sg, n_s,
        |    cast(pop_r as double) / s_r w1
        |  from samp join sr on sr.r = samp.r
        |  join pop_r on pop_r.r = samp.r),
        |ct as (select sg, sum(cast(n_s as double) * w1) s_s
        |  from w1 group by sg),
        |w2 as (select w1.r, w1.sg, n_s,
        |    w1 * cast(pop_s as double) / s_s w2
        |  from w1 join ct on ct.sg = w1.sg
        |  join pop_s on pop_s.sg = w1.sg),
        |re as (select w2.r,
        |    round(abs(sum(cast(n_s as double) * w2) - max(pop_r))
        |      / max(pop_r), 6) row_margin_err
        |  from w2 join pop_r on pop_r.r = w2.r group by w2.r)
        |select w2.r, w2.sg, n_s, n_pop,
        |  round(w2, 6) weight,
        |  round(cast(n_s as double) * w2, 4) weighted_n,
        |  row_margin_err
        |from w2 join pop on pop.r = w2.r and pop.sg = w2.sg
        |join re on re.r = w2.r
        |order by w2.r, w2.sg""".stripMargin,

    // E-322: identical integer edge/degree shares.
    "ext_modularity" ->
      """with e0 as (select distinct a.l_partkey u, b.l_partkey v
        |  from lineitem a join lineitem b
        |  on a.l_orderkey = b.l_orderkey and a.l_partkey < b.l_partkey),
        |tagged as (select u, v, pu.p_brand bu, pv.p_brand bv
        |  from e0 join part pu on pu.p_partkey = u
        |  join part pv on pv.p_partkey = v),
        |m as (select cast(count(*) as bigint) m from tagged),
        |within as (select bu b, cast(count(*) as bigint) ec
        |  from tagged where bu = bv group by bu),
        |deg as (select b, cast(count(*) as bigint) dc from (
        |  select bu b from tagged union all select bv from tagged)
        |  group by b),
        |per as (select deg.b, coalesce(ec, 0) ec, dc
        |  from deg left join within on within.b = deg.b)
        |select max(m) m_edges, cast(count(*) as bigint) n_communities,
        |  round(sum(cast(ec as double) / m -
        |    (cast(dc as double) / (m * 2)) *
        |    (cast(dc as double) / (m * 2))), 6) modularity
        |from per cross join m""".stripMargin)
}
