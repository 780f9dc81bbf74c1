package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 65: corpus and data profiling —
  * Gries' DP token dispersion across sources, the psychological
  * price-ending audit, and a declared functional-dependency audit.
  * (A Burrows' Delta variant was dropped as a duplicate of E-285.)
  */
object ExtensionQueries65 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def toks(s: SparkSession, dir: String, by: String): DataFrame =
    t(s, dir, "documents")
      .select(col(by),
        explode(filter(split(col("text"), " "), x => x =!= "")).as("tok"))

  // ---- E-345 Gries' DP dispersion ------------------------------------------------
  // How evenly is each frequent token spread over the 20 sources?
  // DP = 0.5·Σ_s |obs_share_s − expected_share_s| where expected is the
  // source's share of the whole corpus — 0 = perfectly proportional,
  // →1 = concentrated in one source. The clumping view ext_burstiness
  // (within-doc Fano) doesn't give. Per-source |diffs| quantized to
  // 1e-9; top-15 most clumped of the top-30 tokens.
  def extDispersion(s: SparkSession, dir: String): DataFrame = {
    val tk = toks(s, dir, "source")
    val top = tk.groupBy("tok").agg(count(lit(1)).as("cf"))
      .orderBy(desc("cf"), asc("tok")).limit(30)
    val srcTotals = tk.groupBy("source").agg(count(lit(1)).as("ns"))
      .limit(32) // closed source domain; structural cap
    val corpus = tk.agg(count(lit(1)).as("nc"))
    val counts = tk.join(broadcast(top.select("tok")), "tok")
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
    val grid = srcTotals.crossJoin(broadcast(corpus))
      .crossJoin(broadcast(top))
      .join(counts, Seq("source", "tok"), "left")
      .select(col("tok"), col("cf"),
        round(abs(coalesce(col("c"), lit(0L)).cast("double") / col("cf") -
          col("ns").cast("double") / col("nc")) * 1e9).cast("long")
          .as("dq"))
    grid.groupBy("tok")
      .agg(max("cf").as("cf"),
        round(sum("dq").cast("double") / 2 / 1e9, 6).as("gries_dp"))
      .orderBy(desc("gries_dp"), asc("tok"))
      .limit(15)
  }

  // ---- E-346 price-ending audit --------------------------------------------------
  // Psychological pricing screen: the distribution of the last two
  // cent digits of order totals vs the uniform 1/100 expectation, with
  // the overall χ² as a constant column (the ext_benford convention).
  // Counts are exact integers; χ² is one settled fold. Top-10 endings.
  def extPriceending(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "orders")
      .select(pmod(round(col("o_totalprice") * 100).cast("long"),
        lit(100L)).as("ending"))
    val dist = e.groupBy("ending").agg(count(lit(1)).as("n"))
    val withTot = dist.withColumn("nt",
      sum("n").over(org.apache.spark.sql.expressions.Window.partitionBy()))
    val tot = withTot.agg(max("nt").as("nt"),
      round(sum((col("n") * 100 - col("nt")).cast("double") *
        (col("n") * 100 - col("nt")) / (col("nt") * 100)), 4).as("chi2"))
    dist.crossJoin(broadcast(tot))
      .select(col("ending"), col("n"),
        round(col("n").cast("double") / col("nt"), 6).as("frac"),
        col("chi2"))
      .orderBy(desc("n"), asc("ending"))
      .limit(10)
  }

  // ---- E-347 functional-dependency audit -----------------------------------------
  // Data-profiling: do the declared FDs actually hold? For each
  // candidate A→B: keys = distinct A, violations = A-values with >1
  // distinct B. Two true FDs (custkey→nationkey, partkey→brand) and
  // two expected failures (nationkey→mktsegment, brand→type) — the
  // discovery report a schema-inference pass starts from. One grouped
  // aggregate per FD, unioned.
  def extFdaudit(s: SparkSession, dir: String): DataFrame = {
    def fd(df: DataFrame, name: String, a: Column, b: Column): DataFrame =
      df.select(a.as("a"), b.as("b"))
        .groupBy("a").agg(countDistinct("b").as("nb"))
        .agg(lit(name).as("fd"), count(lit(1)).as("n_keys"),
          sum(when(col("nb") > 1, 1L).otherwise(0L)).as("n_violating"))
        .select(col("fd"), col("n_keys"), col("n_violating"),
          (col("n_violating") === 0).as("holds"))
    fd(t(s, dir, "customer"), "custkey->nationkey",
        col("c_custkey"), col("c_nationkey"))
      .unionAll(fd(t(s, dir, "part"), "partkey->brand",
        col("p_partkey"), col("p_brand")))
      .unionAll(fd(t(s, dir, "customer"), "nationkey->mktsegment",
        col("c_nationkey"), col("c_mktsegment")))
      .unionAll(fd(t(s, dir, "part"), "brand->type",
        col("p_brand"), col("p_type")))
      .orderBy("fd")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_dispersion" -> (extDispersion _),
    "ext_priceending" -> (extPriceending _),
    "ext_fdaudit" -> (extFdaudit _))

  val oracleSql: Map[String, String] = Map(
    // E-345: identical spine, expected shares, and quantized diffs.
    "ext_dispersion" ->
      """with tk as (select source,
        |    unnest(list_filter(string_split(text, ' '), w -> w <> '')) tok
        |  from documents),
        |top as (select tok, cast(count(*) as bigint) cf from tk
        |  group by tok order by cf desc, tok limit 30),
        |st as (select source, cast(count(*) as bigint) ns
        |  from tk group by source),
        |corpus as (select cast(count(*) as bigint) nc from tk),
        |cnt as (select source, tk.tok, cast(count(*) as bigint) c
        |  from tk join top on tk.tok = top.tok group by source, tk.tok),
        |grid as (select top.tok, top.cf,
        |    cast(round(abs(cast(coalesce(cnt.c, 0) as double) / top.cf -
        |      cast(st.ns as double) / corpus.nc) * 1e9) as bigint) dq
        |  from st cross join corpus cross join top
        |  left join cnt on cnt.source = st.source and cnt.tok = top.tok)
        |select tok, max(cf) cf,
        |  round(cast(sum(dq) as double) / 2 / 1e9, 6) gries_dp
        |from grid group by tok
        |order by gries_dp desc, tok limit 15""".stripMargin,

    // E-346: identical ending extraction and χ² fold.
    "ext_priceending" ->
      """with e as (select cast(round(o_totalprice * 100) as bigint) % 100
        |    ending
        |  from orders),
        |dist as (select ending, cast(count(*) as bigint) n
        |  from e group by ending),
        |wt as (select ending, n,
        |    cast(sum(n) over () as bigint) nt from dist),
        |tot as (select max(nt) nt,
        |    round(sum(cast(n * 100 - nt as double) *
        |      (n * 100 - nt) / (nt * 100)), 4) chi2
        |  from wt)
        |select ending, n, round(cast(n as double) / nt, 6) frac, chi2
        |from dist cross join tot
        |order by n desc, ending limit 10""".stripMargin,

    // E-347: identical FD checks and union.
    "ext_fdaudit" ->
      """with f1 as (select 'custkey->nationkey' fd,
        |    cast(count(*) as bigint) n_keys,
        |    cast(sum(case when nb > 1 then 1 else 0 end) as bigint)
        |      n_violating
        |  from (select c_custkey a, count(distinct c_nationkey) nb
        |    from customer group by 1)),
        |f2 as (select 'partkey->brand' fd,
        |    cast(count(*) as bigint) n_keys,
        |    cast(sum(case when nb > 1 then 1 else 0 end) as bigint)
        |      n_violating
        |  from (select p_partkey a, count(distinct p_brand) nb
        |    from part group by 1)),
        |f3 as (select 'nationkey->mktsegment' fd,
        |    cast(count(*) as bigint) n_keys,
        |    cast(sum(case when nb > 1 then 1 else 0 end) as bigint)
        |      n_violating
        |  from (select c_nationkey a, count(distinct c_mktsegment) nb
        |    from customer group by 1)),
        |f4 as (select 'brand->type' fd,
        |    cast(count(*) as bigint) n_keys,
        |    cast(sum(case when nb > 1 then 1 else 0 end) as bigint)
        |      n_violating
        |  from (select p_brand a, count(distinct p_type) nb
        |    from part group by 1))
        |select fd, n_keys, n_violating, n_violating = 0 holds
        |from (select * from f1 union all select * from f2
        |  union all select * from f3 union all select * from f4)
        |order by fd""".stripMargin)
}
