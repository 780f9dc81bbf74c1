package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 65: corpus stylometry and data
  * profiling — Burrows' Delta authorship distance between languages,
  * Gries' DP token dispersion across sources, the psychological
  * price-ending audit, and a declared functional-dependency audit.
  */
object ExtensionQueries65 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def toks(s: SparkSession, dir: String, by: String): DataFrame =
    t(s, dir, "documents")
      .select(col(by),
        explode(filter(split(col("text"), " "), x => x =!= "")).as("tok"))

  // ---- E-348 Burrows' Delta ------------------------------------------------------
  // The stylometry classic between language sub-corpora: z-score each
  // of the top-20 corpus tokens' relative frequencies across the 5
  // languages, then Delta(a,b) = mean |z_a − z_b| over the tokens.
  // Tokens and langs are bounded spines (limit-capped); z-scores are
  // quantized to 1e-6 before the pair fold so the 10 pair rows settle
  // identically on both engines.
  def extBurrows(s: SparkSession, dir: String): DataFrame = {
    val tk = toks(s, dir, "lang")
    val top = tk.groupBy("tok").agg(count(lit(1)).as("cf"))
      .orderBy(desc("cf"), asc("tok")).limit(20).select("tok")
    val langTotals = tk.groupBy("lang").agg(count(lit(1)).as("nl"))
      .limit(8) // closed lang domain; structural cap
    val counts = tk.join(broadcast(top), "tok")
      .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
    val grid = langTotals.crossJoin(broadcast(top))
      .join(counts, Seq("lang", "tok"), "left")
      .select(col("lang"), col("tok"),
        (coalesce(col("c"), lit(0L)).cast("double") / col("nl")).as("f"))
    // per-token mean/sd over the 5 langs (population sd, n = #langs)
    val stats = grid.groupBy("tok")
      .agg(count(lit(1)).as("nlang"), avg("f").as("mu"),
        sqrt(avg(col("f") * col("f")) - avg("f") * avg("f")).as("sd"))
    val z = grid.join(stats, "tok")
      .select(col("lang"), col("tok"),
        when(col("sd") > 0,
          round((col("f") - col("mu")) / col("sd") * 1e6).cast("long"))
          .otherwise(0L).as("zq"))
    val za = z.select(col("lang").as("lang_a"), col("tok"), col("zq").as("za"))
    val zb = z.select(col("lang").as("lang_b"), col("tok"), col("zq").as("zb"))
    za.join(zb, Seq("tok")).filter(col("lang_a") < col("lang_b"))
      .groupBy("lang_a", "lang_b")
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(abs(col("za") - col("zb"))).cast("double") /
          count(lit(1)) / 1e6, 6).as("burrows_delta"))
      .orderBy("lang_a", "lang_b")
  }

  // ---- E-349 Gries' DP dispersion ------------------------------------------------
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

  // ---- E-350 price-ending audit --------------------------------------------------
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

  // ---- E-351 functional-dependency audit -----------------------------------------
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
    "ext_burrows" -> (extBurrows _),
    "ext_dispersion" -> (extDispersion _),
    "ext_priceending" -> (extPriceending _),
    "ext_fdaudit" -> (extFdaudit _))

  val oracleSql: Map[String, String] = Map(
    // E-348: identical top-token spine, z quantization, pair fold.
    "ext_burrows" ->
      """with tk as (select lang,
        |    unnest(list_filter(string_split(text, ' '), w -> w <> '')) tok
        |  from documents),
        |top as (select tok from (select tok, count(*) cf from tk
        |  group by tok order by cf desc, tok limit 20)),
        |lt as (select lang, cast(count(*) as bigint) nl
        |  from tk group by lang),
        |cnt as (select lang, tk.tok, cast(count(*) as bigint) c
        |  from tk join top on tk.tok = top.tok group by lang, tk.tok),
        |grid as (select lt.lang, top.tok,
        |    cast(coalesce(cnt.c, 0) as double) / lt.nl f
        |  from lt cross join top
        |  left join cnt on cnt.lang = lt.lang and cnt.tok = top.tok),
        |st as (select tok, avg(f) mu,
        |    sqrt(avg(f * f) - avg(f) * avg(f)) sd
        |  from grid group by tok),
        |z as (select lang, grid.tok,
        |    case when sd > 0 then
        |      cast(round((f - mu) / sd * 1e6) as bigint) else 0 end zq
        |  from grid join st on grid.tok = st.tok)
        |select a.lang lang_a, b.lang lang_b,
        |  cast(count(*) as bigint) n_tokens,
        |  round(cast(sum(abs(a.zq - b.zq)) as double) / count(*) / 1e6, 6)
        |    burrows_delta
        |from z a join z b on a.tok = b.tok and a.lang < b.lang
        |group by a.lang, b.lang order by lang_a, lang_b""".stripMargin,

    // E-349: identical spine, expected shares, and quantized diffs.
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

    // E-350: identical ending extraction and χ² fold.
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

    // E-351: identical FD checks and union.
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
