package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 extension queries, batch 127: two LLM-data-pipeline audits
  * the inventory lacked — contamination LENGTH (E-47 decontamination
  * answers "does a train doc share any n-gram with the benchmark";
  * E-475 answers "HOW LONG is the longest verbatim overlap", the
  * quantity Lee et al.-style substring dedup and leakage audits act
  * on) and per-source distribution divergence (E-65 PSI bins a numeric
  * column; E-476 measures each SOURCE's unigram distribution against
  * the rest of the corpus — the data-mixing audit deciding which
  * source is distributionally alien).
  */
object ExtensionQueries127 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Document-frequency cap for the gram inverted index (the E-227
    * dfCap discipline): a gram shared by > cap docs is stop-gram noise
    * whose pair fan-out is cap² — dropped identically on both engines.
    * A no-op at fixture vocabularies; mandatory at 100 TB.
    */
  val GramDfCap = 1000L

  // ---- E-475 longest shared n-gram run (contamination span length) -----------------
  // For every doc pair sharing at least one 5-gram: the matching gram
  // START POSITIONS (ia, ib) of a verbatim overlap advance together,
  // so a shared token span of length L appears as L−4 consecutive ia
  // on one DIAGONAL d = ia − ib. Gaps-and-islands per (a, b, d) —
  // island key = ia − row_number() — turns each maximal run into one
  // group; longest overlap = max run + 4 tokens. Everything is
  // integer-exact (positions, counts), so the top-20 cut
  // (len desc, pair asc) is hash-stable. Planted near-dups surface
  // with near-full-document spans; coincidental single-gram collisions
  // floor at exactly 5 — the separation a leakage audit acts on.
  //
  // Scale shape: one gram projection (no shuffle), one df-capped
  // self-join on the gram (the dupspan inverted index), one window
  // over (pair, diagonal) groups — never a doc×doc product.
  def extSpanoverlap(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 5)
    val grams = toks.select(col("doc_id"), explode(
        transform(sequence(lit(1), size(col("tk")) - 4), i =>
          struct(i.as("i"), concat_ws(" ",
            (0 until 5).map(k => element_at(col("tk"), i + lit(k))): _*)
            .as("g")))).as("x"))
      .select(col("doc_id"), col("x.i"), col("x.g"))
    val df = grams.groupBy("g").agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") <= GramDfCap)
    val pruned = grams.join(df.select("g"), "g")
    val matches = pruned.select(col("g"), col("doc_id").as("a"), col("i").as("ia"))
      .join(pruned.select(col("g"), col("doc_id").as("b"), col("i").as("ib")), "g")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("ia"), col("ib"))
      .distinct() // one (a,b,ia,ib) even if the gram string repeats in-doc
    val w = Window.partitionBy(col("a"), col("b"), col("ia") - col("ib"))
      .orderBy("ia")
    val runs = matches
      .withColumn("isl", col("ia") - row_number().over(w))
      .groupBy(col("a"), col("b"), (col("ia") - col("ib")).as("d"), col("isl"))
      .agg(count(lit(1)).as("run"))
    runs.groupBy("a", "b")
      .agg((max("run") + 4).as("len_tokens"),
        count(lit(1)).as("n_runs"),
        sum("run").as("gram_matches"))
      .orderBy(desc("len_tokens"), asc("a"), asc("b"))
      .limit(20)
      .select(col("a").as("doc_a"), col("b").as("doc_b"),
        col("len_tokens"), col("n_runs"), col("gram_matches"))
  }

  // ---- E-476 per-source Jensen–Shannon divergence (data-mixing audit) ---------------
  // Each source s against the REST of the corpus: P = s's unigram
  // distribution, Q = the complement's, JS = ½·KL(P‖M) + ½·KL(Q‖M)
  // with M = (P+Q)/2 — symmetric, bounded by ln 2, zero iff the source
  // is distributionally indistinguishable. All probabilities are exact
  // integer-count ratios; each p·ln(p/m) term is 1e-9-quantized BEFORE
  // the fold (the E-339/E-381 discipline — a sum of longs is exact in
  // any order, so the only engine-sensitive step is libm's ln at 1e-9,
  // the established house tolerance). Output per source: token totals
  // and js9 (nats, 9 dp), ranked js desc. Scale shape: one token
  // explode → (source, token) counts, a sources × vocab grid (the
  // honest 100 TB shape — vocab-bounded, never corpus-bounded), one
  // quantized fold.
  def extJsdiv(s: SparkSession, dir: String): DataFrame = {
    val tok = t(s, dir, "documents")
      .select(col("source"),
        explode(filter(split(col("text"), " "), x => x =!= "")).as("tk"))
    val cst = tok.groupBy("source", "tk").agg(count(lit(1)).as("c"))
      .localCheckpoint() // three downstream aggregates read it
    val ct = cst.groupBy("tk").agg(sum("c").as("ct"))
    val ns = cst.groupBy("source").agg(sum("c").as("ns"))
    val n = cst.agg(sum("c")).head().getLong(0)
    // the sources × vocab grid WITHOUT an unbounded cartesian: the
    // source dimension collapses to ONE row (ungrouped collect_list —
    // structurally bounded, so the nested-loop join passes the
    // PlanQualitySpec gate) and re-expands by explode AFTER the join;
    // at 100 TB this is a broadcast of the source list over the
    // vocab-bounded token table
    val srcs = ns.agg(collect_list(struct(col("source"), col("ns"))).as("ss"))
    val grid = ct.crossJoin(srcs)
      .select(col("tk"), col("ct"), explode(col("ss")).as("s"))
      .select(col("s.source").as("source"), col("s.ns").as("ns"),
        col("tk"), col("ct"))
      .join(cst, Seq("source", "tk"), "left")
      .select(col("source"), col("ns"), col("ct"),
        coalesce(col("c"), lit(0L)).as("cs"))
    val terms = grid
      .withColumn("p", col("cs").cast("double") / col("ns"))
      // degenerate guard: when one source comprises the whole corpus
      // (n == ns) the complement is empty — define q = 0 explicitly on
      // BOTH engines (Spark's Divide yields NULL on /0, DuckDB differs)
      .withColumn("q", when(lit(n) =!= col("ns"),
        (col("ct") - col("cs")).cast("double") / (lit(n) - col("ns")))
        .otherwise(lit(0.0)))
      .withColumn("m", (col("p") + col("q")) / 2)
      .select(col("source"), col("ns"),
        (when(col("p") > 0, round(col("p") * log(col("p") / col("m")) * 1e9)
          .cast("long")).otherwise(0L) +
         when(col("q") > 0, round(col("q") * log(col("q") / col("m")) * 1e9)
          .cast("long")).otherwise(0L)).as("termq"))
    terms.groupBy("source")
      .agg(first("ns").as("n_tokens"),
        round(sum("termq").cast("double") / 2e9, 9).as("js9"))
      .orderBy(desc("js9"), asc("source"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_spanoverlap" -> (extSpanoverlap _),
    "ext_jsdiv" -> (extJsdiv _))

  val oracleSql: Map[String, String] = Map(
    // E-475: same gram index, df cap, diagonal islands, top-20 cut.
    "ext_spanoverlap" ->
      s"""with toks as (
        |  select doc_id, string_split(text, ' ') tk from documents
        |  where len(string_split(text, ' ')) >= 5),
        |grams as (
        |  select doc_id, i, array_to_string(tk[i:i+4], ' ') g
        |  from toks, unnest(generate_series(1, len(tk) - 4)) t(i)),
        |keep as (
        |  select g from grams group by g
        |  having count(distinct doc_id) <= $GramDfCap),
        |pruned as (select gr.* from grams gr join keep k on k.g = gr.g),
        |matches as (
        |  select distinct a.doc_id a, b.doc_id b, a.i ia, b.i ib
        |  from pruned a join pruned b on a.g = b.g and a.doc_id < b.doc_id),
        |runs as (
        |  select a, b, ia - ib d,
        |    ia - row_number() over (partition by a, b, ia - ib order by ia) isl
        |  from matches),
        |agg as (
        |  select a, b, d, isl, cast(count(*) as bigint) run
        |  from runs group by 1, 2, 3, 4)
        |select a doc_a, b doc_b,
        |  cast(max(run) + 4 as bigint) len_tokens,
        |  cast(count(*) as bigint) n_runs,
        |  cast(sum(run) as bigint) gram_matches
        |from agg group by 1, 2
        |order by len_tokens desc, doc_a, doc_b limit 20""".stripMargin,

    // E-476: identical grid + quantized fold; ln is DuckDB's natural log.
    "ext_jsdiv" ->
      """with tok as (
        |  select source, u.tk from (
        |    select source, unnest(string_split(text, ' ')) tk
        |    from documents) u where u.tk <> ''),
        |cst as (select source, tk, cast(count(*) as bigint) c
        |  from tok group by 1, 2),
        |ct as (select tk, cast(sum(c) as bigint) ct from cst group by 1),
        |ns as (select source, cast(sum(c) as bigint) ns from cst group by 1),
        |nn as (select cast(sum(c) as bigint) n from cst),
        |grid as (
        |  select ns.source, ns.ns, ct.tk, ct.ct,
        |    cast(coalesce(c.c, 0) as bigint) cs
        |  from ns cross join ct
        |  left join cst c on c.source = ns.source and c.tk = ct.tk),
        |terms as (
        |  select source, ns,
        |    cast(cs as double) / ns p,
        |    case when nn.n = ns then 0
        |      else cast(ct - cs as double) / (nn.n - ns) end q
        |  from grid, nn),
        |qterms as (
        |  select source, ns,
        |    (case when p > 0
        |       then cast(round(p * ln(p / ((p + q) / 2)) * 1e9) as bigint)
        |       else 0 end +
        |     case when q > 0
        |       then cast(round(q * ln(q / ((p + q) / 2)) * 1e9) as bigint)
        |       else 0 end) termq
        |  from terms)
        |select source, any_value(ns) n_tokens,
        |  round(cast(sum(termq) as double) / 2e9, 9) js9
        |from qterms group by source
        |order by js9 desc, source""".stripMargin)
}
