package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** E-477 substring-level deduplication as an ACTION (the Lee et al.
  * "Deduplicating Training Data Makes Language Models Better" shape):
  * every token span of >= `minSpanTokens` shared verbatim between two
  * documents is REMOVED from the higher-doc_id copy, so exactly one
  * canonical occurrence survives per span cluster (the cluster's
  * minimum doc_id keeps its copy through every pair it wins).
  *
  * Built on the E-475 span-overlap substrate (gram inverted index with
  * a document-frequency cap + diagonal gaps-and-islands): matched
  * 5-gram start positions of a verbatim overlap advance together on
  * one diagonal d = ia − ib, so a maximal shared run of R grams is a
  * token span of R+4. What E-475 only measures, this operator acts on:
  *
  *   1. runs ≥ minSpanTokens become removal intervals on the LOSING
  *      (larger-id) side — [min(ib), min(ib)+R+3] in 1-based tokens;
  *   2. per-doc interval merge (running-max sweep) collapses
  *      overlapping/adjacent spans from different partners;
  *   3. surgery: the doc's token sequence minus the merged intervals,
  *      re-joined — integer-exact and hash-stable, so DuckDB replays
  *      the identical pipeline as the oracle.
  *
  * Scale shape (100 TB): one gram projection (no shuffle), one
  * df-capped equi self-join on the gram, windows over (pair, diagonal)
  * and (doc) groups, and an equi anti-join of exploded removal
  * positions against exploded token positions — shuffle volume is
  * O(tokens + matched grams), never a doc×doc product, and the
  * interval explode is bounded by the tokens actually removed.
  */
object SpanDedup {

  /** Default minimum shared-span length (tokens) that triggers removal.
    * Coincidental single-gram collisions floor at 5 tokens; planted
    * near-dups run near-full-document — 15 sits in the gap (Lee et al.
    * use 50 BPE tokens at web scale; the knob is the parameter).
    */
  val DefaultMinSpanTokens = 15

  /** Maximal shared runs >= minSpanTokens between doc pairs, as removal
    * intervals on the larger-id side: (doc_id, s, e) in 1-based token
    * positions, inclusive. `dfCap` is the E-227 stop-gram discipline:
    * grams shared by more docs are noise with cap² pair fan-out.
    */
  def removalSpans(docs: DataFrame, idCol: String, textCol: String,
      minSpanTokens: Int = DefaultMinSpanTokens,
      dfCap: Long = ExtensionQueries127.GramDfCap): DataFrame = {
    require(minSpanTokens >= 5, "span threshold below the 5-gram unit")
    val toks = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("tk"))
      .filter(size(col("tk")) >= 5)
    val grams = toks.select(col("doc_id"), explode(
        transform(sequence(lit(1), size(col("tk")) - 4), i =>
          struct(i.as("i"), concat_ws(" ",
            (0 until 5).map(k => element_at(col("tk"), i + lit(k))): _*)
            .as("g")))).as("x"))
      .select(col("doc_id"), col("x.i"), col("x.g"))
    val keep = grams.groupBy("g").agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") <= dfCap).select("g")
    val pruned = grams.join(keep, "g")
    val matches = pruned.select(col("g"), col("doc_id").as("a"), col("i").as("ia"))
      .join(pruned.select(col("g"), col("doc_id").as("b"), col("i").as("ib")), "g")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("ia"), col("ib"))
      .distinct()
    val w = Window.partitionBy(col("a"), col("b"), col("ia") - col("ib"))
      .orderBy("ia")
    matches
      .withColumn("isl", col("ia") - row_number().over(w))
      .groupBy(col("a"), col("b"), (col("ia") - col("ib")).as("d"), col("isl"))
      .agg(count(lit(1)).as("run"), min("ib").as("s"))
      .filter(col("run") >= minSpanTokens - 4)
      .select(col("b").as("doc_id"), col("s").cast("long").as("s"),
        (col("s") + col("run") + 3).cast("long").as("e"))
      .distinct()
  }

  /** Per-doc interval merge of (doc_id, s, e) spans: the running-max
    * sweep — a span opens a new island iff its start exceeds the max
    * end seen so far. Returns disjoint (doc_id, s, e).
    */
  def mergeSpans(spans: DataFrame): DataFrame = {
    val ord = Window.partitionBy("doc_id").orderBy("s", "e")
    val prevMax = max("e").over(ord.rowsBetween(Window.unboundedPreceding, -1))
    val withGrp = spans
      .withColumn("new_isl",
        when(col("s") > coalesce(prevMax, lit(Long.MinValue)), 1L).otherwise(0L))
      .withColumn("grp", sum("new_isl")
        .over(ord.rowsBetween(Window.unboundedPreceding, 0)))
    withGrp.groupBy("doc_id", "grp")
      .agg(min("s").as("s"), max("e").as("e"))
      .select("doc_id", "s", "e")
  }

  /** The surgery: rewrite `textCol` of every doc that owes removals,
    * dropping the tokens inside its merged spans. Docs with no removal
    * pass through unchanged; row count is preserved (this is a rewrite
    * stage, not a filter). Extra audit columns when `audit`:
    * span_n_spans, span_tokens_removed.
    */
  def removeSharedSpans(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      minSpanTokens: Int = DefaultMinSpanTokens,
      dfCap: Long = ExtensionQueries127.GramDfCap): DataFrame = {
    val merged = mergeSpans(removalSpans(docs, idCol, textCol, minSpanTokens, dfCap))
    val rewritten = rewrite(docs, merged, idCol, textCol)
      .select(col("doc_id").as(idCol), col("new_text"))
    docs.join(rewritten, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col("new_text"), col(textCol)))
      .drop("new_text")
  }

  /** Rewritten text + audit counts for docs with >= 1 merged removal
    * span: (doc_id, n_spans, tokens_removed, tokens_kept, new_text).
    * Positions explode to an equi anti-join (never a range join): at
    * scale the explode is sized by the removed tokens, not the corpus.
    */
  def rewrite(docs: DataFrame, merged: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("tk"))
    val tokpos = toks.select(col("doc_id"),
        posexplode(col("tk")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("p"), col("tok"))
    val rem = merged.select(col("doc_id"),
      explode(sequence(col("s"), col("e"))).as("p"))
    val kept = tokpos.join(rem, Seq("doc_id", "p"), "left_anti")
    val newText = kept.groupBy("doc_id")
      .agg(concat_ws(" ", transform(
        sort_array(collect_list(struct(col("p"), col("tok")))),
        x => x("tok"))).as("new_text"))
    val audit = merged.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).as("tokens_removed"))
    val totals = toks.select(col("doc_id"), size(col("tk")).cast("long").as("n_tok"))
    audit.join(totals, "doc_id")
      .join(newText, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        col("tokens_removed").cast("long").as("tokens_removed"),
        (col("n_tok") - col("tokens_removed")).cast("long").as("tokens_kept"),
        coalesce(col("new_text"), lit("")).as("new_text"))
  }

  // ---- E-477 query + oracle -------------------------------------------------

  /** ext_spandedup: the full action on the documents table — every doc
    * whose text lost at least one shared span, with the rewritten text
    * (integer positions + string surgery, so the oracle hash-matches).
    */
  def extSpandedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.table(s, dir, "documents")
    val merged = mergeSpans(removalSpans(docs, "doc_id", "text"))
    rewrite(docs, merged, "doc_id", "text")
      .orderBy("doc_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_spandedup" -> (extSpandedup _))

  val oracleSql: Map[String, String] = Map(
    // E-477: identical gram index, df cap, diagonal islands, >= 15-token
    // spans removed from the larger doc_id, interval merge, token surgery.
    "ext_spandedup" ->
      s"""with toks as (
        |  select doc_id, string_split(text, ' ') tk from documents),
        |grams as (
        |  select doc_id, i, array_to_string(tk[i:i+4], ' ') g
        |  from toks, unnest(generate_series(1, len(tk) - 4)) t(i)
        |  where len(tk) >= 5),
        |keep as (
        |  select g from grams group by g
        |  having count(distinct doc_id) <= ${ExtensionQueries127.GramDfCap}),
        |pruned as (select gr.* from grams gr join keep k on k.g = gr.g),
        |matches as (
        |  select distinct a.doc_id a, b.doc_id b, a.i ia, b.i ib
        |  from pruned a join pruned b on a.g = b.g and a.doc_id < b.doc_id),
        |runs as (
        |  select a, b, ia - ib d, ib,
        |    ia - row_number() over (partition by a, b, ia - ib order by ia) isl
        |  from matches),
        |spans as (
        |  select distinct b doc_id, min(ib) s, min(ib) + count(*) + 3 e
        |  from runs group by a, b, d, isl
        |  having count(*) >= ${DefaultMinSpanTokens - 4}),
        |sweep as (
        |  select doc_id, s, e,
        |    max(e) over (partition by doc_id order by s, e
        |      rows between unbounded preceding and 1 preceding) pm
        |  from spans),
        |isl as (
        |  select doc_id, s, e,
        |    sum(case when pm is null or s > pm then 1 else 0 end)
        |      over (partition by doc_id order by s, e
        |        rows between unbounded preceding and current row) grp
        |  from sweep),
        |merged as (
        |  select doc_id, grp, min(s) s, max(e) e from isl group by 1, 2),
        |rem as (
        |  select doc_id, u.p from merged, unnest(generate_series(s, e)) u(p)),
        |tokpos as (
        |  select doc_id, i p, tk[i] tok
        |  from toks, unnest(generate_series(1, len(tk))) t(i)),
        |kept as (
        |  select t.doc_id, t.p, t.tok from tokpos t
        |  where not exists (
        |    select 1 from rem r where r.doc_id = t.doc_id and r.p = t.p)),
        |newtext as (
        |  select doc_id, string_agg(tok, ' ' order by p) new_text
        |  from kept group by doc_id),
        |audit as (
        |  select doc_id, cast(count(*) as bigint) n_spans,
        |    cast(sum(e - s + 1) as bigint) tokens_removed
        |  from merged group by doc_id)
        |select a.doc_id, a.n_spans, a.tokens_removed,
        |  cast(len(t.tk) - a.tokens_removed as bigint) tokens_kept,
        |  coalesce(n.new_text, '') new_text
        |from audit a
        |join toks t on t.doc_id = a.doc_id
        |left join newtext n on n.doc_id = a.doc_id
        |order by a.doc_id""".stripMargin)
}
