package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12 extension queries, batch 128: INTRA-document verbatim
  * repetition length (E-478) — the self-repetition face of the E-475
  * diagonal machinery. E-163's Gopher-style dup3_frac measures WHAT
  * FRACTION of a doc's trigrams repeat; generated/looping text is
  * better separated by HOW LONG the longest verbatim repeat is (a
  * template header repeated once can dominate the fraction while a
  * degenerate generation loop shows a near-doc-length repeat). Lee et
  * al.-style self-dedup acts on exactly this quantity.
  */
object ExtensionQueries128 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Per-(doc, gram) occurrence cap: a gram occurring n times in one
    * doc yields n·(n−1)/2 match pairs, so a stop-token soup doc would
    * go quadratic — grams above the cap are dropped identically on
    * both engines (the E-227 dfCap discipline, applied within-doc).
    */
  val SelfGramCap = 100L

  // ---- E-478 longest intra-doc verbatim repeat -----------------------------------
  // A token span of length L appearing twice in the SAME doc at offset
  // distance d > 0 shows up as L−2 consecutive matched 3-gram start
  // pairs (i, i+d) — one diagonal, exactly E-475's gaps-and-islands
  // with the pair (a, b) replaced by (doc, d). Overlapping repeats
  // (d < 5: "ha ha ha …" loops) are handled by the same algebra — the
  // diagonal run still advances one gram per token. Output: per doc
  // with >= 1 repeated gram, the longest repeat (max run + 2), the
  // number of maximal repeat runs, total matched gram pairs, and the
  // doc's token count; top-50 by (longest desc, doc_id) — all exact
  // integers, hash-stable.
  //
  // Scale shape: one gram projection, one per-(doc, gram) cap, one
  // equi self-join keyed by (doc, gram) — shuffle is O(grams), the
  // pair fan-out is cap-bounded, and the window runs over (doc,
  // diagonal) groups. Never a position × position product.
  def extSelfrepeat(s: SparkSession, dir: String): DataFrame = {
    // 3-gram unit (E-475 uses 5): the repeat-length floor is 3 tokens,
    // matching the Gopher dup3 unit — and the fixture corpus actually
    // exercises the operator (its ~90-trigram docs collide at the
    // birthday rate; 5-gram space never repeats within a doc there, and
    // an oracle that matches on EMPTY is no gate at all)
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 3)
    val grams = toks.select(col("doc_id"), size(col("tk")).as("n_tok"),
        explode(transform(sequence(lit(1), size(col("tk")) - 2), i =>
          struct(i.as("i"), concat_ws(" ",
            (0 until 3).map(k => element_at(col("tk"), i + lit(k))): _*)
            .as("g")))).as("x"))
      .select(col("doc_id"), col("n_tok"), col("x.i"), col("x.g"))
    val keep = grams.groupBy("doc_id", "g")
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ").between(2L, SelfGramCap))
      .select("doc_id", "g")
    val pruned = grams.join(keep, Seq("doc_id", "g"))
    val matches = pruned.select(col("doc_id"), col("n_tok"), col("g"),
        col("i").as("ia"))
      .join(pruned.select(col("doc_id"), col("g"), col("i").as("ib")),
        Seq("doc_id", "g"))
      .filter(col("ia") < col("ib"))
      .select(col("doc_id"), col("n_tok"), col("ia"), col("ib"))
    val w = Window.partitionBy(col("doc_id"), col("ib") - col("ia"))
      .orderBy("ia")
    val runs = matches
      .withColumn("isl", col("ia") - row_number().over(w))
      .groupBy(col("doc_id"), col("n_tok"),
        (col("ib") - col("ia")).as("d"), col("isl"))
      .agg(count(lit(1)).as("run"))
    runs.groupBy("doc_id", "n_tok")
      .agg((max("run") + 2).as("longest_repeat"),
        count(lit(1)).as("n_runs"),
        sum("run").as("gram_pairs"))
      .orderBy(desc("longest_repeat"), asc("doc_id"))
      .limit(50)
      .select(col("doc_id"), col("n_tok").cast("long").as("n_tok"),
        col("longest_repeat"), col("n_runs"), col("gram_pairs"))
  }

  // ---- E-479 intra-doc repeat TRIMMING (the action on E-478) ----------------------
  // What E-478 measures, this performs: every maximal intra-doc repeat
  // run of >= 3 tokens loses its LATER copy — the earlier occurrence is
  // canonical (the within-doc mirror of E-477's smaller-doc_id-keeps
  // rule). Removal intervals [ib, ib + run + 1] (1-based tokens, 3-gram
  // unit) feed SpanDedup's interval merge + token surgery, so chained
  // and overlapping repeats ("ha ha ha …": every later copy's interval
  // overlaps the next) collapse to one cut and the FIRST copy always
  // survives — removal starts strictly after the earlier occurrence's
  // start on every diagonal. Output per rewritten doc: n_spans,
  // tokens_removed, tokens_kept, new_text — DuckDB replays the identical
  // pipeline.
  def extSelfrepeatTrim(s: SparkSession, dir: String): DataFrame =
    extSelfrepeatTrimOn(t(s, dir, "documents"))

  /** The trim on an arbitrary (doc_id, text) frame — the reusable stage
    * (SelfRepeatSpec drives planted loops through it directly).
    */
  def extSelfrepeatTrimOn(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 3)
    val grams = toks.select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("tk")) - 2), i =>
          struct(i.as("i"), concat_ws(" ",
            (0 until 3).map(k => element_at(col("tk"), i + lit(k))): _*)
            .as("g")))).as("x"))
      .select(col("doc_id"), col("x.i"), col("x.g"))
    val keep = grams.groupBy("doc_id", "g")
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ").between(2L, SelfGramCap))
      .select("doc_id", "g")
    val pruned = grams.join(keep, Seq("doc_id", "g"))
    val matches = pruned.select(col("doc_id"), col("g"), col("i").as("ia"))
      .join(pruned.select(col("doc_id"), col("g"), col("i").as("ib")),
        Seq("doc_id", "g"))
      .filter(col("ia") < col("ib"))
      .select(col("doc_id"), col("ia"), col("ib"))
    val w = Window.partitionBy(col("doc_id"), col("ib") - col("ia"))
      .orderBy("ia")
    val spans = matches
      .withColumn("isl", col("ia") - row_number().over(w))
      .groupBy(col("doc_id"), (col("ib") - col("ia")).as("d"), col("isl"))
      .agg(count(lit(1)).as("run"), min("ib").as("s"))
      .select(col("doc_id"), col("s").cast("long").as("s"),
        (col("s") + col("run") + 1).cast("long").as("e"))
      .distinct()
    val merged = SpanDedup.mergeSpans(spans)
    SpanDedup.rewrite(docs, merged, "doc_id", "text")
      .orderBy("doc_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_selfrepeat" -> (extSelfrepeat _),
    "ext_selfrepeat_trim" -> (extSelfrepeatTrim _))

  val oracleSql: Map[String, String] = Map(
    // E-478: same grams, same within-doc cap, same diagonal islands.
    "ext_selfrepeat" ->
      s"""with toks as (
        |  select doc_id, string_split(text, ' ') tk from documents
        |  where len(string_split(text, ' ')) >= 3),
        |grams as (
        |  select doc_id, len(tk) n_tok, i,
        |    array_to_string(tk[i:i+2], ' ') g
        |  from toks, unnest(generate_series(1, len(tk) - 2)) t(i)),
        |keep as (
        |  select doc_id, g from grams group by doc_id, g
        |  having count(*) between 2 and $SelfGramCap),
        |pruned as (
        |  select gr.* from grams gr
        |  join keep k on k.doc_id = gr.doc_id and k.g = gr.g),
        |matches as (
        |  select a.doc_id, a.n_tok, a.i ia, b.i ib
        |  from pruned a join pruned b
        |  on a.doc_id = b.doc_id and a.g = b.g and a.i < b.i),
        |runs as (
        |  select doc_id, n_tok, ib - ia d,
        |    ia - row_number() over (partition by doc_id, ib - ia order by ia) isl
        |  from matches),
        |agg as (
        |  select doc_id, n_tok, d, isl, cast(count(*) as bigint) run
        |  from runs group by 1, 2, 3, 4)
        |select doc_id, cast(n_tok as bigint) n_tok,
        |  cast(max(run) + 2 as bigint) longest_repeat,
        |  cast(count(*) as bigint) n_runs,
        |  cast(sum(run) as bigint) gram_pairs
        |from agg group by doc_id, n_tok
        |order by longest_repeat desc, doc_id limit 50""".stripMargin,

    // E-479: same diagonals; later copies become removal intervals,
    // merged by the running-max sweep, token surgery as in E-477.
    "ext_selfrepeat_trim" ->
      s"""with toks0 as (
        |  select doc_id, string_split(text, ' ') tk from documents),
        |toks as (select * from toks0 where len(tk) >= 3),
        |grams as (
        |  select doc_id, i, array_to_string(tk[i:i+2], ' ') g
        |  from toks, unnest(generate_series(1, len(tk) - 2)) t(i)),
        |keep as (
        |  select doc_id, g from grams group by doc_id, g
        |  having count(*) between 2 and $SelfGramCap),
        |pruned as (
        |  select gr.* from grams gr
        |  join keep k on k.doc_id = gr.doc_id and k.g = gr.g),
        |matches as (
        |  select a.doc_id, a.i ia, b.i ib
        |  from pruned a join pruned b
        |  on a.doc_id = b.doc_id and a.g = b.g and a.i < b.i),
        |runs as (
        |  select doc_id, ib - ia d, ib,
        |    ia - row_number() over (partition by doc_id, ib - ia order by ia) isl
        |  from matches),
        |spans as (
        |  select distinct doc_id, min(ib) s, min(ib) + count(*) + 1 e
        |  from runs group by doc_id, d, isl),
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
        |  from toks0, unnest(generate_series(1, len(tk))) t(i)),
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
        |join toks0 t on t.doc_id = a.doc_id
        |left join newtext n on n.doc_id = a.doc_id
        |order by a.doc_id""".stripMargin)
}
