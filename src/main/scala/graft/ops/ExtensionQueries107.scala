package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 extension queries, batch 107: LM-pretraining data
  * transforms — the T5 span-corruption mask layout (deterministic,
  * RNG-free) and the word2vec negative-sampling distribution table
  * (unigram^¾). Both are the DATA side of training tricks usually
  * hidden inside trainers; materializing them relationally makes the
  * corruption rate and the sampling distribution auditable corpus
  * artifacts.
  */
object ExtensionQueries107 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** The house portable hash: 60-bit always-positive sha256-derived
    * long; DuckDB spells it `('0x'||substr(sha256(x),1,15))::bigint`.
    */
  private def h60(c: org.apache.spark.sql.Column) =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  // ---- E-447 T5 span-corruption mask layout ----------------------------------------
  // Deterministic span masking: position p starts a span iff
  // h60(doc:p) ≡ 0 (mod 7) (≈14% start rate), span length
  // 1 + (h60 DIV 7 mod 3) ∈ {1,2,3}; overlapping/adjacent spans MERGE
  // into islands (gaps-and-islands on the covered positions — the
  // sequential "skip if already masked" rule made relational), spans
  // clip at the document end. The coin is the T-14 sha discipline, so
  // the mask layout is bit-reproducible on any engine/partitioning —
  // a re-run of the corpus pipeline regenerates the IDENTICAL
  // pretraining examples. Output: per-source mask profile (token
  // coverage + span count + half-up bp rate).
  def extSpanmask(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        posexplode(filter(split(col("text"), " "), x => x =!= ""))
          .as(Seq("p0", "w")))
      .select(col("doc_id"), col("source"), (col("p0") + 1).as("p"))
    val nTok = toks.groupBy("doc_id")
      .agg(max(col("p")).as("np"), count(lit(1)).as("n_tok"))
    val starts = toks
      .withColumn("h", h60(concat(col("doc_id"), lit(":"), col("p"))))
      .filter(pmod(col("h"), lit(7)) === 0)
      .select(col("doc_id"),
        explode(sequence(col("p"),
          col("p") + pmod(expr("h DIV 7"), lit(3)))).as("cp"))
    val covered = starts.join(nTok, Seq("doc_id"))
      .filter(col("cp") <= col("np"))
      .select(col("doc_id"), col("cp")).distinct()
    val islands = covered
      .withColumn("grp", col("cp") - row_number().over(
        Window.partitionBy("doc_id").orderBy("cp")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("masked"),
        countDistinct(col("grp")).as("spans"))
    nTok.join(t(s, dir, "documents").select("doc_id", "source"),
        Seq("doc_id"))
      .join(islands, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(sum("n_tok").as("total_tokens"),
        coalesce(sum("masked"), lit(0L)).as("masked_tokens"),
        coalesce(sum("spans"), lit(0L)).as("n_spans"))
      .select(col("source"), col("total_tokens"), col("masked_tokens"),
        col("n_spans"),
        expr("(20000 * masked_tokens + total_tokens) DIV (2 * total_tokens)")
          .as("masked_bp"))
      .orderBy("source")
  }

  // ---- E-448 negative-sampling distribution table ----------------------------------
  // The word2vec noise distribution P(w) ∝ count^¾, materialized as
  // the cumulative bucket table a sampler walks with inverse-CDF
  // draws. count^¾ is computed as sqrt(c·sqrt(c)) — IEEE sqrt is
  // exactly rounded, so unlike pow(c, 0.75) (libm-dependent) the
  // weights are bit-identical across engines — then 1e-9-quantized to
  // longs so the cumulative fold is exact integer prefix sums. The
  // cumulative share lands on half-up basis points. Vocabulary-sized
  // frame, one global window (the W-7 note: fine at vocab scale; a
  // 100M-type vocab would two-pass the prefix sum).
  def extNegsample(s: SparkSession, dir: String): DataFrame = {
    val freq = t(s, dir, "documents")
      .select(explode(filter(split(col("text"), " "), x => x =!= ""))
        .as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .withColumn("w9",
        round(sqrt(col("c") * sqrt(col("c"))) * 1e9).cast("long"))
    val tot = freq.agg(sum("w9").as("tw")).limit(1)
    freq.crossJoin(broadcast(tot))
      .withColumn("cum", sum(col("w9")).over(
        Window.orderBy(desc("w9"), asc("tok"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("tok"), col("c"), col("w9"),
        expr("(20000 * cum + tw) DIV (2 * tw)").as("cum_bp"))
      .orderBy(desc("w9"), asc("tok"))
      .limit(20)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_spanmask" -> (extSpanmask _),
    "ext_negsample" -> (extNegsample _))

  val oracleSql: Map[String, String] = Map(
    // E-447: identical coin, span algebra, and island merge.
    "ext_spanmask" ->
      """with toks as (select doc_id, source, t.p from (
        |    select doc_id, source,
        |      list_filter(string_split(text, ' '), x -> x <> '') sp
        |    from documents) d,
        |    unnest(generate_series(1, len(sp))) t(p)),
        |ntok as (select doc_id, max(p) np, count(*) n_tok from toks
        |  group by doc_id),
        |starts as (select doc_id, h, p from (select doc_id, p,
        |    ('0x' || substr(sha256(doc_id || ':' || p), 1, 15))::bigint h
        |  from toks) t where h % 7 = 0),
        |spans as (select s.doc_id, s.p,
        |    least(s.p + ((s.h // 7) % 3), n.np) q
        |  from starts s join ntok n on n.doc_id = s.doc_id),
        |covered as (select distinct doc_id, c.cp
        |  from spans, unnest(generate_series(p, q)) c(cp)),
        |islands as (select doc_id, count(*) masked,
        |    count(distinct grp) spans from (
        |    select doc_id, cp, cp - row_number() over (
        |      partition by doc_id order by cp) grp from covered) t
        |  group by doc_id),
        |per as (select d.source, n.n_tok,
        |    coalesce(i.masked, 0) masked, coalesce(i.spans, 0) spans
        |  from ntok n join documents d on d.doc_id = n.doc_id
        |  left join islands i on i.doc_id = n.doc_id)
        |select source, cast(sum(n_tok) as bigint) total_tokens,
        |  cast(sum(masked) as bigint) masked_tokens,
        |  cast(sum(spans) as bigint) n_spans,
        |  cast((20000 * sum(masked) + sum(n_tok))
        |    // (2 * sum(n_tok)) as bigint) masked_bp
        |from per group by source order by source""".stripMargin,

    // E-448: identical sqrt(c·sqrt(c)) weights and integer prefix sums.
    "ext_negsample" ->
      """with freq as (select u.tok, count(*) c from (
        |    select unnest(list_filter(string_split(text, ' '),
        |      x -> x <> '')) tok from documents) u
        |  group by u.tok),
        |w as (select tok, c,
        |    cast(round(sqrt(c * sqrt(c)) * 1000000000.0) as bigint) w9
        |  from freq),
        |tot as (select cast(sum(w9) as bigint) tw from w),
        |cum as (select tok, c, w9, cast(sum(w9) over (
        |    order by w9 desc, tok
        |    rows between unbounded preceding and current row) as bigint) cum
        |  from w)
        |select tok, c, w9,
        |  cast((20000 * cum + tw) // (2 * tw) as bigint) cum_bp
        |from cum, tot
        |order by w9 desc, tok limit 20""".stripMargin)
}
