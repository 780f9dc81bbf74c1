package graft.ops

import graft.Tables
import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 32: pipeline-eval ops — PII risk
  * scoring (the severity layer over E-14's scrubber), a language-ID
  * confusion matrix (E-8's detector judged against the truth column),
  * out-of-vocabulary rate per source, and MinHash Jaccard-estimator
  * accuracy (the sketch-error histogram behind E-2's near-dup gate).
  */
object ExtensionQueries32 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def h60(c: Column) =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  // ---- E-247 PII risk scoring ----------------------------------------------------
  // E-14 scrubs PII; this scores EXPOSURE before scrubbing: weighted
  // pattern counts (3·email + 2·phone + 1·url + 1·long-number) over
  // the same synthesized-noise text, reported as a per-source risk
  // histogram — the triage view a privacy review starts from. Counts
  // are regexp_count integers; patterns stay in the dialect-shared
  // subset (char classes + quantifiers, no lookaround).
  def extPiirisk(s: SparkSession, dir: String): DataFrame = {
    val noisy = concat(
      lit("contact user"), col("doc_id"), lit("@mail.example or "),
      lit("https://host.example/d/"), col("doc_id"), lit("?x=1 ref 42 "),
      when(pmod(h60(col("doc_id").cast("string")), lit(3L)) === 0,
        lit("call 5551234567 "))
        .otherwise(lit("")),
      substring(col("text"), 1, 60))
    val d = t(s, dir, "documents").select(col("source"),
      regexp_count(noisy, lit("[a-z0-9.]+@[a-z.]+[a-z]")).as("n_email"),
      regexp_count(noisy, lit("[0-9]{10}")).as("n_phone"),
      regexp_count(noisy, lit("https?://[^ ]+")).as("n_url"),
      regexp_count(noisy, lit("[0-9]{4,}")).as("n_longnum"))
    d.withColumn("risk",
        (lit(3) * col("n_email") + lit(2) * col("n_phone") +
          col("n_url") + col("n_longnum")).cast("long"))
      .groupBy("source", "risk").agg(count(lit(1)).as("n_docs"))
      .orderBy("source", "risk")
  }

  // ---- E-248 language-ID confusion matrix ----------------------------------------
  // E-8 guesses; the documents table carries the TRUTH lang column —
  // so judge the detector: (truth, guess) counts plus the within-truth
  // share. The diagonal share is per-language recall; off-diagonal
  // cells say WHICH languages the marker profile confuses — the
  // detector-tuning view E-8's per-doc dump can't give.
  def extLangconf(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("lang"), TextAnalysis.langId(col("text")).as("guess"))
    val cells = d.groupBy("lang", "guess").agg(count(lit(1)).as("n"))
    val totals = cells.groupBy("lang").agg(sum("n").as("n_lang"))
    cells.join(totals, "lang")
      .select(col("lang"), col("guess"), col("n"),
        round(col("n").cast("double") / col("n_lang"), 6).as("share"),
        (col("lang") === col("guess")).as("correct"))
      .orderBy("lang", "guess")
  }

  // ---- E-249 out-of-vocabulary rate ----------------------------------------------
  // Tokenizer-coverage audit: with the vocabulary = tokens seen ≥ 50
  // times corpus-wide (the frequency-threshold cut — no global sort,
  // unlike a top-N vocab), what share of each source's token
  // INSTANCES falls outside it? All integer counts; the per-source
  // division is the only float. The sizing companion to E-209's
  // coverage curve and E-219's fertility.
  def extOov(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("source"),
        explode(filter(split(col("text"), " "), x => x =!= "")).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 50).select("tok")
    val perSource = toks.join(vocab.withColumn("in_vocab", lit(1L)),
        Seq("tok"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
    perSource.select(col("source"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 6)
          .as("oov_rate"))
      .orderBy("source")
  }

  // ---- E-250 MinHash estimator accuracy ------------------------------------------
  // How good is the 16-permutation MinHash Jaccard estimate that E-2's
  // LSH banding rides on? Signatures from the portable salted hash
  // (min over the doc's DISTINCT tokens per permutation — identical on
  // both engines), estimate = matching-coordinate share (multiples of
  // 1/16, exact doubles), truth = exact set Jaccard on the same
  // consecutive-doc pairs. Reported as the |est − exact| error
  // histogram in 0.05 bins — every bucket an identical per-row
  // expression on identical doubles, so the histogram is
  // deterministic with no cross-row float folds.
  def extMinhashacc(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id").cast("long").as("id"),
        explode(array_distinct(filter(split(col("text"), " "),
          x => x =!= ""))).as("tok"))
    val perms = s.range(0, 16).select(col("id").cast("int").as("r"))
    val sigs = toks.crossJoin(broadcast(perms))
      .groupBy("id", "r")
      .agg(min(h60(concat(col("r").cast("string"), lit("|"), col("tok"))))
        .as("mh"))
    val sizes = toks.groupBy("id").agg(count(lit(1)).as("sz"))
    val pairSig = sigs.join(
        sigs.select((col("id") - 1).as("id"), col("r"),
          col("mh").as("mh_b")),
        Seq("id", "r"))
      .groupBy("id")
      .agg(sum(when(col("mh") === col("mh_b"), 1L).otherwise(0L))
        .as("n_match"))
    val inter = toks.join(
        toks.select((col("id") - 1).as("id"), col("tok")), Seq("id", "tok"))
      .groupBy("id").agg(count(lit(1)).as("n_inter"))
    val pairs = pairSig
      .join(sizes, "id")
      .join(sizes.select((col("id") - 1).as("id"), col("sz").as("sz_b")),
        Seq("id"))
      .join(inter, Seq("id"), "left")
      .select(col("id"),
        (col("n_match").cast("double") / 16).as("est"),
        (coalesce(col("n_inter"), lit(0L)).cast("double") /
          (col("sz") + col("sz_b") - coalesce(col("n_inter"), lit(0L))))
          .as("exact"))
    pairs
      .withColumn("err_bucket",
        floor(abs(col("est") - col("exact")) * 20).cast("long"))
      .groupBy("err_bucket").agg(count(lit(1)).as("n_pairs"))
      .orderBy("err_bucket")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_piirisk" -> (extPiirisk _),
    "ext_langconf" -> (extLangconf _),
    "ext_oov" -> (extOov _),
    "ext_minhashacc" -> (extMinhashacc _))

  // E-248's oracle regenerates the marker scores exactly like the E-8
  // oracle does (declaration-order CASE = the Spark foldLeft tiebreak).
  private def langScoreSql(markers: Seq[String]): String =
    markers.map { m =>
      val escaped = m.replace("'", "''")
      s"(length(text)-length(replace(text,'$escaped','')))/${m.length}"
    }.mkString(" + ")

  private val langconfSql: String = {
    val scores = TextAnalysis.langMarkers.map { case (lang, ms) =>
      lang -> s"(${langScoreSql(ms)})"
    }
    val best = s"greatest(${scores.map(_._2).mkString(", ")})"
    val cases = scores.map { case (lang, sc) =>
      s"when $sc = best then '$lang'"
    }.mkString(" ")
    s"""with scored as (select lang, text, $best best from documents),
       |g as (select lang, case $cases end guess from scored),
       |cells as (select lang, guess, cast(count(*) as bigint) n
       |  from g group by lang, guess),
       |tot as (select lang, sum(n) n_lang from cells group by lang)
       |select cells.lang, guess, n,
       |  round(cast(n as double) / n_lang, 6) "share",
       |  cells.lang = guess correct
       |from cells join tot on tot.lang = cells.lang
       |order by cells.lang, guess""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    // E-247: identical synthesized noise and patterns; DuckDB counts
    // via regexp_extract_all.
    "ext_piirisk" ->
      """with noisy as (select source,
        |    'contact user' || doc_id || '@mail.example or ' ||
        |    'https://host.example/d/' || doc_id || '?x=1 ref 42 ' ||
        |    case when ('0x' || substr(sha256(cast(doc_id as varchar)), 1,
        |      15))::bigint % 3 = 0
        |      then 'call 5551234567 ' else '' end ||
        |    substr(text, 1, 60) t
        |  from documents),
        |scored as (select source,
        |    3 * len(regexp_extract_all(t, '[a-z0-9.]+@[a-z.]+[a-z]'))
        |    + 2 * len(regexp_extract_all(t, '[0-9]{10}'))
        |    + len(regexp_extract_all(t, 'https?://[^ ]+'))
        |    + len(regexp_extract_all(t, '[0-9]{4,}')) risk
        |  from noisy)
        |select source, cast(risk as bigint) risk,
        |  cast(count(*) as bigint) n_docs
        |from scored group by source, risk order by source, risk""".stripMargin,

    "ext_langconf" -> langconfSql,

    // E-249: identical frequency-threshold vocabulary.
    "ext_oov" ->
      """with toks as (select source,
        |    unnest(list_filter(string_split(text, ' '), w -> w <> '')) tok
        |  from documents),
        |vocab as (select tok from toks group by tok
        |  having count(*) >= 50),
        |per as (select source, cast(count(*) as bigint) n_tokens,
        |    cast(sum(case when vocab.tok is null then 1 else 0 end)
        |      as bigint) n_oov
        |  from toks left join vocab on vocab.tok = toks.tok
        |  group by source)
        |select source, n_tokens, n_oov,
        |  round(cast(n_oov as double) / n_tokens, 6) oov_rate
        |from per order by source""".stripMargin,

    // E-250: identical salted-hash signatures, consecutive-doc pairs,
    // and per-row error bucketing.
    "ext_minhashacc" ->
      """with toks as (select cast(doc_id as bigint) id,
        |    unnest(list_distinct(list_filter(string_split(text, ' '),
        |      w -> w <> ''))) tok
        |  from documents),
        |sigs as (select id, r,
        |    min(('0x' || substr(sha256(cast(r as varchar) || '|' || tok),
        |      1, 15))::bigint) mh
        |  from toks cross join unnest(range(0, 16)) u(r)
        |  group by id, r),
        |sizes as (select id, cast(count(*) as bigint) sz
        |  from toks group by id),
        |ps as (select a.id, sum(case when a.mh = b.mh then 1 else 0 end)
        |      n_match
        |  from sigs a join sigs b on b.id = a.id + 1 and b.r = a.r
        |  group by a.id),
        |inter as (select a.id, cast(count(*) as bigint) n_inter
        |  from toks a join toks b on b.id = a.id + 1 and b.tok = a.tok
        |  group by a.id),
        |pairs as (select ps.id,
        |    cast(n_match as double) / 16 est,
        |    cast(coalesce(n_inter, 0) as double)
        |      / (sa.sz + sb.sz - coalesce(n_inter, 0)) "exact"
        |  from ps join sizes sa on sa.id = ps.id
        |  join sizes sb on sb.id = ps.id + 1
        |  left join inter on inter.id = ps.id)
        |select cast(floor(abs(est - "exact") * 20) as bigint) err_bucket,
        |  cast(count(*) as bigint) n_pairs
        |from pairs group by 1 order by err_bucket""".stripMargin)
}
