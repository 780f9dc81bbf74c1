package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. Everything
  * is a deterministic, codegen'd column expression (no UDFs), so all of
  * it is SQL-expressible for the DuckDB oracle and scales as a pure
  * projection — zero shuffles for per-document outputs.
  */
object TextAnalysis {

  /** #occurrences of substring `pat` in `c` via the length-delta trick
    * (portable across engines, stays in codegen).
    */
  def countOccurrences(c: Column, pat: String): Column =
    (length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(pat), ""))) / pat.length

  // ------------------------------------------------------- language ID

  /** Marker character-bigrams per language for the n-gram heuristic.
    * (Classic langid profiles are learned; this fixed profile is the
    * deterministic, oracle-friendly variant of the same mechanism.)
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("th", "he", "ing"),
    "de" -> Seq("ch", "ei", "sch"),
    "es" -> Seq("ll", "ción", "os "),
    "fr" -> Seq("ou", "eau", "les"),
    "zh" -> Seq("zh", "ng ", "sh"))

  /** Language guess by max marker-n-gram score; ties resolved by the
    * declaration order above (deterministic). Score = Σ occurrences of
    * that language's marker n-grams.
    */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (lang, ms) =>
      (lang, ms.map(m => countOccurrences(text, m)).reduce(_ + _))
    }
    // greatest-score argmax with declaration-order tiebreak
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(lit(null).cast("string")) { case (acc, (lang, s)) =>
      when(acc.isNull && s === best, lit(lang)).otherwise(acc)
    }
  }

  // ---------------------------------------------------- quality scoring

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Per-document quality features + a composite score in [0,1]:
    * token count, mean token length, stopword ratio, distinct-token
    * ratio, alnum-char ratio. The score formula is fixed and documented
    * so the oracle can replicate it exactly.
    */
  def qualityFeatures(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = filter(split(col(textCol), " "), t => t =!= "")
    val nTok = size(toks).cast("double")
    val stopRatio = size(filter(toks, t => t.isin(stopwords.map(lit): _*)))
      .cast("double") / nTok
    val distinctRatio = size(array_distinct(toks)).cast("double") / nTok
    val meanTokLen = (length(col(textCol)) - (nTok - 1)) / nTok
    val alnumRatio = length(regexp_replace(col(textCol), "[^a-z0-9]", ""))
      .cast("double") / length(col(textCol))
    df.withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("mean_tok_len", round(meanTokLen, 4))
      .withColumn("stop_ratio", round(stopRatio, 4))
      .withColumn("distinct_ratio", round(distinctRatio, 4))
      .withColumn("alnum_ratio", round(alnumRatio, 4))
      .withColumn("quality",
        round(least(lit(1.0), nTok / 100.0) * 0.4
          + distinctRatio * 0.3
          + (lit(1.0) - stopRatio) * 0.2
          + alnumRatio * 0.1, 4))
  }

  // ------------------------------------------------------ token counting

  /** BPE-ish subword pattern: letter runs, digit runs, other non-space
    * singletons — a portable approximation of byte-pair tokenizer unit
    * counts, usable for budget accounting.
    */
  val bpeishPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  /** (whitespace token count, BPE-ish unit count, char count). */
  def tokenCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("ws_tokens",
        size(filter(split(col(textCol), " "), t => t =!= "")).cast("long"))
      .withColumn("bpeish_tokens", regexp_count(col(textCol), lit(bpeishPattern)))
      .withColumn("n_chars_m", length(col(textCol)).cast("long"))

  // -------------------------------------------------------- fingerprints

  /** Order-insensitive content fingerprint: sha256 over the sorted
    * distinct token set. Equal fingerprints ⇔ same token set — catches
    * shuffled/reordered duplicates that exact hashing misses.
    */
  def tokenSetFingerprint(text: Column): Column =
    sha2(concat_ws(" ", sort_array(array_distinct(
      filter(split(text, " "), t => t =!= "")))), 256)

  /** Unigram language-model scoring (the CCNet-style LM quality filter,
    * reduced to order 1 so it is exactly SQL-reproducible): per document,
    * the mean negative log-likelihood of its tokens under the corpus'
    * own unigram distribution. Low score = typical text, high = rare
    * tokens / noise. Two shuffles total (corpus token count, per-doc
    * mean); the token→count join broadcasts while the vocabulary is
    * small and falls back to a shuffled join beyond — both fine at scale
    * because the count table is tiny relative to the corpus.
    */
  def unigramLogScore(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
    val counts = toks.groupBy("w").agg(count(lit(1)).as("c"))
    val total = counts.agg(sum("c").as("n"))
    toks.join(counts, "w").crossJoin(broadcast(total))
      .groupBy(idCol)
      .agg(avg(-log(col("c").cast("double") / col("n"))).as("lm_score"))
  }

  /** PII / boilerplate scrubbing for training corpora: URLs, e-mail
    * addresses and digit runs are replaced with typed placeholder tokens.
    * Order matters — URLs first (they may contain digits and @), then
    * e-mails, then bare numbers. Pure codegen'd regexp_replace chain: no
    * UDF, no shuffle, and the patterns stay in the RE2 ∩ java.util.regex
    * common dialect so any engine reproduces them.
    */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, "https?://\\S+", "<URL>"),
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"),
      "[0-9]+", "<NUM>")

  /** Polynomial rolling hash of the token sequence (order-sensitive) —
    * the classic Rabin-Karp document fingerprint, computed as a fold
    * over the token array (codegen'd `aggregate`, no UDF). Arithmetic is
    * mod 2^31−1 so it never overflows Spark 4's ANSI Long math.
    */
  def rollingHash(text: Column): Column = {
    val p = lit(2147483647L) // Mersenne prime 2^31-1
    aggregate(
      filter(split(text, " "), t => t =!= ""),
      lit(0L),
      (acc, t) => pmod(acc * lit(31L) + pmod(xxhash64(t), p), p))
  }
}
