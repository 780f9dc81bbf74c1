package graft.ops

import graft.Tables
import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 25: LLM-corpus hardening — the
  * rule-bundle quality filter with reason attribution, tokenizer
  * fertility, embedding-norm audit, and the duplicate-cluster size
  * histogram.
  */
object ExtensionQueries25 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-218 rule-bundle filter with reason attribution --------------------------
  // The C4/Gopher-style keep/drop decision as ONE operator: ordered
  // rules, first failure wins, per-reason counts — the report a corpus
  // curator actually reads. Every threshold is decided in INTEGER
  // cross-multiplication (20·stop < n, 5·maxfreq > n), so no ratio ever
  // straddles an ULP. One token pass + one per-doc aggregate.
  def extFilterreasons(s: SparkSession, dir: String): DataFrame = {
    val stopList = Seq("the", "a", "of", "and", "to", "in", "is", "on",
      "for", "with")
    val toks = t(s, dir, "documents")
      .select(col("doc_id"),
        explode(filter(split(col("text"), " "), x => x =!= "")).as("tok"))
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("f"))
    val perDoc = tf.groupBy("doc_id")
      .agg(sum("f").as("n_tok"),
        sum(when(col("tok").isin(stopList: _*), col("f")).otherwise(0L))
          .as("n_stop"),
        sum(when(col("tok") === "dup", col("f")).otherwise(0L))
          .as("n_dupmark"),
        max("f").as("max_freq"))
    perDoc
      .select(
        when(col("n_tok") < 10, "too_short")
          .when(col("n_stop") * 20 < col("n_tok"), "low_stopwords")
          .when(col("n_dupmark") > 0, "dup_marker")
          .when(col("max_freq") * 5 > col("n_tok"), "repetitive")
          .otherwise("keep").as("reason"))
      .groupBy("reason")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("share", round(col("n_docs").cast("double") /
        sum("n_docs").over(org.apache.spark.sql.expressions.Window
          .partitionBy()), 6))
      .orderBy("reason")
  }

  // ---- E-219 tokenizer fertility -------------------------------------------------
  // BPE-ish tokens per whitespace word, per language — the
  // tokenizer-cost profile that decides token budgets across languages
  // (fertility ≫ 1 means the tokenizer fragments that language). Both
  // counts are exact integers per doc (shared regex), aggregated as one
  // division per language.
  def extFertility(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenCounts(t(s, dir, "documents"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("ws_tokens").as("ws_tokens"),
        sum("bpeish_tokens").as("bpeish_tokens"),
        round(sum("bpeish_tokens").cast("double") / sum("ws_tokens"), 6)
          .as("fertility"))
      .orderBy("lang")

  // ---- E-220 embedding-norm audit ------------------------------------------------
  // L2-norm distribution of the embedding table: median/p99 norms
  // (interpolated percentile) and the count beyond p99·1.5 — the
  // un-normalized-row screen that breaks cosine retrieval silently.
  // The norm is a per-row HOF fold over the 64-dim array (dims cast to
  // double BEFORE squaring on both engines); the percentile stats
  // broadcast back onto the row scan (E-21 pattern).
  def extEmbnorm(s: SparkSession, dir: String): DataFrame = {
    val norms = t(s, dir, "embeddings")
      .select(col("vec_id"),
        sqrt(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double"))).as("nrm"))
    val q = norms.agg(
      count(lit(1)).as("n"),
      expr("percentile(nrm, 0.5)").as("p50"),
      expr("percentile(nrm, 0.99)").as("p99"))
    norms.crossJoin(q)
      .groupBy("n", "p50", "p99")
      .agg(sum(when(col("nrm") > col("p99") * 1.5, 1L).otherwise(0L))
        .as("n_outliers"))
      .select(col("n"), round(col("p50"), 6).as("p50_norm"),
        round(col("p99"), 6).as("p99_norm"), col("n_outliers"))
  }

  // ---- E-221 duplicate-cluster size histogram ------------------------------------
  // Cluster docs by the order-insensitive token-set fingerprint and
  // report the cluster-size distribution plus the largest cluster —
  // the shape report behind ext_dedup_yield's scalar: many pairs vs one
  // giant template cluster need different fixes. One hash groupBy,
  // histogram on the cluster aggregate.
  def extDupsizes(s: SparkSession, dir: String): DataFrame = {
    val clusters = t(s, dir, "documents")
      .select(TextAnalysis.tokenSetFingerprint(col("text")).as("fp"))
      .groupBy("fp").agg(count(lit(1)).as("sz"))
    clusters.groupBy("sz")
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("sz").as("cluster_size"), col("n_clusters"))
      .orderBy("cluster_size")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_filterreasons" -> (extFilterreasons _),
    "ext_fertility" -> (extFertility _),
    "ext_embnorm" -> (extEmbnorm _),
    "ext_dupsizes" -> (extDupsizes _))

  val oracleSql: Map[String, String] = Map(
    "ext_filterreasons" ->
      """with toks as (select doc_id,
        |    unnest(list_filter(string_split(text, ' '), w -> w <> '')) tok
        |  from documents),
        |tf as (select doc_id, tok, cast(count(*) as bigint) f
        |  from toks group by 1, 2),
        |per as (select doc_id, cast(sum(f) as bigint) n_tok,
        |    cast(sum(case when tok in ('the','a','of','and','to','in','is',
        |      'on','for','with') then f else 0 end) as bigint) n_stop,
        |    cast(sum(case when tok = 'dup' then f else 0 end) as bigint)
        |      n_dupmark,
        |    cast(max(f) as bigint) max_freq
        |  from tf group by 1),
        |r as (select case when n_tok < 10 then 'too_short'
        |    when n_stop * 20 < n_tok then 'low_stopwords'
        |    when n_dupmark > 0 then 'dup_marker'
        |    when max_freq * 5 > n_tok then 'repetitive'
        |    else 'keep' end reason from per)
        |select reason, cast(count(*) as bigint) n_docs,
        |  round(cast(count(*) as double) / sum(count(*)) over (), 6) "share"
        |from r group by reason order by reason""".stripMargin,

    "ext_fertility" ->
      """with per as (select lang,
        |    cast(len(list_filter(string_split(text, ' '), t -> t <> ''))
        |      as bigint) ws,
        |    cast(len(regexp_extract_all(text,
        |      '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) as bigint) bp
        |  from documents)
        |select lang, cast(count(*) as bigint) n_docs,
        |  cast(sum(ws) as bigint) ws_tokens,
        |  cast(sum(bp) as bigint) bpeish_tokens,
        |  round(cast(sum(bp) as double) / sum(ws), 6) fertility
        |from per group by lang order by lang""".stripMargin,

    "ext_embnorm" ->
      """with norms as (select vec_id,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> cast(x as double) * cast(x as double)))) nrm
        |  from embeddings),
        |q as (select cast(count(*) as bigint) n,
        |    quantile_cont(nrm, 0.5) p50, quantile_cont(nrm, 0.99) p99
        |  from norms)
        |select n, round(p50, 6) p50_norm, round(p99, 6) p99_norm,
        |  cast(sum(case when nrm > p99 * 1.5 then 1 else 0 end) as bigint)
        |    n_outliers
        |from norms cross join q group by n, p50, p99""".stripMargin,

    "ext_dupsizes" ->
      """with clusters as (select sha256(array_to_string(list_sort(
        |    list_distinct(list_filter(string_split(text, ' '),
        |      t -> t <> ''))), ' ')) fp, cast(count(*) as bigint) sz
        |  from documents group by fp)
        |select sz cluster_size, cast(count(*) as bigint) n_clusters
        |from clusters group by 1 order by cluster_size""".stripMargin)
}
