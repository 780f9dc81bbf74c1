package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 15: corpus-hygiene reports — dedup
  * yield accounting, boilerplate-header detection, embedding-dimension
  * health, lead-lag correlation discovery, and length-outlier listing.
  */
object ExtensionQueries15 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-169 dedup yield audit ---------------------------------------------------
  // The before/after accounting a dedup pass reports upstream: exact
  // token-SET clusters (E-165's fingerprint), keeper = min doc_id, and
  // how many docs/chars the pass would remove. One hash groupBy + one
  // single-row fold — the summary is intentionally cluster-method-
  // agnostic (swap the fingerprint, keep the report).
  def extDedupYield(s: SparkSession, dir: String): DataFrame = {
    val fp = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        sha2(concat_ws(" ",
          array_sort(array_distinct(
            filter(split(col("text"), " "), x => x =!= lit(""))))), 256).as("fp"))
    val clusters = fp.groupBy("fp")
      .agg(count(lit(1)).as("sz"), sum("n_chars").as("chars"),
        min(struct(col("doc_id"), col("n_chars"))).as("keeper"))
    clusters.agg(
        sum("sz").as("n_docs"),
        count(lit(1)).as("n_clusters"),
        (sum("sz") - count(lit(1))).as("n_removed"),
        sum("chars").as("chars_total"),
        (sum("chars") - sum(col("keeper.n_chars"))).as("chars_removed"))
      .select(col("n_docs"), col("n_clusters"), col("n_removed"),
        col("chars_total"), col("chars_removed"),
        round(col("n_removed").cast("double") / col("n_docs"), 6).as("doc_removal_rate"))
  }

  // ---- E-170 boilerplate-header detection ----------------------------------------
  // The most common document-OPENING trigram per source and its share —
  // the template/boilerplate screen that says "this source prefixes
  // everything with the same header, strip it before training". First
  // trigram via one slice of the token array; mode via a per-source
  // rank window over the gram counts (tiny domain).
  def extBoilerplate(s: SparkSession, dir: String): DataFrame = {
    val heads = t(s, dir, "documents")
      .select(col("source"),
        concat_ws(" ", slice(
          filter(split(col("text"), " "), x => x =!= lit("")), 1, 3)).as("head3"))
    val counts = heads.groupBy("source", "head3").agg(count(lit(1)).as("n_docs_using"))
    val tot = heads.groupBy("source").agg(count(lit(1)).as("n_docs"))
    counts
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy(col("n_docs_using").desc, col("head3"))))
      .filter(col("rk") === 1)
      .join(tot, "source")
      .select(col("source"), col("head3"), col("n_docs_using"),
        round(col("n_docs_using").cast("double") / col("n_docs"), 6).as("head_share"))
      .orderBy("source")
  }

  // ---- E-171 embedding-dimension health ------------------------------------------
  // Per-dimension mean and sample std of the embedding matrix — the
  // normalization audit (a dead or exploding dimension shows up here
  // before any downstream cosine does). One posexplode + one aggregate;
  // 64 output rows regardless of corpus size.
  def extEmbHealth(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
        round(avg(col("x").cast("double")), 6).as("mean"),
        round(stddev_samp(col("x").cast("double")), 6).as("std"))
      .orderBy("dim")
  }

  // ---- E-172 lead-lag correlation ------------------------------------------------
  // Pearson correlation between the daily click series and the
  // purchase series shifted by 0–3 days — the lead-indicator probe
  // ("do clicks predict purchases k days out"). Day-level series joined
  // on date+lag (equi), corr() is the codegen'd built-in in both
  // engines; rounded to 4 (corr folds are the most FP-sensitive
  // aggregate in the house).
  def extLagCorr(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    def daily(tpe: String, cname: String) = e.filter(col("event_type") === tpe)
      .groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as(cname))
    val clicks = daily("click", "c")
    val purchases = daily("purchase", "p")
    val lags = clicks.select(col("d"), col("c"),
      explode(array(lit(0), lit(1), lit(2), lit(3))).as("lag"))
    lags
      .join(purchases.select(col("d").as("pd"), col("p")),
        col("pd") === expr("date_add(d, lag)"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n_days"),
        round(corr(col("c").cast("double"), col("p").cast("double")), 4).as("lag_corr"))
      .orderBy("lag")
  }

  // ---- E-173 length outliers -----------------------------------------------------
  // Documents beyond their language's interpolated p95 length — the
  // truncation/concatenation screen run before tokenizer budgeting.
  // Per-lang quantiles broadcast onto the scan (the E-21 winsorize
  // pattern), output is the outlier list itself.
  def extLenOutliers(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val q = d.groupBy(col("lang").as("l"))
      .agg(expr("percentile(n_chars, 0.95)").as("p95"))
    d.join(broadcast(q), col("lang") === col("l"))
      .filter(col("n_chars") > col("p95"))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_dedup_yield" -> (extDedupYield _),
    "ext_boilerplate" -> (extBoilerplate _),
    "ext_embhealth" -> (extEmbHealth _),
    "ext_lagcorr" -> (extLagCorr _),
    "ext_lenoutliers" -> (extLenOutliers _))

  val oracleSql: Map[String, String] = Map(
    "ext_dedup_yield" ->
      """with f as (select doc_id, n_chars,
        |    sha256(array_to_string(list_sort(list_distinct(
        |      list_filter(string_split(text, ' '), t -> t <> ''))), ' ')) fp
        |  from documents),
        |c as (select fp, count(*) sz, sum(n_chars) chars,
        |    min(doc_id) keeper_id
        |  from f group by fp),
        |k as (select c.fp, c.sz, c.chars, f.n_chars keeper_chars
        |  from c join f on c.fp = f.fp and c.keeper_id = f.doc_id)
        |select cast(sum(sz) as bigint) n_docs,
        |  count(*) n_clusters,
        |  cast(sum(sz) - count(*) as bigint) n_removed,
        |  cast(sum(chars) as bigint) chars_total,
        |  cast(sum(chars) - sum(keeper_chars) as bigint) chars_removed,
        |  round(cast(sum(sz) - count(*) as double) / sum(sz), 6) doc_removal_rate
        |from k""".stripMargin,

    "ext_boilerplate" ->
      """with heads as (select source,
        |    array_to_string(list_slice(
        |      list_filter(string_split(text, ' '), w -> w <> ''), 1, 3), ' ') head3
        |  from documents),
        |counts as (select source, head3, count(*) n_docs_using
        |  from heads group by 1, 2),
        |tot as (select source, count(*) n_docs from heads group by source),
        |r as (select source, head3, n_docs_using,
        |    row_number() over (partition by source
        |      order by n_docs_using desc, head3) rk
        |  from counts)
        |select r.source, head3, n_docs_using,
        |  round(cast(n_docs_using as double) / n_docs, 6) head_share
        |from r join tot on r.source = tot.source
        |where rk = 1 order by r.source""".stripMargin,

    "ext_embhealth" ->
      """with dims as (select generate_subscripts(embedding, 1) - 1 dim,
        |    cast(unnest(embedding) as double) x from embeddings)
        |select dim, count(*) n,
        |  round(avg(x), 6) mean,
        |  round(stddev_samp(x), 6) std
        |from dims group by dim order by dim""".stripMargin,

    "ext_lagcorr" ->
      """with clicks as (select cast(ts as date) d, count(*) c
        |  from events where event_type = 'click' group by 1),
        |purchases as (select cast(ts as date) d, count(*) p
        |  from events where event_type = 'purchase' group by 1),
        |lags as (select d, c, unnest([0, 1, 2, 3]) lag from clicks)
        |select cast(lag as int) lag, count(*) n_days,
        |  round(corr(cast(c as double), cast(p as double)), 4) lag_corr
        |from lags join purchases pp on pp.d = lags.d + cast(lag as integer)
        |group by lag order by lag""".stripMargin,

    "ext_lenoutliers" ->
      """with q as (select lang, quantile_cont(n_chars, 0.95) p95
        |  from documents group by lang)
        |select doc_id, d.lang, n_chars
        |from documents d join q on d.lang = q.lang
        |where n_chars > p95 order by doc_id""".stripMargin)
}
