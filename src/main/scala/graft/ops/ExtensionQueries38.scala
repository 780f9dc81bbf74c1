package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 38: media-corpus hygiene and
  * robust filtering — content-hash dedup over opaque payloads (the
  * binary-column analogue of E-1, with the storage-savings ledger),
  * per-source ingestion quotas (the per-group variant of E-99's global
  * token budget), and a Hampel rolling-median outlier filter kept
  * fully integer via odd frames and cross-multiplied MAD thresholds.
  */
object ExtensionQueries38 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-269 media content-hash dedup --------------------------------------------
  // The E-12 media table with synthesized duplication (every doc's
  // payload is its 5-group base doc's bytes): exact dedup by payload
  // sha256 per modality, reporting the dedup ledger — unique payloads,
  // duplicate copies, and bytes reclaimed (Σ (cluster−1)·len). At
  // 100 TB the hash-shuffle carries 32-byte digests, never payloads.
  def extMmdedup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val media = docs.select(col("doc_id").cast("long").as("media_id"),
        (col("doc_id") - pmod(col("doc_id"), lit(5))).cast("long").as("base"))
      .join(docs.select(col("doc_id").cast("long").as("base"),
        col("text").as("payload")), "base")
      .select(col("media_id"),
        when(pmod(col("media_id"), lit(3L)) === 0, "image")
          .when(pmod(col("media_id"), lit(3L)) === 1, "audio")
          .otherwise("video").as("modality"),
        sha2(col("payload"), 256).as("h"),
        length(col("payload")).cast("long").as("n_bytes"))
    val clusters = media.groupBy("modality", "h")
      .agg(count(lit(1)).as("n"), max("n_bytes").as("len"))
    clusters.groupBy("modality")
      .agg(sum("n").as("n_media"), count(lit(1)).as("n_unique"),
        sum(col("n") * col("len")).as("bytes_total"),
        sum((col("n") - 1) * col("len")).as("bytes_saved"))
      .select(col("modality"), col("n_media"), col("n_unique"),
        round((col("n_media") - col("n_unique")).cast("double") /
          col("n_media"), 4).as("dup_share"),
        col("bytes_total"), col("bytes_saved"))
      .orderBy("modality")
  }

  // ---- E-270 per-source ingestion quota ------------------------------------------
  // Cap every source at 50 docs, keeping the largest first
  // ((n_tokens desc, doc_id) rank per source) — the anti-domination
  // guard that keeps one crawl from flooding the mix (the per-group
  // form of E-99's global budget). Integer counts throughout.
  def extQuota(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("source"), col("doc_id"),
        size(filter(split(col("text"), " "), x => x =!= "")).cast("long")
          .as("n_tokens"))
    val ranked = d.withColumn("rk",
      row_number().over(Window.partitionBy("source")
        .orderBy(desc("n_tokens"), asc("doc_id"))).cast("long"))
    ranked.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("rk") <= 50, 1L).otherwise(0L)).as("n_kept"),
        sum("n_tokens").as("tokens_total"),
        sum(when(col("rk") <= 50, col("n_tokens")).otherwise(0L))
          .as("tokens_kept"))
      .orderBy("source")
  }

  // ---- E-271 Hampel outlier filter -----------------------------------------------
  // Robust spike detection over daily revenue: per day, the 15-day
  // centered frame's MEDIAN (odd frame ⇒ the exact middle element —
  // an integer, no interpolation) and MAD, flagging
  // |x − med| > 3·1.4826·MAD by INTEGER cross-multiply
  // (10000·|x−med| > 44478·MAD). The whole filter is integer cents —
  // no float enters until display. Frames come from collect_list over
  // the day series; full frames only.
  def extHampel(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("dy"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"))
    val w = Window.orderBy("dy").rowsBetween(-7, 7)
    val framed = daily
      .withColumn("arr", collect_list("x").over(w))
      .filter(size(col("arr")) === 15)
      .withColumn("med", element_at(array_sort(col("arr")), 8))
      .withColumn("mad", element_at(array_sort(
        transform(col("arr"), v => abs(v - col("med")))), 8))
      .withColumn("is_outlier",
        abs(col("x") - col("med")) * 10000 > col("mad") * 44478)
    framed.filter(col("is_outlier"))
      .select(col("dy").cast("string").as("dy"),
        round(col("x").cast("double") / 100, 2).as("revenue"),
        round(col("med").cast("double") / 100, 2).as("med"),
        round(col("mad").cast("double") / 100, 2).as("mad"))
      .orderBy("dy").limit(20)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_mmdedup" -> (extMmdedup _),
    "ext_quota" -> (extQuota _),
    "ext_hampel" -> (extHampel _))

  val oracleSql: Map[String, String] = Map(
    // E-269: identical base-doc payload synthesis and sha256 digests.
    "ext_mmdedup" ->
      """with media as (select cast(d.doc_id as bigint) media_id,
        |    case when d.doc_id % 3 = 0 then 'image'
        |      when d.doc_id % 3 = 1 then 'audio' else 'video' end modality,
        |    sha256(b.text) h, cast(length(b.text) as bigint) n_bytes
        |  from documents d join documents b
        |    on b.doc_id = d.doc_id - d.doc_id % 5),
        |clusters as (select modality, h, cast(count(*) as bigint) n,
        |    max(n_bytes) len
        |  from media group by modality, h)
        |select modality, cast(sum(n) as bigint) n_media,
        |  cast(count(*) as bigint) n_unique,
        |  round(cast(sum(n) - count(*) as double) / sum(n), 4) dup_share,
        |  cast(sum(n * len) as bigint) bytes_total,
        |  cast(sum((n - 1) * len) as bigint) bytes_saved
        |from clusters group by modality order by modality""".stripMargin,

    // E-270: identical (n_tokens desc, doc_id) quota rank.
    "ext_quota" ->
      """with d as (select source, doc_id,
        |    cast(len(list_filter(string_split(text, ' '), w -> w <> ''))
        |      as bigint) n_tokens
        |  from documents),
        |r as (select source, n_tokens,
        |    row_number() over (partition by source
        |      order by n_tokens desc, doc_id) rk
        |  from d)
        |select source, cast(count(*) as bigint) n_docs,
        |  cast(sum(case when rk <= 50 then 1 else 0 end) as bigint) n_kept,
        |  cast(sum(n_tokens) as bigint) tokens_total,
        |  cast(sum(case when rk <= 50 then n_tokens else 0 end) as bigint)
        |    tokens_kept
        |from r group by source order by source""".stripMargin,

    // E-271: identical 15-frame list median/MAD and integer threshold.
    "ext_hampel" ->
      """with daily as (select cast(o_orderdate as date) dy,
        |    cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint) x
        |  from orders group by 1),
        |framed as (select dy, x,
        |    list(x) over (order by dy rows between 7 preceding
        |      and 7 following) arr
        |  from daily),
        |med as (select dy, x,
        |    list_sort(arr)[8] med,
        |    list_sort(list_transform(arr,
        |      v -> abs(v - list_sort(arr)[8])))[8] mad
        |  from framed where len(arr) = 15)
        |select strftime(dy, '%Y-%m-%d') dy,
        |  round(cast(x as double) / 100, 2) revenue,
        |  round(cast(med as double) / 100, 2) med,
        |  round(cast(mad as double) / 100, 2) mad
        |from med
        |where abs(x - med) * 10000 > mad * 44478
        |order by dy limit 20""".stripMargin)
}
