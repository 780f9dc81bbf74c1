package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 12: time-series shape primitives
  * (local peaks, gaps-and-islands streaks, weekly time profiles) and a
  * readability score — the calendar-analytics family.
  *
  * Everything here is integer-or-date-exact except the readability
  * float, which is one settled expression per row.
  */
object ExtensionQueries12 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-156 daily revenue peaks -------------------------------------------------
  // Strict local maxima of the daily purchase-revenue series: days that
  // beat both neighbors (series ends can't qualify — lag/lead null).
  // Revenue compares as exact cents longs, so "peak" never flips on a
  // float fold; the day-level series is tiny at any raw-event scale.
  def extPeaks(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events").filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("rev_cents"))
    val w = Window.orderBy("d")
    daily
      .withColumn("prev", lag("rev_cents", 1).over(w))
      .withColumn("nxt", lead("rev_cents", 1).over(w))
      .filter(col("prev").isNotNull && col("nxt").isNotNull &&
        col("rev_cents") > col("prev") && col("rev_cents") > col("nxt"))
      .select(col("d"), col("rev_cents"))
      .orderBy("d")
  }

  // ---- E-157 longest daily-activity streak ---------------------------------------
  // Gaps-and-islands per user: consecutive active days share the anchor
  // day − row_number, islands aggregate to (length, start), and each
  // user reports their longest streak (ties → earliest start). All
  // windows are per-user — partition-local; output is pure ints/dates.
  def extStreak(s: SparkSession, dir: String): DataFrame = {
    val ud = t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val islands = ud
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy("d")))
      .withColumn("anchor", date_sub(col("d"), col("rn")))
      .groupBy("user_id", "anchor")
      .agg(count(lit(1)).as("streak"), min("d").as("start"))
    islands
      .withColumn("pick", row_number().over(
        Window.partitionBy("user_id").orderBy(col("streak").desc, col("start"))))
      .filter(col("pick") === 1)
      .select(col("user_id"), col("streak"), col("start"))
      .orderBy("user_id")
  }

  // ---- E-158 weekly time profile -------------------------------------------------
  // The (ISO weekday × hour) activity heat table — the temporal
  // fingerprint that separates bot traffic (flat) from human (diurnal).
  // One two-key integer aggregate; absent cells simply don't appear
  // (both engines agree).
  def extTimeProfile(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events")
      .groupBy(expr("weekday(ts) + 1").as("isodow"), hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
      .orderBy("isodow", "hr")
  }

  // ---- E-159 readability score ---------------------------------------------------
  // Flesch-style reading ease with the vowel-group syllable heuristic
  // (each maximal [aeiou]+ run ≈ one syllable) and docs-as-one-sentence
  // (the fixture corpus has no sentence punctuation) — the score's
  // PLUMBING is the contract here: tokenization, regexp counting and
  // the settled one-float formula are engine-identical.
  def extReadability(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "documents")
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), x => x =!= lit("")))
          .cast("long").as("words"),
        size(expr("regexp_extract_all(text, '[aeiouAEIOU]+', 0)"))
          .cast("long").as("syllables"))
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), col("words"), col("syllables"),
        round(lit(206.835) - lit(1.015) * col("words") -
          lit(84.6) * (col("syllables").cast("double") / col("words")), 4)
          .as("flesch"))
      .orderBy("doc_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_peaks" -> (extPeaks _),
    "ext_streak" -> (extStreak _),
    "ext_timeprofile" -> (extTimeProfile _),
    "ext_readability" -> (extReadability _))

  val oracleSql: Map[String, String] = Map(
    "ext_peaks" ->
      """with daily as (select cast(ts as date) d,
        |    cast(sum(cast(round(value * 100) as bigint)) as bigint) rev_cents
        |  from events where event_type = 'purchase' group by 1),
        |w as (select d, rev_cents,
        |    lag(rev_cents) over (order by d) prev,
        |    lead(rev_cents) over (order by d) nxt
        |  from daily)
        |select d, rev_cents from w
        |where prev is not null and nxt is not null
        |  and rev_cents > prev and rev_cents > nxt
        |order by d""".stripMargin,

    "ext_streak" ->
      """with ud as (select distinct user_id, cast(ts as date) d from events),
        |r as (select user_id, d,
        |    cast(row_number() over (partition by user_id order by d) as integer) rn
        |  from ud),
        |islands as (select user_id, d - rn anchor, count(*) streak, min(d) strt
        |  from r group by user_id, d - rn),
        |ranked as (select user_id, streak, strt,
        |    row_number() over (partition by user_id
        |      order by streak desc, strt) pick
        |  from islands)
        |select user_id, streak, strt "start" from ranked
        |where pick = 1 order by user_id""".stripMargin,

    "ext_timeprofile" ->
      """select isodow(ts) isodow, hour(ts) hr, count(*) n
        |from events group by 1, 2 order by 1, 2""".stripMargin,

    "ext_readability" ->
      """with f as (select doc_id,
        |    cast(len(list_filter(string_split(text, ' '), w -> w <> '')) as bigint)
        |      words,
        |    cast(len(regexp_extract_all(text, '[aeiouAEIOU]+')) as bigint) syllables
        |  from documents where doc_id < 100)
        |select doc_id, words, syllables,
        |  round(206.835 - 1.015 * words
        |    - 84.6 * (cast(syllables as double) / words), 4) flesch
        |from f order by doc_id""".stripMargin)
}
