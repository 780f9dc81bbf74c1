package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 59: corpus-population estimators —
  * how much vocabulary / how many users exist BEYOND what the sample
  * shows. Chao1 species richness, Good-Turing unseen probability mass,
  * and Chapman capture-recapture, all from exact integer frequency
  * tallies with one settled division at the end.
  */
object ExtensionQueries59 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def toks(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("lang"),
        explode(filter(split(col("text"), " "), x => x =!= "")).as("tok"))

  // ---- E-330 Chao1 vocabulary richness -------------------------------------------
  // How many word types does each language REALLY have, given the ones
  // we sampled? Chao1 (bias-corrected): D + F1·(F1−1)/(2·(F2+1)) from
  // the singleton/doubleton counts of the type-frequency spectrum —
  // the "how much more vocab would another crawl find" estimator a
  // corpus-growth plan starts from. D, F1, F2 are exact integers; the
  // estimate is the only float.
  def extChao1(s: SparkSession, dir: String): DataFrame = {
    val freq = toks(s, dir).groupBy("lang", "tok")
      .agg(count(lit(1)).as("f"))
    freq.groupBy("lang")
      .agg(count(lit(1)).as("d"),
        sum(when(col("f") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("f") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("lang"), col("d"), col("f1"), col("f2"),
        round(col("d") + col("f1").cast("double") * (col("f1") - 1) /
          (lit(2.0) * (col("f2") + 1)), 4).as("chao1"))
      .orderBy("lang")
  }

  // ---- E-331 Good-Turing unseen mass ---------------------------------------------
  // What probability should an LM reserve for tokens it has NEVER
  // seen? Good-Turing: p0 = N1/N (singleton share of the token mass),
  // plus the adjusted count for singletons c*(1) = 2·N2/N1 — the
  // smoothing numbers behind every interpolated LM (the E-18/E-30
  // scorers' missing-mass knob, here measured per language).
  def extGoodturing(s: SparkSession, dir: String): DataFrame = {
    val freq = toks(s, dir).groupBy("lang", "tok")
      .agg(count(lit(1)).as("f"))
    freq.groupBy("lang")
      .agg(sum("f").as("n"),
        sum(when(col("f") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("f") === 2, 1L).otherwise(0L)).as("n2"))
      .select(col("lang"), col("n"), col("n1"), col("n2"),
        round(col("n1").cast("double") / col("n"), 6).as("p0"),
        // n1 = 0 would divide by zero (ANSI): report null — no
        // singleton means Good-Turing has no c*(1) to adjust
        when(col("n1") > 0,
          round(lit(2.0) * col("n2") / col("n1"), 6)).as("c1_star"))
      .orderBy("lang")
  }

  // ---- E-332 Chapman capture-recapture -------------------------------------------
  // How many users exist, counting the ones we never logged? Two
  // "captures" — users active in days 1-10 (M marked) and days 11-20
  // (C caught, R recaptured) — give the Chapman estimator
  // N̂ = (M+1)(C+1)/(R+1) − 1, the bias-corrected Lincoln-Petersen.
  // The fixture's true user count sits beside the estimate so the
  // method's error is visible. One grouped flag pass + one global
  // fold; integers until the final division.
  def extRecapture(s: SparkSession, dir: String): DataFrame = {
    val flags = t(s, dir, "events")
      .select(col("user_id"), dayofmonth(col("ts")).as("dy"))
      .groupBy("user_id")
      .agg(max(when(col("dy").between(1, 10), 1L).otherwise(0L)).as("c1"),
        max(when(col("dy").between(11, 20), 1L).otherwise(0L)).as("c2"))
    flags.agg(count(lit(1)).as("n_true"),
        sum("c1").as("m"), sum("c2").as("c"),
        sum(col("c1") * col("c2")).as("r"))
      .select(col("m"), col("c"), col("r"), col("n_true"),
        round((col("m") + 1).cast("double") * (col("c") + 1) /
          (col("r") + 1) - 1, 2).as("chapman_estimate"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_chao1" -> (extChao1 _),
    "ext_goodturing" -> (extGoodturing _),
    "ext_recapture" -> (extRecapture _))

  val oracleSql: Map[String, String] = Map(
    // E-330: identical frequency spectrum and bias-corrected form.
    "ext_chao1" ->
      """with toks as (select lang,
        |    unnest(list_filter(string_split(text, ' '), w -> w <> '')) tok
        |  from documents),
        |freq as (select lang, tok, cast(count(*) as bigint) f
        |  from toks group by lang, tok)
        |select lang, cast(count(*) as bigint) d,
        |  cast(sum(case when f = 1 then 1 else 0 end) as bigint) f1,
        |  cast(sum(case when f = 2 then 1 else 0 end) as bigint) f2,
        |  round(count(*) +
        |    cast(sum(case when f = 1 then 1 else 0 end) as double) *
        |    (sum(case when f = 1 then 1 else 0 end) - 1) /
        |    (2.0 * (sum(case when f = 2 then 1 else 0 end) + 1)), 4) chao1
        |from freq group by lang order by lang""".stripMargin,

    // E-331: identical tallies; same null-on-no-singletons guard.
    "ext_goodturing" ->
      """with toks as (select lang,
        |    unnest(list_filter(string_split(text, ' '), w -> w <> '')) tok
        |  from documents),
        |freq as (select lang, tok, cast(count(*) as bigint) f
        |  from toks group by lang, tok)
        |select lang, cast(sum(f) as bigint) n,
        |  cast(sum(case when f = 1 then 1 else 0 end) as bigint) n1,
        |  cast(sum(case when f = 2 then 1 else 0 end) as bigint) n2,
        |  round(cast(sum(case when f = 1 then 1 else 0 end) as double) /
        |    sum(f), 6) p0,
        |  case when sum(case when f = 1 then 1 else 0 end) > 0 then
        |    round(2.0 * sum(case when f = 2 then 1 else 0 end) /
        |      sum(case when f = 1 then 1 else 0 end), 6) end c1_star
        |from freq group by lang order by lang""".stripMargin,

    // E-332: identical capture windows and Chapman form.
    "ext_recapture" ->
      """with flags as (select user_id,
        |    max(case when date_part('day', ts) between 1 and 10
        |      then 1 else 0 end) c1,
        |    max(case when date_part('day', ts) between 11 and 20
        |      then 1 else 0 end) c2
        |  from events group by user_id)
        |select cast(sum(c1) as bigint) m, cast(sum(c2) as bigint) c,
        |  cast(sum(c1 * c2) as bigint) r,
        |  cast(count(*) as bigint) n_true,
        |  round(cast(sum(c1) + 1 as double) * (sum(c2) + 1) /
        |    (sum(c1 * c2) + 1) - 1, 2) chapman_estimate
        |from flags""".stripMargin)
}
