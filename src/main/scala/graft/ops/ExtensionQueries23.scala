package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 23: corpus economics and
  * experiment harness closers — vocabulary coverage curve, Laspeyres
  * price index, journey endpoints, and the A/A-test harness.
  */
object ExtensionQueries23 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def h60(c: org.apache.spark.sql.Column) =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  // ---- E-209 vocabulary coverage curve -------------------------------------------
  // How much of the vocabulary do you need to cover 50∕90∕99% of token
  // MASS? Tokens ranked by count under a total order, integer cumsums,
  // and the threshold cut decided in integer math (cum·100 ≥ total·thr)
  // — the tokenizer-sizing companion to ext_zipf. The global rank
  // window sorts the VOCABULARY table (≤ millions of rows at corpus
  // scale), never token occurrences.
  def extCoverage(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "documents")
      .select(explode(filter(split(col("text"), " "), x => x =!= ""))
        .as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("cnt").desc, col("tok"))
    val ranked = counts
      .withColumn("rn", row_number().over(w))
      .withColumn("cum", sum("cnt").over(w.rowsBetween(
        Window.unboundedPreceding, 0)))
    val tot = ranked.agg(max("cum").as("total"), max("rn").as("vocab"))
    ranked.crossJoin(tot)
      .select(col("rn"), col("cum"), col("total"), col("vocab"),
        explode(array(lit(50L), lit(90L), lit(99L))).as("thr"))
      .filter(col("cum") * 100 >= col("total") * col("thr"))
      .groupBy("thr")
      .agg(min("rn").as("n_tokens"), max("vocab").as("vocab"))
      .select(col("thr"), col("n_tokens"), col("vocab"),
        round(col("n_tokens").cast("double") / col("vocab"), 6)
          .as("vocab_share"))
      .orderBy("thr")
  }

  // ---- E-210 Laspeyres price index -----------------------------------------------
  // Base-period-weighted price change 1995→1996: per-part
  // quantity-weighted unit prices p_y = Σcents_y∕Σqty_y (both sums
  // exact longs — quantities are integral), index =
  // Σp₁q₀ ∕ Σp₀q₀ over parts traded in both years. The cross-period
  // join is equi on partkey; the index is a ratio of two same-shaped
  // folds, so fold noise cancels well below the rounding.
  def extPriceindex(s: SparkSession, dir: String): DataFrame = {
    def yearAgg(y: Int) = t(s, dir, "lineitem")
      .filter(year(col("l_shipdate")) === y)
      .groupBy("l_partkey")
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as(s"c$y"),
        sum(col("l_quantity").cast("long")).as(s"q$y"))
    yearAgg(1995).join(yearAgg(1996), "l_partkey")
      .select(
        (col("c1995").cast("double") / col("q1995")).as("p0"),
        (col("c1996").cast("double") / col("q1996")).as("p1"),
        col("q1995").as("q0"))
      .agg(count(lit(1)).as("n_parts"),
        round(sum(col("p1") * col("q0")) / sum(col("p0") * col("q0")), 6)
          .as("laspeyres"))
  }

  // ---- E-211 journey endpoints ---------------------------------------------------
  // Where do users enter and where do they end? First and last event
  // type per user (row_number ascending and descending under the same
  // total order), crossed into the entry→exit flow matrix — the
  // Sankey-diagram input beside ext_journeys' interior snippets.
  def extEndpoints(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
    val wAsc = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val wDesc = Window.partitionBy("user_id")
      .orderBy(col("us").desc, col("event_id").desc)
    base
      .withColumn("rn1", row_number().over(wAsc))
      .withColumn("rn2", row_number().over(wDesc))
      .filter(col("rn1") === 1 || col("rn2") === 1)
      .groupBy("user_id")
      .agg(max(when(col("rn1") === 1, col("event_type"))).as("first_type"),
        max(when(col("rn2") === 1, col("event_type"))).as("last_type"))
      .groupBy("first_type", "last_type")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("first_type", "last_type")
  }

  // ---- E-212 A/A-test harness ----------------------------------------------------
  // The experiment-pipeline null check: split users with the portable
  // hash (E-194's assignment), compare per-user purchase revenue with
  // Welch's t — a healthy pipeline shows |t| < 1.96. Means and
  // variances come from exact decimal sums (E-195 discipline); the
  // two-row arm aggregate pivots to one settled closed form.
  def extAatest(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "events")
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase",
        round(col("value") * 100).cast("long")).otherwise(0L))
        .cast("decimal(38,0)").as("x"))
      .select(pmod(h60(col("user_id").cast("string")), lit(2L)).as("arm"),
        col("x"))
    val arms = per.groupBy("arm")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"))
    val wide = arms.agg(
      max(when(col("arm") === 0, col("n"))).as("na"),
      max(when(col("arm") === 0, col("sx"))).as("sxa"),
      max(when(col("arm") === 0, col("sxx"))).as("sxxa"),
      max(when(col("arm") === 1, col("n"))).as("nb"),
      max(when(col("arm") === 1, col("sx"))).as("sxb"),
      max(when(col("arm") === 1, col("sxx"))).as("sxxb"))
    wide
      .withColumn("ma", col("sxa").cast("double") / col("na"))
      .withColumn("mb", col("sxb").cast("double") / col("nb"))
      .withColumn("va",
        (col("na") * col("sxxa") - col("sxa") * col("sxa")).cast("double") /
          (col("na").cast("double") * (col("na") - 1)))
      .withColumn("vb",
        (col("nb") * col("sxxb") - col("sxb") * col("sxb")).cast("double") /
          (col("nb").cast("double") * (col("nb") - 1)))
      .withColumn("tt", (col("ma") - col("mb")) /
        sqrt(col("va") / col("na") + col("vb") / col("nb")))
      .select(col("na"), col("nb"),
        round(col("ma") / 100.0, 4).as("mean_a"),
        round(col("mb") / 100.0, 4).as("mean_b"),
        round(col("tt"), 4).as("t"),
        (abs(col("tt")) < 1.96).as("aa_ok"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_coverage" -> (extCoverage _),
    "ext_priceindex" -> (extPriceindex _),
    "ext_endpoints" -> (extEndpoints _),
    "ext_aatest" -> (extAatest _))

  val oracleSql: Map[String, String] = Map(
    "ext_coverage" ->
      """with counts as (select tok, cast(count(*) as bigint) cnt from (
        |    select unnest(list_filter(string_split(text, ' '), w -> w <> ''))
        |      tok from documents) group by 1),
        |ranked as (select
        |    row_number() over (order by cnt desc, tok) rn,
        |    sum(cnt) over (order by cnt desc, tok
        |      rows between unbounded preceding and current row) cum
        |  from counts),
        |tot as (select max(cum) total, max(rn) vocab from ranked)
        |select thr, min(rn) n_tokens, max(vocab) vocab,
        |  round(cast(min(rn) as double) / max(vocab), 6) vocab_share
        |from ranked cross join tot, unnest([50, 90, 99]) u(thr)
        |where cum * 100 >= total * thr
        |group by thr order by thr""".stripMargin,

    "ext_priceindex" ->
      """with y95 as (select l_partkey,
        |    cast(sum(cast(round(l_extendedprice * 100) as bigint)) as bigint) c0,
        |    cast(sum(cast(l_quantity as bigint)) as bigint) q0
        |  from lineitem where year(l_shipdate) = 1995 group by 1),
        |y96 as (select l_partkey,
        |    cast(sum(cast(round(l_extendedprice * 100) as bigint)) as bigint) c1,
        |    cast(sum(cast(l_quantity as bigint)) as bigint) q1
        |  from lineitem where year(l_shipdate) = 1996 group by 1),
        |p as (select cast(c0 as double) / q0 p0, cast(c1 as double) / q1 p1,
        |    q0 from y95 join y96 using (l_partkey))
        |select cast(count(*) as bigint) n_parts,
        |  round(sum(p1 * q0) / sum(p0 * q0), 6) laspeyres
        |from p""".stripMargin,

    "ext_endpoints" ->
      """with base as (select user_id, event_type,
        |    row_number() over (partition by user_id
        |      order by epoch_us(ts), event_id) rn1,
        |    row_number() over (partition by user_id
        |      order by epoch_us(ts) desc, event_id desc) rn2
        |  from events),
        |fl as (select user_id,
        |    max(case when rn1 = 1 then event_type end) first_type,
        |    max(case when rn2 = 1 then event_type end) last_type
        |  from base where rn1 = 1 or rn2 = 1 group by 1)
        |select first_type, last_type, cast(count(*) as bigint) n_users
        |from fl group by 1, 2 order by first_type, last_type""".stripMargin,

    "ext_aatest" ->
      """with per as (select
        |    ('0x' || substr(sha256(cast(user_id as varchar)), 1, 15))::bigint % 2
        |      arm,
        |    cast(cast(sum(case when event_type = 'purchase'
        |      then cast(round(value * 100) as bigint) else 0 end) as bigint)
        |      as hugeint) x
        |  from events group by user_id),
        |arms as (select arm, cast(count(*) as bigint) n, sum(x) sx,
        |    sum(x * x) sxx from per group by 1),
        |wide as (select
        |    max(case when arm = 0 then n end) na,
        |    max(case when arm = 0 then sx end) sxa,
        |    max(case when arm = 0 then sxx end) sxxa,
        |    max(case when arm = 1 then n end) nb,
        |    max(case when arm = 1 then sx end) sxb,
        |    max(case when arm = 1 then sxx end) sxxb
        |  from arms),
        |e as (select na, nb,
        |    cast(sxa as double) / na ma, cast(sxb as double) / nb mb,
        |    cast(na * sxxa - sxa * sxa as double)
        |      / (cast(na as double) * (na - 1)) va,
        |    cast(nb * sxxb - sxb * sxb as double)
        |      / (cast(nb as double) * (nb - 1)) vb
        |  from wide),
        |tt as (select na, nb, ma, mb,
        |    (ma - mb) / sqrt(va / na + vb / nb) t from e)
        |select na, nb, round(ma / 100.0, 4) mean_a,
        |  round(mb / 100.0, 4) mean_b, round(t, 4) t,
        |  abs(t) < 1.96 aa_ok
        |from tt""".stripMargin)
}
