package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 19: robust trend estimation and
  * pinned sketches — Theil–Sen slope, Mann–Kendall trend test, a
  * count-min sketch gated against exact counts, Wilson score intervals,
  * and smoothed target encoding.
  */
object ExtensionQueries19 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Portable 60-bit hash (hex prefix of sha256), salted per sketch row. */
  private def h60(c: org.apache.spark.sql.Column) =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  /** The pre-pair day collapse shared by ext_theilsen/ext_mannkendall —
    * public so PlanQualitySpec can MEASURE that its row count is
    * bounded by the distinct calendar days (the semantic bound that
    * justifies the O(days²) pair join in the cartesian allowlist).
    */
  def daily(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))

  // ---- E-189 Theil–Sen robust slope ----------------------------------------------
  // Median-of-pairwise-slopes trend of daily purchase revenue — immune
  // to the outlier days that flip an OLS fit (ext_velocity). Slopes are
  // exact-cents differences over integer day gaps; the pair join is
  // O(calendar²) on the pre-collapsed day series (the ext_kendall
  // bound), and the median is the interpolated percentile both engines
  // share. Intercept = median(y − m̂·x) per Theil–Sen convention.
  def extTheilsen(s: SparkSession, dir: String): DataFrame = {
    val dd = daily(s, dir)
      .select(datediff(col("d"), lit("1970-01-01").cast("date")).cast("long")
        .as("x"), col("cents").as("y"))
    val pairs = dd.as("a").join(dd.as("b"), col("a.x") < col("b.x"))
      .select(((col("b.y") - col("a.y")).cast("double") /
        (col("b.x") - col("a.x"))).as("slope"))
    val m = pairs.agg(count(lit(1)).as("n_pairs"),
      expr("percentile(slope, 0.5)").as("m"))
    val inter = dd.crossJoin(m)
      .select(col("n_pairs"), col("m"),
        (col("y") - col("m") * col("x")).as("resid"))
      .groupBy("n_pairs", "m")
      .agg(count(lit(1)).as("n_days"),
        expr("percentile(resid, 0.5)").as("b0"))
    inter.select(col("n_days"), col("n_pairs"),
      round(col("m"), 4).as("slope_cents_per_day"),
      round(col("b0"), 4).as("intercept_cents"))
  }

  // ---- E-190 Mann–Kendall trend test ---------------------------------------------
  // Nonparametric monotone-trend test on the same day series:
  // S = Σ_{i<j} sign(yⱼ−yᵢ) (exact integer), tie-corrected variance,
  // continuity-corrected z, and the 5%-level verdict. Pairs with
  // ext_theilsen the way confidence pairs with an estimate.
  def extMannkendall(s: SparkSession, dir: String): DataFrame = {
    val dd = daily(s, dir)
    val sAgg = dd.as("a").join(dd.as("b"), col("a.d") < col("b.d"))
      .agg(sum(signum(col("b.cents") - col("a.cents")).cast("long")).as("s"))
    val n = dd.agg(count(lit(1)).as("n"))
    val ties = dd.groupBy("cents").agg(count(lit(1)).as("tc"))
      .filter(col("tc") > 1)
      .agg(coalesce(sum(col("tc") * (col("tc") - 1) * (lit(2) * col("tc") + 5)),
        lit(0L)).as("tie_term"))
    n.crossJoin(sAgg).crossJoin(ties)
      .withColumn("var_s",
        (col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) - col("tie_term"))
          .cast("double") / 18.0)
      .withColumn("z",
        when(col("s") > 0, (col("s") - 1) / sqrt(col("var_s")))
          .when(col("s") < 0, (col("s") + 1) / sqrt(col("var_s")))
          .otherwise(lit(0.0)))
      .select(col("n"), col("s"), round(col("z"), 6).as("z"),
        when(col("z") > 1.96, "increasing")
          .when(col("z") < -1.96, "decreasing")
          .otherwise("none").as("trend"))
  }

  // ---- E-191 count-min sketch, pinned --------------------------------------------
  // Count-min over document token occurrences: 4 rows × 64 buckets with
  // the salted portable hash, estimate = min over rows of the bucket
  // counter, reported against the exact count for the top-10 tokens.
  // Both engines hash identically so the SKETCH ITSELF is oracle-pinned
  // (the ext_kmv discipline) and CM's one-sided overcount ≥ 0 is
  // visible in-row. Counters come from one (row, bucket) aggregate —
  // the mergeable-across-partitions shape a streaming heavy-hitter
  // needs.
  def extCmsketch(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(explode(filter(split(col("text"), " "), x => x =!= ""))
        .as("tok"))
    val rows = Seq(0, 1, 2, 3)
    val hashed = toks.select(col("tok"),
      explode(array(rows.map(r =>
        struct(lit(r).as("r"),
          pmod(h60(concat(lit(r.toString), lit("|"), col("tok"))), lit(64L))
            .as("b"))): _*)).as("rb"))
      .select(col("tok"), col("rb.r").as("r"), col("rb.b").as("b"))
    val counters = hashed.groupBy("r", "b").agg(count(lit(1)).as("cnt"))
    val top = toks.groupBy("tok").agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("tok")).limit(10)
    val probes = top.select(col("tok"), col("exact"),
      explode(array(rows.map(r =>
        struct(lit(r).as("r"),
          pmod(h60(concat(lit(r.toString), lit("|"), col("tok"))), lit(64L))
            .as("b"))): _*)).as("rb"))
      .select(col("tok"), col("exact"), col("rb.r").as("r"), col("rb.b").as("b"))
    probes.join(counters, Seq("r", "b"))
      .groupBy("tok", "exact")
      .agg(min("cnt").as("cm_est"))
      .select(col("tok"), col("exact"), col("cm_est"),
        (col("cm_est") - col("exact")).as("overcount"))
      .orderBy(col("exact").desc, col("tok"))
  }

  // ---- E-192 Wilson score intervals ----------------------------------------------
  // 95% Wilson CI for each event type's share of traffic — the interval
  // that stays inside [0,1] where the naive ±z√(p(1−p)/n) Wald band
  // does not. Counts are integers; the closed form is the same settled
  // double expression on both engines.
  def extWilson(s: SparkSession, dir: String): DataFrame = {
    // 3.8416 as a decimal literal (not computed 1.96·1.96) so the Spark
    // constant is bit-identical to the oracle SQL's parsed literal.
    val z2 = 3.8416
    val per = t(s, dir, "events").groupBy("event_type")
      .agg(count(lit(1)).as("k"))
    val tot = per.agg(sum("k").as("n"))
    per.crossJoin(tot)
      .withColumn("p", col("k").cast("double") / col("n"))
      .withColumn("den", lit(1.0) + lit(z2) / col("n"))
      .withColumn("center", (col("p") + lit(z2) / (lit(2.0) * col("n"))) / col("den"))
      .withColumn("half",
        lit(1.96) * sqrt(col("p") * (lit(1.0) - col("p")) / col("n") +
          lit(z2) / (lit(4.0) * col("n") * col("n"))) / col("den"))
      .select(col("event_type"), col("k"), col("n"),
        round(col("p"), 6).as("share"),
        round(col("center") - col("half"), 6).as("wilson_lo"),
        round(col("center") + col("half"), 6).as("wilson_hi"))
      .orderBy("event_type")
  }

  // ---- E-193 smoothed target encoding --------------------------------------------
  // Mean target encoding of market segment against order revenue with
  // additive smoothing toward the global mean (prior weight m=10) — the
  // ML-feature cousin of ext_woe that survives rare categories. Cents
  // sums stay integer; encoding = (Σ_seg + m·μ)/(n_seg + m) is one
  // settled expression identical on both engines.
  def extTargetenc(s: SparkSession, dir: String): DataFrame = {
    val j = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val per = j.groupBy("seg").agg(count(lit(1)).as("n"),
      sum("cents").as("sum_c"))
    val g = j.agg(sum("cents").as("g_sum"), count(lit(1)).as("g_n"))
    per.crossJoin(g)
      .select(col("seg"), col("n"),
        round(col("sum_c").cast("double") / col("n") / 100.0, 4).as("raw_mean"),
        round((col("sum_c").cast("double") +
          lit(10.0) * (col("g_sum").cast("double") / col("g_n"))) /
          (col("n") + 10) / 100.0, 4).as("encoded_mean"))
      .orderBy("seg")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_theilsen" -> (extTheilsen _),
    "ext_mannkendall" -> (extMannkendall _),
    "ext_cmsketch" -> (extCmsketch _),
    "ext_wilson" -> (extWilson _),
    "ext_targetenc" -> (extTargetenc _))

  val oracleSql: Map[String, String] = Map(
    "ext_theilsen" ->
      """with daily as (select cast(ts as date) d,
        |    cast(sum(cast(round(value * 100) as bigint)) as bigint) cents
        |  from events where event_type = 'purchase' group by 1),
        |dd as (select cast(d - date '1970-01-01' as bigint) x, cents y from daily),
        |pairs as (select cast(b.y - a.y as double) / (b.x - a.x) slope
        |  from dd a join dd b on a.x < b.x),
        |m as (select cast(count(*) as bigint) n_pairs,
        |    quantile_cont(slope, 0.5) m from pairs),
        |inter as (select n_pairs, m, cast(count(*) as bigint) n_days,
        |    quantile_cont(y - m * x, 0.5) b0
        |  from dd cross join m group by 1, 2)
        |select n_days, n_pairs, round(m, 4) slope_cents_per_day,
        |  round(b0, 4) intercept_cents from inter""".stripMargin,

    "ext_mannkendall" ->
      """with daily as (select cast(ts as date) d,
        |    cast(sum(cast(round(value * 100) as bigint)) as bigint) cents
        |  from events where event_type = 'purchase' group by 1),
        |sa as (select cast(sum(cast(sign(b.cents - a.cents) as bigint)) as bigint) s
        |  from daily a join daily b on a.d < b.d),
        |nn as (select cast(count(*) as bigint) n from daily),
        |ties as (select cast(coalesce(sum(tc * (tc - 1) * (2 * tc + 5)), 0)
        |    as bigint) tie_term
        |  from (select count(*) tc from daily group by cents) t where tc > 1),
        |v as (select n, s, tie_term,
        |    cast(n * (n - 1) * (2 * n + 5) - tie_term as double) / 18.0 var_s
        |  from nn cross join sa cross join ties),
        |zz as (select n, s,
        |    case when s > 0 then (s - 1) / sqrt(var_s)
        |      when s < 0 then (s + 1) / sqrt(var_s) else 0.0 end z from v)
        |select n, s, round(z, 6) z,
        |  case when z > 1.96 then 'increasing'
        |    when z < -1.96 then 'decreasing' else 'none' end trend
        |from zz""".stripMargin,

    "ext_cmsketch" ->
      """with toks as (select
        |    unnest(list_filter(string_split(text, ' '), w -> w <> '')) tok
        |  from documents),
        |hashed as (select tok, r,
        |    ('0x' || substr(sha256(cast(r as varchar) || '|' || tok), 1, 15))::bigint
        |      % 64 b
        |  from toks, unnest([0, 1, 2, 3]) rr(r)),
        |counters as (select r, b, cast(count(*) as bigint) cnt
        |  from hashed group by 1, 2),
        |top as (select tok, cast(count(*) as bigint) "exact" from toks
        |  group by 1 order by "exact" desc, tok limit 10),
        |probes as (select tok, "exact", r,
        |    ('0x' || substr(sha256(cast(r as varchar) || '|' || tok), 1, 15))::bigint
        |      % 64 b
        |  from top, unnest([0, 1, 2, 3]) rr(r))
        |select tok, "exact", min(cnt) cm_est,
        |  cast(min(cnt) - "exact" as bigint) overcount
        |from probes join counters using (r, b)
        |group by tok, "exact" order by "exact" desc, tok""".stripMargin,

    "ext_wilson" ->
      """with per as (select event_type, cast(count(*) as bigint) k
        |  from events group by 1),
        |tot as (select cast(sum(k) as bigint) n from per),
        |e as (select event_type, k, n, cast(k as double) / n p,
        |    1.0 + 3.8416 / n den from per cross join tot)
        |select event_type, k, n, round(p, 6) as "share",
        |  round((p + 3.8416 / (2.0 * n)) / den
        |    - 1.96 * sqrt(p * (1.0 - p) / n + 3.8416 / (4.0 * n * n)) / den, 6)
        |    wilson_lo,
        |  round((p + 3.8416 / (2.0 * n)) / den
        |    + 1.96 * sqrt(p * (1.0 - p) / n + 3.8416 / (4.0 * n * n)) / den, 6)
        |    wilson_hi
        |from e order by event_type""".stripMargin,

    "ext_targetenc" ->
      """with j as (select c_mktsegment seg,
        |    cast(round(o_totalprice * 100) as bigint) cents
        |  from orders join customer on o_custkey = c_custkey),
        |per as (select seg, cast(count(*) as bigint) n,
        |    cast(sum(cents) as bigint) sum_c from j group by 1),
        |g as (select cast(sum(cents) as bigint) g_sum,
        |    cast(count(*) as bigint) g_n from j)
        |select seg, n,
        |  round(cast(sum_c as double) / n / 100.0, 4) raw_mean,
        |  round((cast(sum_c as double) + 10.0 * (cast(g_sum as double) / g_n))
        |    / (n + 10) / 100.0, 4) encoded_mean
        |from per cross join g order by seg""".stripMargin)
}
