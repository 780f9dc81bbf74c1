package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 85: audience algebra, ordinal
  * complexity, and small-shift process control — per-user event-type
  * bitmasks with segment algebra, order-3 permutation entropy of the
  * revenue series, and the EWMA control chart with time-varying
  * limits.
  */
object ExtensionQueries85 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-402 bitmask audience algebra --------------------------------------------
  // Segment membership as bits (click=1, error=2, purchase=4,
  // signup=8, view=16 — a pinned mapping): one bit_or aggregate per
  // user, then audience-combination counts by mask with the decoded
  // flags in-row. The roaring-bitmap mental model expressed
  // relationally — any boolean audience combination is one integer
  // mask predicate away. ≤ 31 observed masks.
  def extBitaudience(s: SparkSession, dir: String): DataFrame = {
    val bit = when(col("event_type") === "click", 1L)
      .when(col("event_type") === "error", 2L)
      .when(col("event_type") === "purchase", 4L)
      .when(col("event_type") === "signup", 8L)
      .otherwise(16L)
    val masks = t(s, dir, "events")
      .select(col("user_id"), bit.as("b"))
      .groupBy("user_id").agg(expr("bit_or(b)").as("mask"))
    val tot = masks.agg(count(lit(1)).as("nu")).limit(1)
    masks.groupBy("mask").agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(tot))
      .select(col("mask"), col("n_users"),
        (expr("mask & 1") > 0).as("has_click"),
        (expr("mask & 2") > 0).as("has_error"),
        (expr("mask & 4") > 0).as("has_purchase"),
        (expr("mask & 8") > 0).as("has_signup"),
        (expr("mask & 16") > 0).as("has_view"),
        round(col("n_users").cast("double") * 100 / col("nu"), 4)
          .as("pct_users"))
      .orderBy("mask")
  }

  // ---- E-403 permutation entropy (order 3) ---------------------------------------
  // Complexity of the daily revenue series via ordinal patterns:
  // every 3-day window maps to one of 6 permutations under the
  // (value, position) total order (exact integer comparisons — ties
  // break to the earlier day, so the pattern is always decided), and
  // H = −Σ p·ln p ∕ ln 6 over the pattern distribution
  // (1e-9-quantized terms). 1 = white noise, →0 = deterministic
  // motion. Per-pattern shares reported with the normalized entropy
  // in-row.
  def extPermentropy(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("d")
    val tri = t(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"))
      .withColumn("x1", lag("x", 1).over(w))
      .withColumn("x2", lag("x", 2).over(w))
      .filter(col("x2").isNotNull)
    // positions: a = t-2 (pos 0), b = t-1 (pos 1), c = t (pos 2);
    // less(u,v) on (value, pos) — ties to the earlier position
    val ab = col("x2") <= col("x1") // a < b  (tie -> a first)
    val ac = col("x2") <= col("x")
    val bc = col("x1") <= col("x")
    val pat = when(ab && bc, lit(12L)) // a<b<c  pattern "012"
      .when(ab && !bc && ac, lit(21L)) // a<c<b  "021"
      .when(!ab && ac, lit(102L)) // b<a<c  "102"
      .when(ab && !ac, lit(201L)) // c<a<b  "201"
      .when(!ab && !ac && bc, lit(120L)) // b<c<a  "120"
      .otherwise(lit(210L)) // c<b<a  "210"
    val pats = tri.select(pat.as("p"))
      .groupBy("p").agg(count(lit(1)).as("c"))
    val tot = pats.agg(sum("c").as("n")).limit(1)
    val terms = pats.crossJoin(broadcast(tot))
      .withColumn("tq",
        round(col("c").cast("double") / col("n") *
          log(col("c").cast("double") / col("n")) * lit(1e9))
          .cast("long"))
    val h = terms.agg(
        round(-sum("tq").cast("double") / 1e9 / math.log(6.0), 4)
          .as("h_norm")).limit(1)
    terms.crossJoin(broadcast(h))
      .select(col("p").as("pattern"), col("c").as("n_windows"),
        round(col("c").cast("double") / col("n"), 4).as("pattern_share"),
        col("h_norm"))
      .orderBy("pattern")
  }

  // ---- E-404 EWMA control chart --------------------------------------------------
  // The small-shift detector X-MR (E-177) misses: the E-355
  // exact-dyadic EWMA level per day against time-varying limits
  // μ ± 3σ·√((1−4^(−t))∕3) (λ = ½ makes λ∕(2−λ) = ⅓ and
  // (1−λ)^{2t} = 4^(−t), an exact power), t = day index. μ∕σ from
  // exact decimal moments of the full series; every day flagged
  // in∕above∕below. Last 15 days.
  def extEwmachart(s: SparkSession, dir: String): DataFrame = {
    val days = t(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"))
    val probes = days.select(col("d").as("td"),
        explode(sequence(lit(0), lit(39))).as("j"))
      .withColumn("sd", expr("date_sub(td, j)"))
      .withColumn("w", pow(lit(2.0), lit(39) - col("j")).cast("long"))
    val lvl = probes.join(days.select(col("d").as("sd"), col("x")),
        Seq("sd"))
      .groupBy(col("td"))
      .agg((sum(col("w").cast("decimal(38,0)") * col("x")).cast("double") /
        sum(col("w").cast("decimal(38,0)")).cast("double")).as("level"))
    val mom = days.agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("s1"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("s2"))
      .select(col("n"), (col("s1").cast("double") / col("n")).as("mu"),
        sqrt((col("n") * col("s2") - col("s1") * col("s1")).cast("double") /
          col("n").cast("double") / (col("n") - 1).cast("double"))
          .as("sd")).limit(1)
    val idx = days.select(col("d"),
      row_number().over(Window.orderBy("d")).cast("long").as("t"))
    lvl.join(idx, lvl("td") === idx("d"))
      .crossJoin(broadcast(mom))
      .withColumn("half",
        lit(3.0) * col("sd") *
          sqrt((lit(1.0) - pow(lit(0.25), col("t").cast("double"))) / 3))
      .select(col("td").as("d"),
        round(col("level") / 100, 2).as("ewma_dollars"),
        round((col("mu") - col("half")) / 100, 2).as("lcl_dollars"),
        round((col("mu") + col("half")) / 100, 2).as("ucl_dollars"),
        when(col("level") > col("mu") + col("half"), "above")
          .when(col("level") < col("mu") - col("half"), "below")
          .otherwise("in").as("signal"))
      .orderBy(desc("d"))
      .limit(15)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_bitaudience" -> (extBitaudience _),
    "ext_permentropy" -> (extPermentropy _),
    "ext_ewmachart" -> (extEwmachart _))

  val oracleSql: Map[String, String] = Map(
    // E-402: identical bit mapping, bit_or fold, mask algebra.
    "ext_bitaudience" ->
      """with m as (select user_id,
        |    cast(bit_or(case event_type when 'click' then 1
        |      when 'error' then 2 when 'purchase' then 4
        |      when 'signup' then 8 else 16 end) as bigint) mask
        |  from events group by 1),
        |tot as (select cast(count(*) as bigint) nu from m)
        |select mask, cast(count(*) as bigint) n_users,
        |  (mask & 1) > 0 has_click,
        |  (mask & 2) > 0 has_error,
        |  (mask & 4) > 0 has_purchase,
        |  (mask & 8) > 0 has_signup,
        |  (mask & 16) > 0 has_view,
        |  round(cast(count(*) as double) * 100 / any_value(nu), 4)
        |    pct_users
        |from m cross join tot
        |group by mask order by mask""".stripMargin,

    // E-403: identical (value, pos) order, pattern codes, folds.
    "ext_permentropy" ->
      """with days as (select cast(o_orderdate as date) d,
        |    sum(cast(round(o_totalprice * 100) as bigint)) x
        |  from orders group by 1),
        |tri as (select x,
        |    lag(x, 1) over (order by d) x1,
        |    lag(x, 2) over (order by d) x2
        |  from days),
        |pat as (select
        |    case
        |      when x2 <= x1 and x1 <= x then 12
        |      when x2 <= x1 and not (x1 <= x) and x2 <= x then 21
        |      when not (x2 <= x1) and x2 <= x then 102
        |      when x2 <= x1 and not (x2 <= x) then 201
        |      when not (x2 <= x1) and not (x2 <= x) and x1 <= x then 120
        |      else 210 end p
        |  from tri where x2 is not null),
        |pats as (select cast(p as bigint) p, cast(count(*) as bigint) c
        |  from pat group by 1),
        |tot as (select cast(sum(c) as bigint) n from pats),
        |terms as (select p, c, n,
        |    cast(round(cast(c as double) / n *
        |      ln(cast(c as double) / n) * 1e9) as bigint) tq
        |  from pats cross join tot),
        |h as (select round(-cast(sum(tq) as double) / 1e9 / ln(6.0), 4)
        |    h_norm from terms)
        |select p pattern, c n_windows,
        |  round(cast(c as double) / n, 4) pattern_share, h_norm
        |from terms cross join h
        |order by pattern""".stripMargin,

    // E-404: identical dyadic level, exact moments, 4^-t limits.
    "ext_ewmachart" ->
      """with days as (select cast(o_orderdate as date) d,
        |    sum(cast(round(o_totalprice * 100) as bigint)) x
        |  from orders group by 1),
        |probes as (select t.d td, j.j, t.d - cast(j.j as integer) sd,
        |    cast(pow(2.0, 39 - j.j) as bigint) w
        |  from days t cross join
        |    (select unnest(generate_series(0, 39)) j) j),
        |lvl as (select td,
        |    cast(sum(cast(w as hugeint) * s.x) as double) /
        |      cast(sum(cast(w as hugeint)) as double) lv
        |  from probes join days s on probes.sd = s.d
        |  group by 1),
        |mom as (select cast(count(*) as bigint) n,
        |    cast(sum(cast(x as hugeint)) as double) /
        |      cast(count(*) as bigint) mu,
        |    sqrt(cast(count(*) * sum(cast(x as hugeint) * x) -
        |      sum(cast(x as hugeint)) * sum(cast(x as hugeint))
        |      as double) / cast(count(*) as double) /
        |      cast(count(*) - 1 as double)) sd
        |  from days),
        |idx as (select d, cast(row_number() over (order by d)
        |    as bigint) t from days),
        |lim as (select td, lv, t,
        |    3.0 * sd * sqrt((1.0 - pow(0.25, cast(t as double))) / 3) half,
        |    mu
        |  from lvl join idx on idx.d = lvl.td cross join mom)
        |select td d, round(lv / 100, 2) ewma_dollars,
        |  round((mu - half) / 100, 2) lcl_dollars,
        |  round((mu + half) / 100, 2) ucl_dollars,
        |  case when lv > mu + half then 'above'
        |    when lv < mu - half then 'below'
        |    else 'in' end signal
        |from lim order by d desc limit 15""".stripMargin)
}
