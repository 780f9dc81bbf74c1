package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 16: statistical-process-control and
  * estimation pins — categorical lift matrix, Wald–Wolfowitz runs test,
  * integer-exact ABC classification, X-MR control chart, and a KMV
  * distinct-count sketch pinned against its own exact answer.
  */
object ExtensionQueries16 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def h60(c: org.apache.spark.sql.Column) =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  // ---- E-174 categorical lift matrix ---------------------------------------------
  // lift(a, b) = n·n_ab / (n_a·n_b) for every (market segment, order
  // priority) cell — the full association matrix where ext_chisq /
  // ext_cramersv report one scalar. Counts stay integers; each lift is
  // one settled division.
  def extLiftMatrix(s: SparkSession, dir: String): DataFrame = {
    val j = t(s, dir, "orders")
      .join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"), col("o_orderpriority").as("prio"))
    val cells = j.groupBy("seg", "prio").agg(count(lit(1)).as("n_ab"))
    val na = j.groupBy("seg").agg(count(lit(1)).as("n_a"))
    val nb = j.groupBy("prio").agg(count(lit(1)).as("n_b"))
    val tot = j.agg(count(lit(1)).as("n"))
    cells.join(na, "seg").join(nb, "prio").crossJoin(tot)
      .select(col("seg"), col("prio"), col("n_ab"),
        round(col("n").cast("double") * col("n_ab") /
          (col("n_a") * col("n_b")), 6).as("lift"))
      .orderBy("seg", "prio")
  }

  // ---- E-175 Wald–Wolfowitz runs test --------------------------------------------
  // Is the daily purchase-revenue series random around its median, or
  // trending/mean-reverting? Signs from exact cents vs the interpolated
  // median, runs counted with one lag over the (tiny, documented) day
  // series, then the closed-form normal approximation. Everything
  // before z is integer-exact.
  def extRunsTest(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events").filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val med = daily.agg(expr("percentile(cents, 0.5)").as("m"))
    val signed = daily.crossJoin(med)
      .select(col("d"), when(col("cents") > col("m"), 1L).otherwise(0L).as("s"))
    val w = Window.orderBy("d")
    val runs = signed
      .withColumn("chg", when(lag("s", 1).over(w).isNull ||
        col("s") =!= lag("s", 1).over(w), 1L).otherwise(0L))
      .agg(sum("chg").as("n_runs"),
        sum("s").as("n_above"),
        sum(lit(1L) - col("s")).as("n_below"))
    runs.select(col("n_runs"), col("n_above"), col("n_below"),
      round((col("n_runs") -
        (lit(2.0) * col("n_above") * col("n_below") /
          (col("n_above") + col("n_below")) + 1)) /
        sqrt((lit(2.0) * col("n_above") * col("n_below") *
          (lit(2.0) * col("n_above") * col("n_below") - col("n_above") - col("n_below"))) /
          (pow(col("n_above") + col("n_below"), 2) *
            (col("n_above") + col("n_below") - 1))), 6).as("z"))
  }

  // ---- E-176 ABC classification --------------------------------------------------
  // Pareto classes with INTEGER-EXACT boundaries: parts ranked by cents
  // revenue, class A while cum·10 ≤ total·8 (i.e. cum share ≤ 80%),
  // B while cum·20 ≤ total·19 (≤ 95%), else C — no float ever decides
  // a class, so the classification is bit-stable at any scale. Summary
  // per class.
  def extAbc(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "lineitem")
      .groupBy("l_partkey")
      .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
        .cast("long")).as("cents"))
    val w = Window.orderBy(col("cents").desc, col("l_partkey"))
    val ranked = per.select(col("cents"),
      sum("cents").over(w.rowsBetween(Window.unboundedPreceding, 0)).as("cum"))
    val tot = ranked.agg(max("cum").as("total"))
    ranked.crossJoin(tot)
      .select(col("cents"),
        when(col("cum") * 10 <= col("total") * 8, "A")
          .when(col("cum") * 20 <= col("total") * 19, "B")
          .otherwise("C").as("abc"),
        col("total"))
      .groupBy("abc")
      .agg(count(lit(1)).as("n_parts"), sum("cents").as("rev_cents"),
        round(sum("cents").cast("double") / max("total"), 6).as("rev_share"))
      .orderBy("abc")
  }

  // ---- E-177 X-MR control chart --------------------------------------------------
  // Individuals/moving-range chart over daily purchase revenue: limits
  // mean ± 2.66·MR̄ (the SPC constant for n=2 subgroups), every day
  // emitted with its in/above/below flag so the whole chart is
  // hash-gated even when no day violates. Mean and MR̄ derive from
  // exact integer sums divided once, so both engines compute
  // bit-identical doubles and the flag comparisons can't straddle an
  // ULP.
  def extXmr(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events").filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val w = Window.orderBy("d")
    val mr = daily
      .withColumn("diff", abs(col("cents") - lag("cents", 1).over(w)))
    val stats = mr.agg(
      (sum("cents").cast("double") / count(lit(1))).as("mean"),
      (sum("diff").cast("double") / count("diff")).as("mrbar"))
    mr.crossJoin(stats)
      .withColumn("ucl", col("mean") + lit(2.66) * col("mrbar"))
      .withColumn("lcl", col("mean") - lit(2.66) * col("mrbar"))
      .select(col("d"), col("cents"),
        when(col("cents") > col("ucl"), "above")
          .when(col("cents") < col("lcl"), "below")
          .otherwise("in").as("side"))
      .orderBy("d")
  }

  // ---- E-178 KMV distinct-count sketch -------------------------------------------
  // k-minimum-values estimator over user_id with the portable 60-bit
  // hash: n̂ = (k−1)/u_(k) where u_(k) is the k-th smallest normalized
  // hash. Because both engines compute the SAME hashes, the sketch
  // estimate itself is oracle-pinned exactly — the mergeable
  // distinct-sketch pattern (per-partition k-mins union to the global
  // k-min) with its accuracy measured against the exact count in-row.
  def extKmv(s: SparkSession, dir: String): DataFrame = {
    val k = 64
    val hashes = t(s, dir, "events")
      .select(col("user_id")).distinct()
      .select((h60(col("user_id").cast("string")).cast("double") /
        lit(1152921504606846976.0)).as("u"))
    val kth = hashes.orderBy("u").limit(k)
      .agg(max("u").as("uk"), count(lit(1)).as("kk"))
    val exact = t(s, dir, "events").agg(countDistinct("user_id").as("exact"))
    exact.crossJoin(kth)
      .select(col("exact"), col("kk").as("k"),
        round((col("kk") - 1) / col("uk"), 4).as("kmv_est"),
        round(abs((col("kk") - 1) / col("uk") - col("exact")) / col("exact"), 4)
          .as("rel_err"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_liftmatrix" -> (extLiftMatrix _),
    "ext_runstest" -> (extRunsTest _),
    "ext_abc" -> (extAbc _),
    "ext_xmr" -> (extXmr _),
    "ext_kmv" -> (extKmv _))

  val oracleSql: Map[String, String] = Map(
    "ext_liftmatrix" ->
      """with j as (select c_mktsegment seg, o_orderpriority prio
        |  from orders join customer on o_custkey = c_custkey),
        |cells as (select seg, prio, count(*) n_ab from j group by 1, 2),
        |na as (select seg, count(*) n_a from j group by seg),
        |nb as (select prio, count(*) n_b from j group by prio),
        |tot as (select count(*) n from j)
        |select seg, prio, n_ab,
        |  round(cast(n as double) * n_ab / (n_a * n_b), 6) lift
        |from cells join na using(seg) join nb using(prio) cross join tot
        |order by seg, prio""".stripMargin,

    "ext_runstest" ->
      """with daily as (select cast(ts as date) d,
        |    cast(sum(cast(round(value * 100) as bigint)) as bigint) cents
        |  from events where event_type = 'purchase' group by 1),
        |med as (select quantile_cont(cents, 0.5) m from daily),
        |signed as (select d, case when cents > m then 1 else 0 end s
        |  from daily cross join med),
        |chg as (select case when lag(s) over (order by d) is null
        |      or s <> lag(s) over (order by d) then 1 else 0 end c, s
        |  from signed),
        |agg as (select cast(sum(c) as bigint) n_runs,
        |    cast(sum(s) as bigint) n_above,
        |    cast(sum(1 - s) as bigint) n_below from chg)
        |select n_runs, n_above, n_below,
        |  round((n_runs - (2.0 * n_above * n_below / (n_above + n_below) + 1))
        |    / sqrt((2.0 * n_above * n_below
        |        * (2.0 * n_above * n_below - n_above - n_below))
        |      / (pow(n_above + n_below, 2) * (n_above + n_below - 1))), 6) z
        |from agg""".stripMargin,

    "ext_abc" ->
      """with per as (select l_partkey,
        |    cast(sum(cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint))
        |      as bigint) cents
        |  from lineitem group by l_partkey),
        |ranked as (select cents,
        |    sum(cents) over (order by cents desc, l_partkey
        |      rows between unbounded preceding and current row) cum
        |  from per),
        |tot as (select max(cum) total from ranked)
        |select case when cum * 10 <= total * 8 then 'A'
        |    when cum * 20 <= total * 19 then 'B' else 'C' end abc,
        |  count(*) n_parts, cast(sum(cents) as bigint) rev_cents,
        |  round(cast(sum(cents) as double) / max(total), 6) rev_share
        |from ranked cross join tot
        |group by 1 order by abc""".stripMargin,

    "ext_xmr" ->
      """with daily as (select cast(ts as date) d,
        |    cast(sum(cast(round(value * 100) as bigint)) as bigint) cents
        |  from events where event_type = 'purchase' group by 1),
        |mr as (select d, cents,
        |    abs(cents - lag(cents) over (order by d)) diff from daily),
        |stats as (select cast(sum(cents) as double) / count(*) mean,
        |    cast(sum(diff) as double) / count(diff) mrbar from mr)
        |select d, cents,
        |  case when cents > mean + 2.66 * mrbar then 'above'
        |    when cents < mean - 2.66 * mrbar then 'below'
        |    else 'in' end side
        |from mr cross join stats
        |order by d""".stripMargin,

    "ext_kmv" ->
      """with u as (select distinct user_id from events),
        |h as (select ('0x' || substr(sha256(cast(user_id as varchar)), 1, 15))::bigint
        |    / cast(1152921504606846976 as double) u from u),
        |kth as (select max(u) uk, count(*) kk from (
        |  select u from h order by u limit 64)),
        |exact as (select count(distinct user_id) "exact" from events)
        |select "exact", kk k,
        |  round((kk - 1) / uk, 4) kmv_est,
        |  round(abs((kk - 1) / uk - "exact") / "exact", 4) rel_err
        |from exact cross join kth""".stripMargin)
}
