package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 extension queries, batch 3: the inferential-statistics and
  * time-series family a data-quality / experimentation team runs over
  * the warehouse — rank-sum tests, survival curves, autocorrelation,
  * changepoint scan, grouped jackknife error bars.
  *
  * Determinism discipline is SURVEY §5.2: every float is rounded
  * in-query on both sides, every ranking runs on the rounded value
  * with a unique tiebreak, and DuckDB integer aggregates are cast
  * back to BIGINT in the oracle (sum on ints is HUGEINT there).
  *
  * Scale notes (100 TB): the spec formulations below use global
  * windows over ALREADY-AGGREGATED frames (distinct ranks, daily
  * series, per-group rows) — thousands of rows after the big keyed
  * shuffle, never the raw table. The one exception, Mann-Whitney's
  * global rank over raw measurements, degrades gracefully: at corpus
  * scale the identical U statistic comes from binned counts (the test
  * only needs rank sums, which a value-histogram join reproduces), so
  * the production path is a two-pass bin + prefix-sum, not a sort.
  */
object ExtensionQueries3 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-100 Mann-Whitney U rank-sum test ----------------------------------
  // Nonparametric "are click values drawn from the same distribution
  // as view values": average ranks (ties shared), tie-corrected
  // variance, normal approximation. The tie term sums (t^3 - t) via
  // its per-row identity sum(cnt^2 - 1) so one aggregate produces the
  // whole statistic — no second pass, no 1-row cross join.
  def extMannWhitney(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .filter(col("event_type").isin("click", "view"))
      .select(when(col("event_type") === "click", 1L).otherwise(0L).as("g1"),
        col("value").as("v"))
    val ranked = ev
      .withColumn("rnk", rank().over(Window.orderBy("v")))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("v")))
      .withColumn("ar", col("rnk") + (col("cnt") - 1) / lit(2.0))
    ranked
      .agg(sum(when(col("g1") === 1, col("ar"))).as("r1"),
        sum(col("g1")).as("n1"),
        count(lit(1)).as("ntot"),
        sum(col("cnt") * col("cnt") - 1).as("tie"))
      .select(col("n1"), (col("ntot") - col("n1")).as("n2"),
        round(col("r1") - col("n1") * (col("n1") + 1) / lit(2.0), 2).as("u1"),
        round(
          (col("r1") - col("n1") * (col("n1") + 1) / lit(2.0)
            - col("n1") * (col("ntot") - col("n1")) / lit(2.0))
            / sqrt(col("n1") * (col("ntot") - col("n1")) / lit(12.0)
              * (col("ntot") + 1
                - col("tie") / (col("ntot") * (col("ntot") - lit(1.0))))),
          4).as("z"))
  }

  // ---- E-101 Kaplan-Meier survival curve -----------------------------------
  // Time-to-first-shipment per order; open orders (status 'O') are
  // right-censored at their observed duration. Risk table built
  // WITHOUT a self-join: group to distinct durations, then n_at_risk
  // is total minus the exclusive prefix count and the product-limit
  // estimator is exp(prefix-sum of ln(1 - d/n)) — an ordered window
  // over ~5k distinct-duration rows, not the raw order table. A
  // d = n tail (survival exactly 0) is guarded by a prefix max flag
  // because Spark ln(0) is NULL while DuckDB's is -inf.
  def extKaplanMeier(s: SparkSession, dir: String): DataFrame = {
    val firstShip = t(s, dir, "lineitem")
      .groupBy("l_orderkey").agg(min("l_shipdate").as("ship0"))
    val dur = t(s, dir, "orders")
      .join(firstShip, col("o_orderkey") === col("l_orderkey"))
      .select(
        datediff(to_date(col("ship0")), to_date(col("o_orderdate")))
          .cast("long").as("tt"),
        when(col("o_orderstatus") =!= "O", 1L).otherwise(0L).as("ev"))
    val byT = dur.groupBy("tt")
      .agg(sum("ev").as("d"), count(lit(1)).as("m"))
    val wPrev = Window.orderBy("tt").rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy("tt").rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy()
    byT
      .withColumn("n_risk",
        sum("m").over(wAll) - coalesce(sum("m").over(wPrev), lit(0L)))
      .withColumn("f", lit(1.0) - col("d") / col("n_risk"))
      .withColumn("zero_seen",
        max(when(col("f") === 0, 1).otherwise(0)).over(wCum))
      .withColumn("surv",
        when(col("zero_seen") === 1, lit(0.0))
          .otherwise(exp(sum(when(col("f") > 0, log(col("f")))).over(wCum))))
      .filter(col("d") > 0)
      .select(col("tt"), col("n_risk"), col("d"), round(col("surv"), 4).as("surv"))
      .orderBy("tt")
      .limit(25)
  }

  // ---- E-102 autocorrelation function (lags 1..7) --------------------------
  // ACF of the daily-revenue series: one pass builds deviations from
  // the series mean, seven lag columns feed a single aggregate, and
  // stack() unpivots the seven ratios. The window frame is the
  // 2.4k-row daily series — the raw table never sees a global sort.
  def extAcf(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(to_date(date_trunc("day", col("o_orderdate"))).as("dy"))
      .agg(sum("o_totalprice").as("x"))
    val wAll = Window.partitionBy()
    val w = Window.orderBy("dy")
    val dev = daily
      .withColumn("dev", col("x") - avg("x").over(wAll))
    val withLags = (1 to 7).foldLeft(dev) { (df, k) =>
      df.withColumn(s"l$k", lag("dev", k).over(w))
    }
    val agg = withLags.agg(
      sum(col("dev") * col("dev")).as("s0"),
      sum(col("dev") * col("l1")).as("s1"),
      sum(col("dev") * col("l2")).as("s2"),
      sum(col("dev") * col("l3")).as("s3"),
      sum(col("dev") * col("l4")).as("s4"),
      sum(col("dev") * col("l5")).as("s5"),
      sum(col("dev") * col("l6")).as("s6"),
      sum(col("dev") * col("l7")).as("s7"))
    agg.selectExpr(
      """stack(7,
        |  1L, round(s1/s0, 4), 2L, round(s2/s0, 4), 3L, round(s3/s0, 4),
        |  4L, round(s4/s0, 4), 5L, round(s5/s0, 4), 6L, round(s6/s0, 4),
        |  7L, round(s7/s0, 4)) as (lag_k, acf)""".stripMargin)
      .orderBy("lag_k")
  }

  // ---- E-103 CUSUM changepoint scan ----------------------------------------
  // Where did the daily event volume shift? Cumulative sum of
  // deviations from the series mean; the top-|CUSUM| days locate the
  // change. Ranking runs on the ROUNDED statistic with the day as
  // tiebreak so ulp noise cannot reorder the cut.
  def extCusum(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(to_date(date_trunc("day", col("ts"))).as("dy"))
      .agg(count(lit(1)).as("n"))
    val wAll = Window.partitionBy()
    val w = Window.orderBy("dy")
    daily
      .withColumn("mu", avg(col("n").cast("double")).over(wAll))
      .withColumn("cusum", round(sum(col("n") - col("mu")).over(w), 4))
      .orderBy(abs(col("cusum")).desc, col("dy").asc)
      .limit(5)
      .select(col("dy"), col("n"), col("cusum"))
  }

  // ---- E-104 grouped jackknife standard error ------------------------------
  // Delete-one-nation jackknife for the mean customer balance: each
  // leave-one-out mean comes from the group sums (no re-scan), and the
  // jackknife SE over the G group estimates lands as a constant column
  // so the whole diagnostic is one relation. The windows run over the
  // 25-row per-nation frame.
  def extJackknife(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum("c_acctbal").as("sg"), count(lit(1)).as("ng"))
    val wAll = Window.partitionBy()
    per
      .withColumn("theta",
        (sum("sg").over(wAll) - col("sg")) / (sum("ng").over(wAll) - col("ng")))
      .withColumn("gcnt", count(lit(1)).over(wAll))
      .withColumn("tbar", avg("theta").over(wAll))
      .withColumn("jack_se",
        round(sqrt((col("gcnt") - lit(1.0)) / col("gcnt")
          * sum(pow(col("theta") - col("tbar"), 2)).over(wAll)), 4))
      .select(col("n_name"), col("ng").as("n_cust"),
        round(col("theta"), 4).as("loo_mean"), col("jack_se"))
      .orderBy("n_name")
  }

  // ---- E-105 per-document TF-IDF top terms ---------------------------------
  // "What is each document about": tf·idf with document frequency
  // computed over the FULL corpus, term rank per doc on the ROUNDED
  // score with token tiebreak. The doc-frequency table is token-sized
  // (shuffle on tok), the N-docs scalar rides a 1-row broadcast.
  def extTfidfTopk(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"),
        explode(filter(split(col("text"), " "), x => x =!= "")).as("tok"))
    val tc = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val dfTok = tc.groupBy("tok").agg(count(lit(1)).as("dfreq"))
    val nDocs = t(s, dir, "documents").agg(count(lit(1)).as("ndocs"))
    val sel = tc.filter(col("doc_id") < 30)
    val dlen = sel.groupBy("doc_id").agg(sum("c").as("dl"))
    sel.join(dlen, "doc_id")
      .join(dfTok, "tok")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("c") / col("dl") * log(col("ndocs") / col("dfreq")), 4))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("doc_id").orderBy(desc("score"), asc("tok"))))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("tok"), col("score"))
      .orderBy("doc_id", "rnk")
  }

  // ---- E-106 categorical mutual information --------------------------------
  // How much does order priority tell you about order status? MI and
  // normalized MI from the joint-count table: marginals are window
  // sums over the 15-cell frame, entropies come from the identity
  // Σ_cells p·ln(p_x) = Σ_x p_x·ln(p_x) — one aggregate, no joins.
  def extMutualInfo(s: SparkSession, dir: String): DataFrame = {
    val cells = t(s, dir, "orders")
      .groupBy("o_orderpriority", "o_orderstatus").agg(count(lit(1)).as("c"))
    val wAll = Window.partitionBy()
    val wx = Window.partitionBy("o_orderpriority")
    val wy = Window.partitionBy("o_orderstatus")
    cells
      .withColumn("p", col("c") / sum("c").over(wAll))
      .withColumn("px", sum("c").over(wx) / sum("c").over(wAll))
      .withColumn("py", sum("c").over(wy) / sum("c").over(wAll))
      .agg(count(lit(1)).as("n_cells"),
        sum(col("p") * log(col("p") / (col("px") * col("py")))).as("mi_raw"),
        (-sum(col("p") * log(col("px")))).as("hx"),
        (-sum(col("p") * log(col("py")))).as("hy"))
      .select(col("n_cells"), round(col("mi_raw"), 4).as("mi"),
        round(col("mi_raw") / sqrt(col("hx") * col("hy")), 4).as("nmi"))
  }

  // ---- E-107 join-key skew diagnostics -------------------------------------
  // The pre-flight check before any big keyed shuffle: per-key counts,
  // max/avg skew ratio, the exact p99 key count (rank cut, no
  // percentile dialect), and the top-5 heavy hitters with their share
  // of all rows. Constant stats ride along as columns so one relation
  // answers "do I need salting".
  def extSkewStats(s: SparkSession, dir: String): DataFrame = {
    val perKey = t(s, dir, "lineitem")
      .groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
    val wAll = Window.partitionBy()
    perKey
      .withColumn("nkeys", count(lit(1)).over(wAll))
      .withColumn("ntot", sum("cnt").over(wAll))
      .withColumn("avg_c", avg(col("cnt").cast("double")).over(wAll))
      .withColumn("max_c", max("cnt").over(wAll))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("cnt"), col("l_partkey"))))
      .withColumn("p99_c",
        min(when(col("rnk") >= ceil(col("nkeys") * 0.99), col("cnt"))).over(wAll))
      .orderBy(col("cnt").desc, col("l_partkey").asc)
      .limit(5)
      .select(col("l_partkey"), col("cnt"),
        round(col("cnt") / col("ntot"), 4).as("row_share"),
        col("nkeys"), round(col("max_c") / col("avg_c"), 4).as("skew_ratio"),
        col("p99_c"))
  }

  // ---- E-108 token burstiness (Fano factor) --------------------------------
  // Bursty tokens concentrate in few documents (variance-to-mean over
  // per-doc counts INCLUDING the zero docs — computed from sum and
  // sum-of-squares against the corpus doc count, so absent docs never
  // materialize). Fano ≈ 1 is Poisson background; >> 1 is topical.
  def extBurstiness(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"),
        explode(filter(split(col("text"), " "), x => x =!= "")).as("tok"))
    val perCell = toks.groupBy("tok", "doc_id").agg(count(lit(1)).as("c"))
    val perTok = perCell.groupBy("tok")
      .agg(sum("c").as("total"), count(lit(1)).as("docfreq"),
        sum(col("c") * col("c")).as("sq"))
    val nDocs = t(s, dir, "documents")
      .agg(count(lit(1)).cast("double").as("ndocs"))
    perTok.crossJoin(broadcast(nDocs))
      .withColumn("mean", col("total") / col("ndocs"))
      .withColumn("fano",
        round((col("sq") / col("ndocs") - col("mean") * col("mean"))
          / col("mean"), 4))
      .orderBy(desc("total"), asc("tok"))
      .limit(20)
      .select(col("tok"), col("total"), col("docfreq"), col("fano"))
  }

  // ---- E-109 weekly seasonal decomposition ---------------------------------
  // Day-of-week profile of daily order volume: seasonal component is
  // the dow mean minus the overall mean; the residual standard
  // deviation (what seasonality does NOT explain) comes from the
  // within-dow sum-of-squares identity Σ(n−m̄_d)² = Σn² − n_d·m̄_d², so
  // the day-level frame is aggregated once and every window runs over
  // 7 rows.
  def extSeasonal(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(to_date(date_trunc("day", col("o_orderdate"))).as("dy"))
      .agg(count(lit(1)).as("n"))
    val perDow = daily
      .withColumn("dow", dayofweek(col("dy")).cast("long"))
      .groupBy("dow")
      .agg(count(lit(1)).as("n_days"),
        avg(col("n").cast("double")).as("dmean"),
        sum(col("n") * col("n")).as("sq"))
    val wAll = Window.partitionBy()
    perDow
      .withColumn("mu",
        sum(col("dmean") * col("n_days")).over(wAll) / sum("n_days").over(wAll))
      .withColumn("ss", col("sq") - col("n_days") * col("dmean") * col("dmean"))
      .withColumn("resid_sd",
        round(sqrt(sum("ss").over(wAll) / sum("n_days").over(wAll)), 4))
      .select(col("dow"), col("n_days"),
        round(col("dmean") - col("mu"), 4).as("smean"), col("resid_sd"))
      .orderBy("dow")
  }

  // ---- X-5 Jaro-Winkler record linkage -------------------------------------
  // Fuzzy-match part names: blocked self-join (equi-join on the first
  // token — candidates never go all-pairs) + the native jaro_winkler
  // codegen expression, thresholded on the ROUNDED score. DuckDB ships
  // the same classic Winkler variant, so the oracle hash-compares the
  // kernel directly.
  def extJaro(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val names = t(s, dir, "part").select(col("p_name")).distinct()
      .withColumn("blk", split(col("p_name"), " ").getItem(0))
    val a = names.select(col("blk"), col("p_name").as("name_a"))
    val b = names.select(col("blk"), col("p_name").as("name_b"))
    a.join(b, "blk")
      .filter(col("name_a") < col("name_b"))
      .withColumn("jw",
        round(call_function("jaro_winkler", col("name_a"), col("name_b")), 4))
      .filter(col("jw") >= 0.8)
      .select("name_a", "name_b", "jw")
      .orderBy("name_a", "name_b")
  }

  // ---- E-110 incremental view maintenance ----------------------------------
  // Maintain V = γ_{cust, sum(revenue), count}(orders ⋈ lineitem)
  // under inserts on BOTH sides (the ≥1998 slices): three delta joins
  // + one mergeable fold (ops.Ivm) instead of a full recompute. The
  // oracle IS the full recompute — the gate proves the delta algebra
  // exactly reproduces it.
  def extIvm(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).as("oy"))
    // fixed-point cents: per-row rounding is engine-identical, long
    // sums are exactly associative, so incremental == recompute to the
    // bit (see the Ivm scaladoc on money-typed measures)
    val l = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long").as("rev"),
        year(col("l_shipdate")).as("ly"))
    val oldO = o.filter(col("oy") <= 1997).drop("oy")
    val dO = o.filter(col("oy") >= 1998).drop("oy")
    val oldL = l.filter(col("ly") <= 1997).drop("ly")
    val dL = l.filter(col("ly") >= 1998).drop("ly")
    val v0 = Ivm.initial(oldO, oldL, "o_orderkey", "o_custkey", "rev")
    val v1 = Ivm.merge(v0,
      Ivm.deltaGroups(oldO, dO, oldL, dL, "o_orderkey", "o_custkey", "rev"),
      "o_custkey")
    v1.filter(col("o_custkey") <= 100)
      .select(col("o_custkey"),
        round(col("v_sum") / lit(100.0), 2).as("revenue"),
        col("v_cnt").as("n_items"))
      .orderBy("o_custkey")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_jaro" -> (extJaro _),
    "ext_ivm" -> (extIvm _),
    "ext_mannwhitney" -> (extMannWhitney _),
    "ext_kaplanmeier" -> (extKaplanMeier _),
    "ext_acf" -> (extAcf _),
    "ext_cusum" -> (extCusum _),
    "ext_jackknife" -> (extJackknife _),
    "ext_tfidf_topk" -> (extTfidfTopk _),
    "ext_mutualinfo" -> (extMutualInfo _),
    "ext_skewstats" -> (extSkewStats _),
    "ext_burstiness" -> (extBurstiness _),
    "ext_seasonal" -> (extSeasonal _))

  val oracleSql: Map[String, String] = Map(
    // X-5: DuckDB's jaro_winkler_similarity is the same classic
    // variant (0.7 boost threshold, p=0.1, prefix ≤ 4); threshold on
    // the rounded score both sides.
    "ext_jaro" ->
      """with n as (select distinct p_name from part),
        |b as (select p_name, string_split(p_name, ' ')[1] blk from n)
        |select a.p_name name_a, c.p_name name_b,
        |  round(jaro_winkler_similarity(a.p_name, c.p_name), 4) jw
        |from b a join b c on a.blk = c.blk
        |where a.p_name < c.p_name
        |  and round(jaro_winkler_similarity(a.p_name, c.p_name), 4) >= 0.8
        |order by name_a, name_b""".stripMargin,
    // E-110: the oracle is the full recompute the incremental path
    // must reproduce.
    "ext_ivm" ->
      """select o_custkey,
        |  round(cast(sum(cast(round(l_extendedprice * (1.0 - l_discount) * 100, 0)
        |    as bigint)) as double) / 100.0, 2) revenue,
        |  count(*) n_items
        |from orders join lineitem on o_orderkey = l_orderkey
        |where o_custkey <= 100
        |group by o_custkey order by o_custkey""".stripMargin,
    // E-100: identical average-rank construction; count() filters keep
    // the group sizes BIGINT (DuckDB sum-on-int is HUGEINT).
    "ext_mannwhitney" ->
      """with ev as (
        |  select case when event_type = 'click' then 1 else 0 end g1, value v
        |  from events where event_type in ('click','view')),
        |ranked as (
        |  select g1,
        |    rank() over (order by v) + (count(*) over (partition by v) - 1) / 2.0 ar,
        |    count(*) over (partition by v) cnt
        |  from ev),
        |ag as (
        |  select sum(ar) filter (g1 = 1) r1,
        |    count(*) filter (g1 = 1) n1,
        |    count(*) ntot,
        |    cast(sum(cnt * cnt - 1) as double) tie
        |  from ranked)
        |select n1, ntot - n1 n2,
        |  round(r1 - n1 * (n1 + 1) / 2.0, 2) u1,
        |  round((r1 - n1 * (n1 + 1) / 2.0 - n1 * (ntot - n1) / 2.0)
        |    / sqrt(n1 * (ntot - n1) / 12.0
        |      * (ntot + 1 - tie / (ntot * (ntot - 1.0)))), 4) z
        |from ag""".stripMargin,
    // E-101: same exclusive-prefix risk table; ln(0) guarded by the
    // same prefix max flag (DuckDB ln(0) is -inf, Spark's is NULL —
    // the guard makes both emit exactly 0).
    "ext_kaplanmeier" ->
      """with dur as (
        |  select date_diff('day', cast(o_orderdate as date), cast(ship0 as date)) tt,
        |    case when o_orderstatus <> 'O' then 1 else 0 end ev
        |  from orders join (
        |    select l_orderkey, min(l_shipdate) ship0 from lineitem group by 1) fs
        |  on o_orderkey = fs.l_orderkey),
        |byt as (
        |  select tt, cast(sum(ev) as bigint) d, count(*) m from dur group by tt),
        |risk as (
        |  select tt, d, m,
        |    cast(sum(m) over () as bigint)
        |      - cast(coalesce(sum(m) over (order by tt
        |          rows between unbounded preceding and 1 preceding), 0) as bigint) n_risk
        |  from byt),
        |f as (
        |  select tt, d, n_risk, 1.0 - d / cast(n_risk as double) fac from risk),
        |s as (
        |  select tt, d, n_risk,
        |    max(case when fac = 0 then 1 else 0 end) over (order by tt
        |      rows between unbounded preceding and current row) zero_seen,
        |    sum(case when fac > 0 then ln(fac) end) over (order by tt
        |      rows between unbounded preceding and current row) lnsum
        |  from f)
        |select tt, n_risk, d,
        |  round(case when zero_seen = 1 then 0.0 else exp(lnsum) end, 4) surv
        |from s where d > 0 order by tt limit 25""".stripMargin,
    // E-102: seven lag windows over the daily series; union-all
    // unpivot mirrors stack().
    "ext_acf" ->
      """with daily as (
        |  select cast(date_trunc('day', o_orderdate) as date) dy,
        |    sum(o_totalprice) x
        |  from orders group by 1),
        |dv as (select dy, x - avg(x) over () dev from daily),
        |lg as (
        |  select dev,
        |    lag(dev, 1) over (order by dy) l1, lag(dev, 2) over (order by dy) l2,
        |    lag(dev, 3) over (order by dy) l3, lag(dev, 4) over (order by dy) l4,
        |    lag(dev, 5) over (order by dy) l5, lag(dev, 6) over (order by dy) l6,
        |    lag(dev, 7) over (order by dy) l7
        |  from dv),
        |ag as (
        |  select sum(dev * dev) s0,
        |    sum(dev * l1) s1, sum(dev * l2) s2, sum(dev * l3) s3, sum(dev * l4) s4,
        |    sum(dev * l5) s5, sum(dev * l6) s6, sum(dev * l7) s7
        |  from lg)
        |select * from (
        |  select cast(1 as bigint) lag_k, round(s1/s0, 4) acf from ag
        |  union all select 2, round(s2/s0, 4) from ag
        |  union all select 3, round(s3/s0, 4) from ag
        |  union all select 4, round(s4/s0, 4) from ag
        |  union all select 5, round(s5/s0, 4) from ag
        |  union all select 6, round(s6/s0, 4) from ag
        |  union all select 7, round(s7/s0, 4) from ag)
        |order by lag_k""".stripMargin,
    // E-103: rank on the ROUNDED cusum with day tiebreak, same as the
    // engine side.
    "ext_cusum" ->
      """with daily as (
        |  select cast(date_trunc('day', ts) as date) dy, count(*) n
        |  from events group by 1),
        |cs as (
        |  select dy, n,
        |    round(sum(n - mu) over (order by dy
        |      rows between unbounded preceding and current row), 4) cusum
        |  from (select dy, n, avg(cast(n as double)) over () mu from daily))
        |select dy, n, cusum from cs
        |order by abs(cusum) desc, dy limit 5""".stripMargin,
    // E-105: df over the full corpus, tf over the selected docs, rank
    // on the rounded score with token tiebreak.
    "ext_tfidf_topk" ->
      """with toks as (
        |  select doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) tok
        |  from documents),
        |tc as (select doc_id, tok, count(*) c from toks group by 1, 2),
        |dft as (select tok, count(*) dfreq from tc group by 1),
        |nd as (select count(*) ndocs from documents),
        |sel as (select * from tc where doc_id < 30),
        |dl as (select doc_id, cast(sum(c) as bigint) dl from sel group by 1),
        |scored as (
        |  select sel.doc_id, sel.tok,
        |    round(sel.c / cast(dl.dl as double)
        |      * ln(nd.ndocs / cast(dft.dfreq as double)), 4) score
        |  from sel join dl using (doc_id) join dft using (tok), nd),
        |rk as (
        |  select doc_id, tok, score,
        |    row_number() over (partition by doc_id order by score desc, tok) rnk
        |  from scored)
        |select doc_id, cast(rnk as bigint) rnk, tok, score from rk
        |where rnk <= 3 order by doc_id, rnk""".stripMargin,
    // E-106: marginals as window sums over the joint cells; entropies
    // via Σ_cells p·ln(p_x).
    "ext_mutualinfo" ->
      """with cells as (
        |  select o_orderpriority, o_orderstatus, count(*) c
        |  from orders group by 1, 2),
        |pr as (
        |  select c / cast(sum(c) over () as double) p,
        |    sum(c) over (partition by o_orderpriority)
        |      / cast(sum(c) over () as double) px,
        |    sum(c) over (partition by o_orderstatus)
        |      / cast(sum(c) over () as double) py
        |  from cells),
        |ag as (
        |  select count(*) n_cells,
        |    sum(p * ln(p / (px * py))) mi_raw,
        |    -sum(p * ln(px)) hx, -sum(p * ln(py)) hy
        |  from pr)
        |select n_cells, round(mi_raw, 4) mi,
        |  round(mi_raw / sqrt(hx * hy), 4) nmi from ag""".stripMargin,
    // E-107: exact p99 via the rank cut; stats ride as constant
    // columns on the top-5 heavy hitters.
    "ext_skewstats" ->
      """with pk as (select l_partkey, count(*) cnt from lineitem group by 1),
        |st as (
        |  select l_partkey, cnt,
        |    count(*) over () nkeys,
        |    cast(sum(cnt) over () as bigint) ntot,
        |    avg(cast(cnt as double)) over () avg_c,
        |    max(cnt) over () max_c,
        |    row_number() over (order by cnt, l_partkey) rnk
        |  from pk),
        |st2 as (
        |  select *, min(case when rnk >= ceil(nkeys * 0.99) then cnt end) over () p99_c
        |  from st)
        |select l_partkey, cnt, round(cnt / cast(ntot as double), 4) row_share,
        |  nkeys, round(max_c / avg_c, 4) skew_ratio, p99_c
        |from st2 order by cnt desc, l_partkey limit 5""".stripMargin,
    // E-108: Fano from sum/sum-of-squares against the corpus doc
    // count — zero docs contribute without materializing.
    "ext_burstiness" ->
      """with toks as (
        |  select doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) tok
        |  from documents),
        |cell as (select tok, doc_id, count(*) c from toks group by 1, 2),
        |pt as (
        |  select tok, cast(sum(c) as bigint) total, count(*) docfreq,
        |    cast(sum(c * c) as double) sq
        |  from cell group by 1),
        |nd as (select cast(count(*) as double) ndocs from documents)
        |select tok, total, docfreq,
        |  round((sq / ndocs - (total / ndocs) * (total / ndocs))
        |    / (total / ndocs), 4) fano
        |from pt, nd order by total desc, tok limit 20""".stripMargin,
    // E-109: dow numbering pinned cross-engine (DuckDB dow 0=Sunday,
    // Spark dayofweek 1=Sunday); residual SS via the within-group
    // identity.
    "ext_seasonal" ->
      """with daily as (
        |  select cast(date_trunc('day', o_orderdate) as date) dy, count(*) n
        |  from orders group by 1),
        |pd as (
        |  select cast(dayofweek(dy) + 1 as bigint) dow, count(*) n_days,
        |    avg(cast(n as double)) dmean, cast(sum(n * n) as double) sq
        |  from daily group by 1),
        |w1 as (
        |  select dow, n_days, dmean, sq,
        |    sum(dmean * n_days) over () / cast(sum(n_days) over () as double) mu,
        |    sq - n_days * dmean * dmean ss
        |  from pd)
        |select dow, n_days, round(dmean - mu, 4) smean,
        |  round(sqrt(sum(ss) over () / cast(sum(n_days) over () as double)), 4) resid_sd
        |from w1 order by dow""".stripMargin,
    // E-104: group sums once, leave-one-out algebra in the window.
    "ext_jackknife" ->
      """with per as (
        |  select n_name, sum(c_acctbal) sg, count(*) ng
        |  from customer join nation on c_nationkey = n_nationkey
        |  group by 1),
        |w1 as (
        |  select n_name, ng,
        |    (sum(sg) over () - sg) / cast(sum(ng) over () - ng as double) theta,
        |    count(*) over () g
        |  from per),
        |w2 as (select n_name, ng, theta, g, avg(theta) over () tbar from w1)
        |select n_name, ng n_cust, round(theta, 4) loo_mean,
        |  round(sqrt((g - 1.0) / g
        |    * sum((theta - tbar) * (theta - tbar)) over ()), 4) jack_se
        |from w2 order by n_name""".stripMargin)
}
