package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 67: relationship and randomness
  * diagnostics — Engle-Granger two-step cointegration of the daily
  * revenue/quantity series, the Friedman rank test over three per-doc
  * quality metrics, and the Poisson overdispersion index of per-user
  * daily activity.
  */
object ExtensionQueries67 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-349 Engle-Granger cointegration -----------------------------------------
  // Do daily revenue and daily quantity share a common trend? Step 1:
  // OLS revenue ~ quantity from exact integer moments. Step 2: the
  // AR(1) coefficient of the RESIDUAL series (quantized to 1e-4 cents
  // before the lag products) — φ far below 1 means the spread reverts,
  // i.e. the pair is cointegrated; φ ≈ 1 means the residual itself
  // random-walks. The pairs-trading / common-trend screen beside
  // ext_dw's autocorrelation and ext_granger's lead-lag.
  def extCointegration(s: SparkSession, dir: String): DataFrame = {
    val day = t(s, dir, "orders").join(
        t(s, dir, "lineitem").groupBy(col("l_orderkey").as("ok"))
          .agg(sum(col("l_quantity").cast("long")).as("q")),
        col("o_orderkey") === col("ok"))
      .groupBy(to_date(col("o_orderdate")).as("dy"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"),
        sum("q").as("x"))
      .select(col("dy"), col("x").cast("decimal(38,0)").as("x"),
        col("y").cast("decimal(38,0)").as("y"))
    val mom = day.agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum("y").as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("beta"),
        (col("sy").cast("double") / col("n")).as("ybar"),
        (col("sx").cast("double") / col("n")).as("xbar"))
    val resid = day.crossJoin(broadcast(mom.limit(1)))
      .select(col("dy"), col("n"), col("beta"),
        round((col("y").cast("double") - col("ybar") -
          col("beta") * (col("x").cast("double") - col("xbar"))) * 10000)
          .cast("long").as("e"))
    val w = Window.orderBy("dy")
    val lagged = resid
      .withColumn("el", lag("e", 1).over(w))
      .filter(col("el").isNotNull)
      .select(col("n"), col("beta"),
        col("e").cast("decimal(38,0)").as("e"),
        col("el").cast("decimal(38,0)").as("el"))
    lagged.groupBy("n")
      .agg(max("beta").as("beta_raw"),
        sum(col("el") * col("e")).as("see"),
        sum(col("el") * col("el")).as("sll"))
      .select(col("n"), round(col("beta_raw"), 6).as("beta"),
        round(col("see").cast("double") / col("sll").cast("double"), 6)
          .as("resid_ar1"),
        (col("see").cast("double") / col("sll").cast("double") < 0.9)
          .as("cointegrated_at_0_9"))
  }

  // ---- E-350 Friedman rank test --------------------------------------------------
  // Do the three per-doc quality ratios (stopword, distinct-token,
  // alphanumeric share) systematically order the same way across docs?
  // Each doc is a block; the three metrics are ranked 1..3 within it
  // (ties broken by the FIXED metric order stop < distinct < alnum —
  // deterministic on both engines, documented deviation from
  // average-rank ties); χ²_F = 12n/(k(k+1))·Σ(R_j − n(k+1)/2)²/n with
  // k = 3. Rank sums are exact integers; one settled fold. The
  // repeated-measures companion to Cochran's Q (E-273).
  def extFriedman(s: SparkSession, dir: String): DataFrame = {
    val toksAll = filter(split(col("text"), " "), x => x =!= "")
    val stops = array(Seq("the", "a", "of", "and", "to", "in", "is",
      "on", "for", "with").map(lit): _*)
    val m = t(s, dir, "documents")
      .select(col("doc_id"),
        size(toksAll).cast("double").as("nt"),
        size(filter(toksAll, x => array_contains(stops, x)))
          .cast("double").as("nstop"),
        size(array_distinct(toksAll)).cast("double").as("nd"),
        length(regexp_replace(col("text"), "[^a-z0-9]", ""))
          .cast("double").as("nalnum"),
        length(col("text")).cast("double").as("nc"))
      .filter(col("nt") > 0 && col("nc") > 0)
      .select(col("doc_id"),
        (col("nstop") / col("nt")).as("m1"),
        (col("nd") / col("nt")).as("m2"),
        (col("nalnum") / col("nc")).as("m3"))
    val ranked = m.select(col("doc_id"),
        explode(array(
          struct(col("m1").as("v"), lit(1).as("j")),
          struct(col("m2").as("v"), lit(2).as("j")),
          struct(col("m3").as("v"), lit(3).as("j")))).as("e"))
      .select(col("doc_id"), col("e.v").as("v"), col("e.j").as("j"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy("v", "j")).cast("long"))
    ranked.groupBy("j")
      .agg(count(lit(1)).as("n"), sum("rk").as("rj"))
      .groupBy()
      .agg(max("n").as("n"),
        sum(when(col("j") === 1, col("rj"))).as("r1"),
        sum(when(col("j") === 2, col("rj"))).as("r2"),
        sum(when(col("j") === 3, col("rj"))).as("r3"))
      .select(col("n"), col("r1"), col("r2"), col("r3"),
        round((lit(12.0) / (col("n") * 3 * 4)) *
          ((col("r1") - col("n") * 2) * (col("r1") - col("n") * 2) +
           (col("r2") - col("n") * 2) * (col("r2") - col("n") * 2) +
           (col("r3") - col("n") * 2) * (col("r3") - col("n") * 2)), 4)
          .as("friedman_chi2"))
      .withColumn("significant_5pct", col("friedman_chi2") > 5.991)
  }

  // ---- E-351 Poisson overdispersion ----------------------------------------------
  // Is per-user daily activity Poisson, or bursty beyond it? The
  // dispersion index D = s²/x̄ over observed (user, day) event counts
  // and the χ² form (n−1)·D — D ≈ 1 is Poisson, D >> 1 means
  // clumping that a Poisson capacity model would underestimate.
  // Count moments are exact integers (cross-multiplied variance); the
  // per-entity companion to ext_burstiness's per-token Fano factor.
  def extOverdispersion(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "events")
      .groupBy(col("user_id"), dayofmonth(col("ts")).as("dy"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("c"))
    c.agg(count(lit(1)).as("n"), sum("c").as("sc"),
        sum(col("c") * col("c")).as("scc"))
      .select(col("n"),
        round(col("sc").cast("double") / col("n"), 4).as("mean_count"),
        round((col("n") * col("scc") - col("sc") * col("sc"))
          .cast("double") / col("n") / (col("n") - 1) /
          (col("sc").cast("double") / col("n")), 6)
          .as("dispersion_index"))
      .withColumn("overdispersed", col("dispersion_index") > 1.5)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_cointegration" -> (extCointegration _),
    "ext_friedman" -> (extFriedman _),
    "ext_overdispersion" -> (extOverdispersion _))

  val oracleSql: Map[String, String] = Map(
    // E-349: identical OLS moments, residual quantization, AR(1) form.
    "ext_cointegration" ->
      """with day as (select cast(o_orderdate as date) dy,
        |    cast(sum(cast(round(o_totalprice * 100) as bigint))
        |      as hugeint) y,
        |    cast(sum(q) as hugeint) x
        |  from orders join (select l_orderkey ok,
        |      cast(sum(cast(l_quantity as bigint)) as bigint) q
        |    from lineitem group by 1) li on o_orderkey = ok
        |  group by 1),
        |mom as (select cast(count(*) as hugeint) n, sum(x) sx, sum(y) sy,
        |    sum(x * y) sxy, sum(x * x) sxx
        |  from day),
        |fit as (select n,
        |    cast(n * sxy - sx * sy as double) /
        |      cast(n * sxx - sx * sx as double) beta,
        |    cast(sy as double) / cast(n as double) ybar,
        |    cast(sx as double) / cast(n as double) xbar
        |  from mom),
        |resid as (select dy, n, beta,
        |    cast(round((cast(y as double) - ybar -
        |      beta * (cast(x as double) - xbar)) * 10000) as bigint) e
        |  from day cross join fit),
        |lagged as (select n, beta, cast(e as hugeint) e,
        |    cast(lag(e) over (order by dy) as hugeint) el
        |  from resid)
        |select cast(n as bigint) n, round(max(beta), 6) beta,
        |  round(cast(sum(el * e) as double) /
        |    cast(sum(el * el) as double), 6) resid_ar1,
        |  cast(sum(el * e) as double) / cast(sum(el * el) as double) < 0.9
        |    cointegrated_at_0_9
        |from lagged where el is not null group by n""".stripMargin,

    // E-350: identical metrics, fixed tie order, integer rank sums.
    "ext_friedman" ->
      """with m0 as (select doc_id,
        |    cast(len(list_filter(string_split(text, ' '), w -> w <> ''))
        |      as double) nt,
        |    cast(len(list_filter(string_split(text, ' '),
        |      w -> w in ('the','a','of','and','to','in','is','on','for',
        |        'with'))) as double) nstop,
        |    cast(len(list_distinct(list_filter(string_split(text, ' '),
        |      w -> w <> ''))) as double) nd,
        |    cast(length(regexp_replace(text, '[^a-z0-9]', '', 'g'))
        |      as double) nalnum,
        |    cast(length(text) as double) nc
        |  from documents),
        |m as (select doc_id, nstop / nt m1, nd / nt m2, nalnum / nc m3
        |  from m0 where nt > 0 and nc > 0),
        |lng as (select doc_id, m1 v, 1 j from m
        |  union all select doc_id, m2, 2 from m
        |  union all select doc_id, m3, 3 from m),
        |rk as (select doc_id, j,
        |    cast(row_number() over (partition by doc_id order by v, j)
        |      as bigint) rk
        |  from lng),
        |rs as (select j, cast(count(*) as bigint) n,
        |    cast(sum(rk) as bigint) rj
        |  from rk group by j),
        |wide as (select max(n) n,
        |    sum(case when j = 1 then rj end) r1,
        |    sum(case when j = 2 then rj end) r2,
        |    sum(case when j = 3 then rj end) r3
        |  from rs)
        |select cast(n as bigint) n, cast(r1 as bigint) r1,
        |  cast(r2 as bigint) r2, cast(r3 as bigint) r3,
        |  round((12.0 / (n * 3 * 4)) *
        |    ((r1 - n * 2) * (r1 - n * 2) + (r2 - n * 2) * (r2 - n * 2) +
        |     (r3 - n * 2) * (r3 - n * 2)), 4) friedman_chi2,
        |  round((12.0 / (n * 3 * 4)) *
        |    ((r1 - n * 2) * (r1 - n * 2) + (r2 - n * 2) * (r2 - n * 2) +
        |     (r3 - n * 2) * (r3 - n * 2)), 4) > 5.991 significant_5pct
        |from wide""".stripMargin,

    // E-351: identical cross-multiplied dispersion index.
    "ext_overdispersion" ->
      """with c as (select user_id, date_part('day', ts) dy,
        |    cast(count(*) as hugeint) c
        |  from events group by 1, 2),
        |m as (select cast(count(*) as bigint) n, sum(c) sc,
        |    sum(c * c) scc from c)
        |select n, round(cast(sc as double) / n, 4) mean_count,
        |  round(cast(n * scc - sc * sc as double) / n / (n - 1) /
        |    (cast(sc as double) / n), 6) dispersion_index,
        |  round(cast(n * scc - sc * sc as double) / n / (n - 1) /
        |    (cast(sc as double) / n), 6) > 1.5 overdispersed
        |from m""".stripMargin)
}
