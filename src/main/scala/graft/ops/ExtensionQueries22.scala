package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 22: product analytics and series
  * structure — growth accounting, Lorenz curve, SSE-optimal single
  * changepoint, top user journeys, and the delta-method ratio CI.
  */
object ExtensionQueries22 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-204 growth accounting ---------------------------------------------------
  // The Social-Capital weekly decomposition: every active (user, week)
  // is NEW (first week of life), RETAINED (active the week before) or
  // RESURRECTED (returning after a gap); churn INTO a week = active the
  // week before, absent now (one anti join of the shifted presence
  // table). All flags derive from the distinct (user, week) presence
  // table — |users|·|weeks| bounded — with one equi self-join on
  // (user, week−7) and one min-per-user aggregate. Quick ratio =
  // (new + resurrected) ∕ churned.
  def extGrowthacct(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "events")
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("w"))
      .distinct()
    val first = p.groupBy("user_id").agg(min("w").as("fw"))
    val prev = p.select(col("user_id"), date_add(col("w"), 7).as("w"),
      lit(1).as("was_prev"))
    val flags = p.join(first, "user_id")
      .join(prev, Seq("user_id", "w"), "left")
      .select(col("w"),
        when(col("w") === col("fw"), 1L).otherwise(0L).as("is_new"),
        when(col("w") =!= col("fw") && col("was_prev").isNotNull, 1L)
          .otherwise(0L).as("is_ret"),
        when(col("w") =!= col("fw") && col("was_prev").isNull, 1L)
          .otherwise(0L).as("is_res"))
      .groupBy("w")
      .agg(count(lit(1)).as("n_active"), sum("is_new").as("n_new"),
        sum("is_ret").as("n_retained"), sum("is_res").as("n_resurrected"))
    val churn = prev.select("user_id", "w")
      .join(p, Seq("user_id", "w"), "left_anti")
      .groupBy("w").agg(count(lit(1)).as("n_churned"))
    flags.join(churn, Seq("w"), "left")
      .withColumn("n_churned", coalesce(col("n_churned"), lit(0L)))
      .select(col("w"), col("n_active"), col("n_new"), col("n_retained"),
        col("n_resurrected"), col("n_churned"),
        round((col("n_new") + col("n_resurrected")).cast("double") /
          expr("nullif(n_churned, 0)"), 4).as("quick_ratio"))
      .orderBy("w")
  }

  // ---- E-205 Lorenz curve --------------------------------------------------------
  // Decile-by-decile revenue concentration: every customer (including
  // the orderless, at 0) ranked by exact cents under a total order,
  // cut into ntile(10), cumulative shares from integer cumsums — the
  // curve whose area ext_gini folds into one number. The whole-table
  // window runs over the 10-row decile aggregate only.
  def extLorenz(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "orders")
      .groupBy(col("o_custkey").as("ck"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c0"))
    val per = t(s, dir, "customer")
      .join(rev, col("c_custkey") === col("ck"), "left")
      .select(col("c_custkey"), coalesce(col("c0"), lit(0L)).as("cents"))
      .withColumn("decile",
        ntile(10).over(Window.orderBy(col("cents"), col("c_custkey"))))
    val dec = per.groupBy("decile")
      .agg(count(lit(1)).as("n_cust"), sum("cents").as("rev_cents"))
    val wAll = Window.partitionBy()
    val wCum = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, 0)
    dec
      .withColumn("total", sum("rev_cents").over(wAll))
      .withColumn("cum", sum("rev_cents").over(wCum))
      .select(col("decile").cast("long").as("decile"), col("n_cust"),
        col("rev_cents"),
        round(col("rev_cents").cast("double") / col("total"), 6)
          .as("rev_share"),
        round(col("cum").cast("double") / col("total"), 6)
          .as("cum_rev_share"))
      .orderBy("decile")
  }

  // ---- E-206 SSE-optimal single changepoint --------------------------------------
  // Binary-segmentation step 1 on daily purchase revenue: the split
  // minimizing SSE_left + SSE_right, each from PREFIX SUMS of exact
  // decimal cents (Σx, Σx² windows) — O(n) candidates, no per-split
  // rescan. Both engines cast the same exact integers to double and
  // evaluate the same expression, so the argmin is deterministic;
  // ties break to the earliest day. Variance explained = 1 −
  // SSE_best∕SSE_total. The level-shift finder beside ext_cusum's
  // drift alarm.
  def extBinseg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    val pre = t(s, dir, "events").filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      .select(col("d"), col("cents").cast("decimal(38,0)").as("c"))
      .withColumn("k", count(lit(1)).over(w))
      .withColumn("s1", sum("c").over(w))
      .withColumn("s2", sum(expr("c * c")).over(w))
    val tot = pre.agg(max("k").as("n"), max("s1").as("t1"), max("s2").as("t2"))
    val cand = pre.crossJoin(tot)
      .filter(col("k") < col("n"))
      .withColumn("sse",
        (col("s2").cast("double") -
          col("s1").cast("double") * col("s1").cast("double") / col("k")) +
        ((col("t2") - col("s2")).cast("double") -
          (col("t1") - col("s1")).cast("double") *
            (col("t1") - col("s1")).cast("double") / (col("n") - col("k"))))
      .withColumn("sse_total",
        col("t2").cast("double") -
          col("t1").cast("double") * col("t1").cast("double") / col("n"))
    cand.orderBy(col("sse"), col("d")).limit(1)
      .select(col("d").as("last_day_left"), col("k").as("n_left"),
        (col("n") - col("k")).as("n_right"),
        round(col("sse"), 4).as("sse_best"),
        round(lit(1.0) - col("sse") / col("sse_total"), 6).as("var_explained"))
  }

  // ---- E-207 top user journeys ---------------------------------------------------
  // The most common three-step event sequences (per-user order by ts):
  // two lags over the per-user window, one grouped count, top-15 under
  // a total order — the n=3 extension of ext_markov's transition view.
  def extJourneys(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    t(s, dir, "events")
      .select(col("user_id"), col("event_type").as("t3"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("t2", lag("t3", 1).over(w))
      .withColumn("t1", lag("t3", 2).over(w))
      .filter(col("t1").isNotNull)
      .groupBy("t1", "t2", "t3")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
      .limit(15)
  }

  // ---- E-208 delta-method ratio CI -----------------------------------------------
  // 95% CI for the ratio metric purchases-per-event: R = Σx∕Σy over
  // per-user (x, y), SE via the delta method with population moments —
  // every moment from exact decimal sums (the E-195 discipline), the
  // closed form written identically on both engines. The
  // experimentation companion that turns ext_cuped's point estimates
  // into intervals.
  def extDeltaci(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "events")
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .cast("decimal(38,0)").as("x"),
        count(lit(1)).cast("decimal(38,0)").as("y"))
    val m = per.agg(count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    m.select(col("n"), col("sx").cast("long").as("n_purch"),
        col("sy").cast("long").as("n_events"),
        (col("sx").cast("double") / col("sy").cast("double")).as("r"),
        (col("sx").cast("double") / col("n")).as("xb"),
        (col("sy").cast("double") / col("n")).as("yb"),
        (col("sxx").cast("double") / col("n")).as("mxx"),
        (col("syy").cast("double") / col("n")).as("myy"),
        (col("sxy").cast("double") / col("n")).as("mxy"))
      .withColumn("se",
        sqrt(((col("mxx") - col("xb") * col("xb")) -
          lit(2.0) * col("r") * (col("mxy") - col("xb") * col("yb")) +
          col("r") * col("r") * (col("myy") - col("yb") * col("yb"))) /
          col("n")) / col("yb"))
      .select(col("n").as("n_users"), col("n_purch"), col("n_events"),
        round(col("r"), 6).as("ratio"),
        round(col("se"), 6).as("se"),
        round(col("r") - lit(1.96) * col("se"), 6).as("ci_lo"),
        round(col("r") + lit(1.96) * col("se"), 6).as("ci_hi"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_growthacct" -> (extGrowthacct _),
    "ext_lorenz" -> (extLorenz _),
    "ext_binseg" -> (extBinseg _),
    "ext_journeys" -> (extJourneys _),
    "ext_deltaci" -> (extDeltaci _))

  val oracleSql: Map[String, String] = Map(
    "ext_growthacct" ->
      """with p as (select distinct user_id,
        |    cast(date_trunc('week', ts) as date) w from events),
        |f as (select user_id, min(w) fw from p group by 1),
        |prev as (select user_id, w + 7 w from p),
        |flags as (select p.w, count(*) n_active,
        |    cast(sum(case when p.w = fw then 1 else 0 end) as bigint) n_new,
        |    cast(sum(case when p.w <> fw and pv.user_id is not null
        |      then 1 else 0 end) as bigint) n_retained,
        |    cast(sum(case when p.w <> fw and pv.user_id is null
        |      then 1 else 0 end) as bigint) n_resurrected
        |  from p join f using (user_id)
        |  left join prev pv on p.user_id = pv.user_id and p.w = pv.w
        |  group by p.w),
        |churn as (select prev.w, cast(count(*) as bigint) n_churned
        |  from prev anti join p using (user_id, w) group by 1)
        |select flags.w, n_active, n_new, n_retained, n_resurrected,
        |  coalesce(n_churned, 0) n_churned,
        |  round(cast(n_new + n_resurrected as double)
        |    / nullif(coalesce(n_churned, 0), 0), 4) quick_ratio
        |from flags left join churn on flags.w = churn.w
        |order by flags.w""".stripMargin,

    "ext_lorenz" ->
      """with rev as (select o_custkey ck,
        |    cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint) c0
        |  from orders group by 1),
        |per as (select c_custkey, coalesce(c0, 0) cents,
        |    ntile(10) over (order by coalesce(c0, 0), c_custkey) decile
        |  from customer left join rev on c_custkey = ck),
        |dec as (select decile, cast(count(*) as bigint) n_cust,
        |    cast(sum(cents) as bigint) rev_cents from per group by 1)
        |select cast(decile as bigint) decile, n_cust, rev_cents,
        |  round(cast(rev_cents as double) / sum(rev_cents) over (), 6)
        |    rev_share,
        |  round(cast(sum(rev_cents) over (order by decile
        |      rows between unbounded preceding and current row) as double)
        |    / sum(rev_cents) over (), 6) cum_rev_share
        |from dec order by decile""".stripMargin,

    "ext_binseg" ->
      """with daily as (select cast(ts as date) d,
        |    cast(sum(cast(round(value * 100) as bigint)) as bigint) cents
        |  from events where event_type = 'purchase' group by 1),
        |pre as (select d,
        |    count(*) over w k,
        |    sum(cast(cents as hugeint)) over w s1,
        |    sum(cast(cents as hugeint) * cents) over w s2
        |  from daily window w as (order by d
        |    rows between unbounded preceding and current row)),
        |tot as (select max(k) n, max(s1) t1, max(s2) t2 from pre),
        |cand as (select d, k, n,
        |    (cast(s2 as double) - cast(s1 as double) * cast(s1 as double) / k)
        |      + (cast(t2 - s2 as double)
        |        - cast(t1 - s1 as double) * cast(t1 - s1 as double) / (n - k))
        |      sse,
        |    cast(t2 as double) - cast(t1 as double) * cast(t1 as double) / n
        |      sse_total
        |  from pre cross join tot where k < n)
        |select d last_day_left, k n_left, n - k n_right,
        |  round(sse, 4) sse_best,
        |  round(1.0 - sse / sse_total, 6) var_explained
        |from cand order by sse, d limit 1""".stripMargin,

    "ext_journeys" ->
      """with s as (select
        |    lag(event_type, 2) over w t1,
        |    lag(event_type, 1) over w t2,
        |    event_type t3
        |  from events
        |  window w as (partition by user_id order by epoch_us(ts), event_id))
        |select t1, t2, t3, cast(count(*) as bigint) n
        |from s where t1 is not null
        |group by 1, 2, 3
        |order by n desc, t1, t2, t3 limit 15""".stripMargin,

    "ext_deltaci" ->
      """with per as (select user_id,
        |    cast(cast(sum(case when event_type = 'purchase' then 1 else 0 end)
        |      as bigint) as hugeint) x,
        |    cast(cast(count(*) as bigint) as hugeint) y
        |  from events group by 1),
        |m as (select cast(count(*) as bigint) n, sum(x) sx, sum(y) sy,
        |    sum(x * x) sxx, sum(y * y) syy, sum(x * y) sxy from per),
        |e as (select n, cast(sx as bigint) n_purch, cast(sy as bigint) n_events,
        |    cast(sx as double) / cast(sy as double) r,
        |    cast(sx as double) / n xb, cast(sy as double) / n yb,
        |    cast(sxx as double) / n mxx, cast(syy as double) / n myy,
        |    cast(sxy as double) / n mxy from m),
        |se as (select n, n_purch, n_events, r,
        |    sqrt(((mxx - xb * xb) - 2.0 * r * (mxy - xb * yb)
        |      + r * r * (myy - yb * yb)) / n) / yb se from e)
        |select n n_users, n_purch, n_events, round(r, 6) ratio,
        |  round(se, 6) se, round(r - 1.96 * se, 6) ci_lo,
        |  round(r + 1.96 * se, 6) ci_hi
        |from se""".stripMargin)
}
