package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 81: distributional causal and
  * directional-dependence probes — quantile treatment effects over the
  * experiment split, binary transfer entropy between the revenue and
  * activity series, and the Lo-MacKinlay variance-ratio test.
  */
object ExtensionQueries81 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def h60(c: org.apache.spark.sql.Column) =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  // ---- E-391 quantile treatment effects ------------------------------------------
  // Averages hide WHERE an effect lives; QTE(τ) = q_B(τ) − q_A(τ) over
  // per-user purchase revenue at τ ∈ {.1,.25,.5,.75,.9} under the
  // E-212 portable-hash split (A/A ⇒ honest QTEs near zero). Exact
  // interpolated percentiles per arm (percentile ≡ quantile_cont on
  // integer cents), one row per τ.
  def extQte(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "events")
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase",
        round(col("value") * 100).cast("long")).otherwise(0L)).as("x"))
      .select(pmod(h60(col("user_id").cast("string")), lit(2L)).as("arm"),
        col("x"))
    val qs = per.groupBy("arm").agg(
      expr("percentile(x, 0.1)").as("q10"),
      expr("percentile(x, 0.25)").as("q25"),
      expr("percentile(x, 0.5)").as("q50"),
      expr("percentile(x, 0.75)").as("q75"),
      expr("percentile(x, 0.9)").as("q90"))
    val wide = qs.agg(
      max(when(col("arm") === 0, col("q10"))).as("a10"),
      max(when(col("arm") === 0, col("q25"))).as("a25"),
      max(when(col("arm") === 0, col("q50"))).as("a50"),
      max(when(col("arm") === 0, col("q75"))).as("a75"),
      max(when(col("arm") === 0, col("q90"))).as("a90"),
      max(when(col("arm") === 1, col("q10"))).as("b10"),
      max(when(col("arm") === 1, col("q25"))).as("b25"),
      max(when(col("arm") === 1, col("q50"))).as("b50"),
      max(when(col("arm") === 1, col("q75"))).as("b75"),
      max(when(col("arm") === 1, col("q90"))).as("b90"))
    // interpolated quantiles at these τ are exact multiples of 1/20
    // cent: ×20 recovers the exact integer, (m+10) DIV 20 is half-up
    // to whole cents — no display rounding can straddle an ULP
    wide.selectExpr(
      """stack(5,
        |  0.10D, a10, b10,
        |  0.25D, a25, b25,
        |  0.50D, a50, b50,
        |  0.75D, a75, b75,
        |  0.90D, a90, b90) as (tau, qa, qb)""".stripMargin)
      .withColumn("ca",
        expr("(CAST(round(qa * 20) AS BIGINT) + 10) DIV 20"))
      .withColumn("cb",
        expr("(CAST(round(qb * 20) AS BIGINT) + 10) DIV 20"))
      .select(col("tau"),
        round(col("ca").cast("double") / 100, 2).as("q_ctrl_dollars"),
        round(col("cb").cast("double") / 100, 2).as("q_treat_dollars"),
        round((col("cb") - col("ca")).cast("double") / 100, 2)
          .as("qte_dollars"))
      .orderBy("tau")
  }

  // ---- E-392 binary transfer entropy ---------------------------------------------
  // Which way does information flow between daily revenue and daily
  // event volume? Both series binarized at their own exact medians,
  // TE(X→Y) = Σ p(y′,y,x)·ln[c(y′,y,x)·c(y) ∕ (c(y,x)·c(y′,y))] from
  // the 8 integer cells of the (next, current, driver) cube — terms
  // 1e-9-quantized before the ≤8-term fold, both directions reported
  // and the sign of the difference is the inferred direction.
  def extTransferentropy(s: SparkSession, dir: String): DataFrame = {
    val days = t(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
      .join(t(s, dir, "events")
        .groupBy(col("ts").cast("date").as("d"))
        .agg(count(lit(1)).as("ec")), Seq("d"), "inner")
    val med = days.agg(expr("percentile(rev, 0.5)").as("mr"),
      expr("percentile(ec, 0.5)").as("me")).limit(1)
    val w = Window.orderBy("d")
    val b = days.crossJoin(broadcast(med))
      .select(col("d"),
        when(col("rev").cast("double") > col("mr"), 1L).otherwise(0L)
          .as("r"),
        when(col("ec").cast("double") > col("me"), 1L).otherwise(0L)
          .as("e"))
      .withColumn("rn", lag("r", 1).over(w))
      .withColumn("en", lag("e", 1).over(w))
      .filter(col("rn").isNotNull)
    // te(driver x -> target y): cells over (y_next=y, y_prev, x_prev)
    def te(yNext: String, yPrev: String, xPrev: String): DataFrame = {
      val cells = b.groupBy(col(yPrev).as("y"), col(xPrev).as("x"),
          col(yNext).as("yn"))
        .agg(count(lit(1)).as("c"))
      val cy = cells.groupBy("y").agg(sum("c").as("cy"))
      val cyx = cells.groupBy("y", "x").agg(sum("c").as("cyx"))
      val cyny = cells.groupBy("y", "yn").agg(sum("c").as("cyny"))
      val n = cells.agg(sum("c").as("n")).limit(1)
      cells.join(cy, Seq("y")).join(cyx, Seq("y", "x"))
        .join(cyny, Seq("y", "yn"))
        .crossJoin(broadcast(n))
        .select(col("n"),
          round(col("c").cast("double") / col("n") *
            log(col("c").cast("double") * col("cy") /
              (col("cyx").cast("double") * col("cyny"))) * lit(1e9))
            .cast("long").as("tq"))
        .agg(first("n").as("n"), sum("tq").as("stq"))
        .select(col("n"),
          (col("stq").cast("double") / 1e9).as("te"))
        .limit(1)
    }
    val teER = te("r", "rn", "en")  // events -> revenue
    val teRE = te("e", "en", "rn")  // revenue -> events
    teER.select(col("n").as("n_days"), col("te").as("te_er"))
      .crossJoin(broadcast(teRE.select(col("te").as("te_re"))))
      .select(col("n_days"),
        round(col("te_er"), 6).as("te_events_to_rev"),
        round(col("te_re"), 6).as("te_rev_to_events"),
        when(col("te_er") > col("te_re"), "events_lead")
          .when(col("te_re") > col("te_er"), "revenue_leads")
          .otherwise("symmetric").as("direction"))
  }

  // ---- E-393 variance-ratio test -------------------------------------------------
  // Lo-MacKinlay VR(q) = Var(q-day revenue sums)∕(q·Var(daily)) over
  // the cumulative-revenue walk — VR ≈ 1 + 2Σ(1−k∕q)ρ_k, so VR > 1
  // means positive persistence, < 1 mean reversion. q-sums come from
  // prefix-cum differences at row offsets (lag q over the day index);
  // variances from cross-multiplied exact decimal moments; one
  // settled division per q ∈ {2, 5, 10}.
  def extVarratio(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("d")
    val days = t(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"))
      .withColumn("cum",
        sum("x").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    def varOf(df: DataFrame, c: String): DataFrame =
      df.agg(count(lit(1)).as("n"),
        sum(col(c).cast("decimal(38,0)")).as("s1"),
        sum(col(c).cast("decimal(38,0)") * col(c)).as("s2"))
        .select(col("n"),
          ((col("n") * col("s2") - col("s1") * col("s1")).cast("double") /
            col("n").cast("double") / (col("n") - 1).cast("double"))
            .as("v")).limit(1)
    val base = varOf(days, "x").select(col("n").as("n1"),
      col("v").as("v1"))
    val qFrames = Seq(2, 5, 10).map { q =>
      val qd = days.withColumn("lagcum", lag("cum", q).over(w))
        .filter(col("lagcum").isNotNull)
        .select((col("cum") - col("lagcum")).as("qs"))
      varOf(qd, "qs").select(lit(q.toLong).as("q"),
        col("n").as("nq"), col("v").as("vq"))
    }
    val allQ = qFrames.reduce(_ unionByName _)
    allQ.crossJoin(broadcast(base))
      .select(col("q"), col("nq").as("n_windows"),
        round(col("vq") / (col("q").cast("double") * col("v1")), 4)
          .as("variance_ratio"))
      .orderBy("q")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_qte" -> (extQte _),
    "ext_transferentropy" -> (extTransferentropy _),
    "ext_varratio" -> (extVarratio _))

  val oracleSql: Map[String, String] = Map(
    // E-391: identical split, interpolated quantiles, τ spine.
    "ext_qte" ->
      """with per as (select
        |    ('0x' || substr(sha256(cast(user_id as varchar)), 1, 15))
        |      ::bigint % 2 arm,
        |    cast(sum(case when event_type = 'purchase'
        |      then cast(round(value * 100) as bigint) else 0 end)
        |      as bigint) x
        |  from events group by user_id),
        |qs as (select arm,
        |    quantile_cont(x, 0.1) q10, quantile_cont(x, 0.25) q25,
        |    quantile_cont(x, 0.5) q50, quantile_cont(x, 0.75) q75,
        |    quantile_cont(x, 0.9) q90
        |  from per group by arm),
        |wide as (select
        |    max(case when arm = 0 then q10 end) a10,
        |    max(case when arm = 0 then q25 end) a25,
        |    max(case when arm = 0 then q50 end) a50,
        |    max(case when arm = 0 then q75 end) a75,
        |    max(case when arm = 0 then q90 end) a90,
        |    max(case when arm = 1 then q10 end) b10,
        |    max(case when arm = 1 then q25 end) b25,
        |    max(case when arm = 1 then q50 end) b50,
        |    max(case when arm = 1 then q75 end) b75,
        |    max(case when arm = 1 then q90 end) b90
        |  from qs),
        |st as (
        |  select cast(0.10 as double) tau, a10 qa, b10 qb from wide
        |  union all select cast(0.25 as double), a25, b25 from wide
        |  union all select cast(0.50 as double), a50, b50 from wide
        |  union all select cast(0.75 as double), a75, b75 from wide
        |  union all select cast(0.90 as double), a90, b90 from wide),
        |c as (select tau,
        |    (cast(round(qa * 20) as bigint) + 10) // 20 ca,
        |    (cast(round(qb * 20) as bigint) + 10) // 20 cb
        |  from st)
        |select tau, round(cast(ca as double) / 100, 2) q_ctrl_dollars,
        |  round(cast(cb as double) / 100, 2) q_treat_dollars,
        |  round(cast(cb - ca as double) / 100, 2) qte_dollars
        |from c order by tau""".stripMargin,

    // E-392: identical medians, lagged cube, quantized TE folds.
    "ext_transferentropy" ->
      """with days as (select r.d, r.rev, e.ec
        |  from (select cast(o_orderdate as date) d,
        |      sum(cast(round(o_totalprice * 100) as bigint)) rev
        |    from orders group by 1) r
        |  join (select cast(ts as date) d, cast(count(*) as bigint) ec
        |    from events group by 1) e on e.d = r.d),
        |med as (select quantile_cont(rev, 0.5) mr,
        |    quantile_cont(ec, 0.5) me from days),
        |b0 as (select d,
        |    case when cast(rev as double) > mr then 1 else 0 end r,
        |    case when cast(ec as double) > me then 1 else 0 end e
        |  from days cross join med),
        |b as (select d, r, e,
        |    lag(r) over (order by d) rn, lag(e) over (order by d) en
        |  from b0),
        |bb as (select * from b where rn is not null),
        |cells1 as (select rn y, en x, r yn, cast(count(*) as bigint) c
        |  from bb group by 1, 2, 3),
        |t1 as (select
        |    cast(sum(c) as bigint) n,
        |    cast(sum(cast(round(cast(c as double) /
        |      (select sum(c) from cells1) *
        |      ln(cast(c as double) *
        |        (select sum(c2.c) from cells1 c2 where c2.y = cells1.y) /
        |        ((select sum(c3.c) from cells1 c3 where c3.y = cells1.y
        |          and c3.x = cells1.x) *
        |         cast((select sum(c4.c) from cells1 c4
        |          where c4.y = cells1.y and c4.yn = cells1.yn)
        |          as double))) * 1e9) as bigint)) as bigint) stq
        |  from cells1),
        |cells2 as (select en y, rn x, e yn, cast(count(*) as bigint) c
        |  from bb group by 1, 2, 3),
        |t2 as (select
        |    cast(sum(cast(round(cast(c as double) /
        |      (select sum(c) from cells2) *
        |      ln(cast(c as double) *
        |        (select sum(c2.c) from cells2 c2 where c2.y = cells2.y) /
        |        ((select sum(c3.c) from cells2 c3 where c3.y = cells2.y
        |          and c3.x = cells2.x) *
        |         cast((select sum(c4.c) from cells2 c4
        |          where c4.y = cells2.y and c4.yn = cells2.yn)
        |          as double))) * 1e9) as bigint)) as bigint) stq
        |  from cells2)
        |select t1.n n_days,
        |  round(cast(t1.stq as double) / 1e9, 6) te_events_to_rev,
        |  round(cast(t2.stq as double) / 1e9, 6) te_rev_to_events,
        |  case when t1.stq > t2.stq then 'events_lead'
        |    when t2.stq > t1.stq then 'revenue_leads'
        |    else 'symmetric' end direction
        |from t1 cross join t2""".stripMargin,

    // E-393: identical prefix-cum q-sums and exact-moment variances.
    "ext_varratio" ->
      """with days as (select cast(o_orderdate as date) d,
        |    sum(cast(round(o_totalprice * 100) as bigint)) x
        |  from orders group by 1),
        |cum as (select d, x,
        |    cast(sum(x) over (order by d
        |      rows between unbounded preceding and current row)
        |      as bigint) cum
        |  from days),
        |base as (select cast(count(*) as bigint) n,
        |    sum(cast(x as hugeint)) s1,
        |    sum(cast(x as hugeint) * x) s2
        |  from days),
        |v1 as (select cast(n * s2 - s1 * s1 as double) /
        |    cast(n as double) / cast(n - 1 as double) v1 from base),
        |qd as (
        |  select 2 q, cum - lag(cum, 2) over (order by d) qs from cum
        |  union all
        |  select 5, cum - lag(cum, 5) over (order by d) from cum
        |  union all
        |  select 10, cum - lag(cum, 10) over (order by d) from cum),
        |qv as (select q, cast(count(*) as bigint) nq,
        |    cast(count(*) * sum(cast(qs as hugeint) * qs) -
        |      sum(cast(qs as hugeint)) * sum(cast(qs as hugeint))
        |      as double) /
        |      cast(count(*) as double) / cast(count(*) - 1 as double) vq
        |  from qd where qs is not null group by q)
        |select cast(q as bigint) q, nq n_windows,
        |  round(vq / (cast(q as double) * v1), 4) variance_ratio
        |from qv cross join v1
        |order by q""".stripMargin)
}
