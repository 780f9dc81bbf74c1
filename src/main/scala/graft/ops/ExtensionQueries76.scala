package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 76: survival analysis beyond the
  * Kaplan-Meier curve (E-101) — the Nelson-Aalen cumulative hazard,
  * the two-group log-rank test, and restricted mean survival time,
  * all over the same time-to-first-shipment frame.
  */
object ExtensionQueries76 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** E-101's time-to-event frame: tt = days order→first shipment,
    * event = order not open (right-censoring via 'O' status).
    */
  private def durations(s: SparkSession, dir: String): DataFrame = {
    val firstShip = t(s, dir, "lineitem")
      .groupBy("l_orderkey").agg(min("l_shipdate").as("ship0"))
    t(s, dir, "orders")
      .join(firstShip, col("o_orderkey") === col("l_orderkey"))
      .select(
        datediff(to_date(col("ship0")), to_date(col("o_orderdate")))
          .cast("long").as("tt"),
        when(col("o_orderstatus") =!= "O", 1L).otherwise(0L).as("ev"),
        (col("o_orderpriority").isin("1-URGENT", "2-HIGH")).as("grp_a"))
  }

  private def riskTable(s: SparkSession, dir: String): DataFrame = {
    val byT = durations(s, dir).groupBy("tt")
      .agg(sum("ev").as("d"), count(lit(1)).as("m"))
    val wPrev = Window.orderBy("tt").rowsBetween(Window.unboundedPreceding, -1)
    byT.withColumn("n_risk",
      sum("m").over(Window.partitionBy()) -
        coalesce(sum("m").over(wPrev), lit(0L)))
  }

  // ---- E-376 Nelson-Aalen cumulative hazard --------------------------------------
  // The estimator that SUMS hazards where Kaplan-Meier multiplies
  // survivals: H(t) = Σ_{s≤t} d_s∕n_s with each increment
  // 1e-9-quantized before the ordered cumulative fold, and the
  // Breslow survival exp(−H) reported beside it — at low event rates
  // it hugs KM, diverging where risk sets thin out.
  def extNelsonaalen(s: SparkSession, dir: String): DataFrame = {
    val wCum = Window.orderBy("tt").rowsBetween(Window.unboundedPreceding, 0)
    riskTable(s, dir)
      .withColumn("hq",
        round(col("d").cast("double") * 1e9 / col("n_risk")).cast("long"))
      .withColumn("hcum", sum("hq").over(wCum))
      .filter(col("d") > 0)
      .select(col("tt"), col("n_risk"), col("d"),
        round(col("hcum").cast("double") / 1e9, 6).as("cum_hazard"),
        round(exp(-col("hcum").cast("double") / 1e9), 4)
          .as("surv_breslow"))
      .orderBy("tt")
      .limit(25)
  }

  // ---- E-377 two-group log-rank test ---------------------------------------------
  // Do urgent-priority orders ship on a different clock? At each
  // event time the observed group-A deaths are compared with the
  // hypergeometric expectation e_A = d·n_A∕n and variance
  // d·(n_A∕n)(n_B∕n)(n−d)∕(n−1); O−E and V terms are 1e-9-quantized
  // before the cross-time fold, χ² = (ΣO−E)²∕ΣV against the pinned
  // χ²₁ 3.841459. Risk sets per group come from one cumulative
  // window over the times × group grid — never a re-scan per time.
  def extLogrank(s: SparkSession, dir: String): DataFrame = {
    val dur = durations(s, dir)
    val byGT = dur.groupBy(col("grp_a"), col("tt"))
      .agg(sum("ev").as("d"), count(lit(1)).as("m"))
    val totals = dur.groupBy("grp_a").agg(count(lit(1)).as("tot"))
    val times = byGT.select("tt").distinct()
    // limit(2) = the exact group count: structural bound for the
    // cartesian gate, results unchanged
    val grid = times.crossJoin(totals.select(col("grp_a"), col("tot"))
        .limit(2))
      .join(byGT, Seq("grp_a", "tt"), "left")
      .select(col("grp_a"), col("tt"), col("tot"),
        coalesce(col("d"), lit(0L)).as("d"),
        coalesce(col("m"), lit(0L)).as("m"))
    val wPrev = Window.partitionBy("grp_a").orderBy("tt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = grid.withColumn("nr",
      col("tot") - coalesce(sum("m").over(wPrev), lit(0L)))
    val wide = risk.groupBy("tt").agg(
      sum(when(col("grp_a"), col("d")).otherwise(0L)).as("da"),
      sum(when(col("grp_a"), col("nr")).otherwise(0L)).as("na"),
      sum(when(!col("grp_a"), col("d")).otherwise(0L)).as("db"),
      sum(when(!col("grp_a"), col("nr")).otherwise(0L)).as("nb"))
    val terms = wide
      .select(col("tt"), (col("da") + col("db")).as("d"),
        (col("na") + col("nb")).as("n"), col("da"), col("na"), col("nb"))
      .filter(col("d") > 0 && col("n") > 1)
      .select(
        round((col("da").cast("double") -
          col("d").cast("double") * col("na") / col("n")) * 1e9)
          .cast("long").as("omeq"),
        round(col("d").cast("double") *
          (col("na").cast("double") / col("n")) *
          (col("nb").cast("double") / col("n")) *
          (col("n") - col("d")).cast("double") / (col("n") - 1)
          * 1e9).cast("long").as("vq"))
    terms.agg(count(lit(1)).as("n_times"),
        sum(col("omeq").cast("decimal(38,0)")).as("soe"),
        sum(col("vq").cast("decimal(38,0)")).as("sv"))
      .select(col("n_times"),
        round(col("soe").cast("double") / 1e9, 4).as("o_minus_e"),
        round(col("sv").cast("double") / 1e9, 4).as("variance"),
        round(col("soe").cast("double") * col("soe").cast("double") / 1e9 /
          col("sv").cast("double") / 1e9, 4).as("chi2"),
        (col("soe").cast("double") * col("soe").cast("double") / 1e9 /
          col("sv").cast("double") / 1e9 > lit(3.841459))
          .as("reject_equal_curves"))
  }

  // ---- E-378 restricted mean survival time ---------------------------------------
  // "Average days-to-ship within the first 60": the area under the KM
  // step function up to τ=60 — step widths × the PREVIOUS step's
  // survival (lag defaults pin S=1 before the first event), each
  // rectangle 1e-6-quantized before the fold, plus the τ-tail at the
  // last observed survival. Robust where median/mean survival are
  // undefined under censoring.
  def extRmst(s: SparkSession, dir: String): DataFrame = {
    val wCum = Window.orderBy("tt").rowsBetween(Window.unboundedPreceding, 0)
    val km = riskTable(s, dir)
      .withColumn("f", lit(1.0) - col("d") / col("n_risk"))
      .withColumn("zero_seen",
        max(when(col("f") === 0, 1).otherwise(0)).over(wCum))
      .withColumn("surv",
        when(col("zero_seen") === 1, lit(0.0))
          .otherwise(exp(sum(when(col("f") > 0, log(col("f")))).over(wCum))))
      .filter(col("d") > 0)
      .select(col("tt"), col("surv"))
    val w = Window.orderBy("tt")
    val inTau = km.filter(col("tt") <= 60)
      .withColumn("prev_tt", coalesce(lag("tt", 1).over(w), lit(0L)))
      .withColumn("prev_surv", coalesce(lag("surv", 1).over(w), lit(1.0)))
      .select(col("tt"), col("surv"),
        round((col("tt") - col("prev_tt")).cast("double") *
          col("prev_surv") * 1e6).cast("long").as("tq"))
    val tail = inTau.orderBy(desc("tt")).limit(1)
      .select(col("tt").as("last_tt"), col("surv").as("last_surv"))
    val body = inTau.agg(count(lit(1)).as("n_steps"), sum("tq").as("stq"))
      .limit(1)
    body.crossJoin(broadcast(tail))
      .select(lit(60L).as("tau_days"), col("n_steps"),
        round((col("stq") +
          round((lit(60L) - col("last_tt")).cast("double") *
            col("last_surv") * 1e6).cast("long")).cast("double") / 1e6, 4)
          .as("rmst_days"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_nelsonaalen" -> (extNelsonaalen _),
    "ext_logrank" -> (extLogrank _),
    "ext_rmst" -> (extRmst _))

  private val durSql =
    """dur as (
      |  select date_diff('day', cast(o_orderdate as date),
      |      cast(ship0 as date)) tt,
      |    case when o_orderstatus <> 'O' then 1 else 0 end ev,
      |    o_orderpriority in ('1-URGENT', '2-HIGH') grp_a
      |  from orders join (
      |    select l_orderkey, min(l_shipdate) ship0 from lineitem
      |    group by 1) fs
      |  on o_orderkey = fs.l_orderkey)""".stripMargin

  private val riskSql =
    """byt as (select tt, cast(sum(ev) as bigint) d,
      |    cast(count(*) as bigint) m
      |  from dur group by tt),
      |risk as (select tt, d, m,
      |    cast(sum(m) over () as bigint) -
      |      cast(coalesce(sum(m) over (order by tt
      |        rows between unbounded preceding and 1 preceding), 0)
      |        as bigint) n_risk
      |  from byt)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // E-376: identical risk table, quantized hazard increments.
    "ext_nelsonaalen" ->
      s"""with $durSql,
        |$riskSql,
        |h as (select tt, n_risk, d,
        |    cast(sum(cast(round(cast(d as double) * 1e9 / n_risk)
        |      as bigint)) over (order by tt
        |      rows between unbounded preceding and current row)
        |      as bigint) hcum
        |  from risk)
        |select tt, n_risk, d,
        |  round(cast(hcum as double) / 1e9, 6) cum_hazard,
        |  round(exp(-cast(hcum as double) / 1e9), 4) surv_breslow
        |from h where d > 0 order by tt limit 25""".stripMargin,

    // E-377: identical grid, hypergeometric terms, quantized folds.
    "ext_logrank" ->
      s"""with $durSql,
        |bygt as (select grp_a, tt, cast(sum(ev) as bigint) d,
        |    cast(count(*) as bigint) m
        |  from dur group by 1, 2),
        |totals as (select grp_a, cast(count(*) as bigint) tot
        |  from dur group by 1),
        |times as (select distinct tt from bygt),
        |grid as (select t.grp_a, times.tt, t.tot,
        |    cast(coalesce(b.d, 0) as bigint) d,
        |    cast(coalesce(b.m, 0) as bigint) m
        |  from times cross join totals t
        |  left join bygt b on b.grp_a = t.grp_a and b.tt = times.tt),
        |risk as (select grp_a, tt, d,
        |    tot - cast(coalesce(sum(m) over (partition by grp_a
        |      order by tt rows between unbounded preceding and
        |      1 preceding), 0) as bigint) nr
        |  from grid),
        |wide as (select tt,
        |    cast(sum(case when grp_a then d else 0 end) as bigint) da,
        |    cast(sum(case when grp_a then nr else 0 end) as bigint) na,
        |    cast(sum(case when not grp_a then d else 0 end) as bigint) db,
        |    cast(sum(case when not grp_a then nr else 0 end) as bigint) nb
        |  from risk group by tt),
        |terms as (select
        |    cast(round((cast(da as double) -
        |      cast(da + db as double) * na / (na + nb)) * 1e9)
        |      as bigint) omeq,
        |    cast(round(cast(da + db as double) *
        |      (cast(na as double) / (na + nb)) *
        |      (cast(nb as double) / (na + nb)) *
        |      cast(na + nb - da - db as double) / (na + nb - 1) * 1e9)
        |      as bigint) vq
        |  from wide where da + db > 0 and na + nb > 1),
        |agg as (select cast(count(*) as bigint) n_times,
        |    sum(cast(omeq as hugeint)) soe, sum(cast(vq as hugeint)) sv
        |  from terms)
        |select n_times,
        |  round(cast(soe as double) / 1e9, 4) o_minus_e,
        |  round(cast(sv as double) / 1e9, 4) variance,
        |  round(cast(soe as double) * cast(soe as double) / 1e9 /
        |    cast(sv as double) / 1e9, 4) chi2,
        |  (cast(soe as double) * cast(soe as double) / 1e9 /
        |    cast(sv as double) / 1e9 > 3.841459) reject_equal_curves
        |from agg""".stripMargin,

    // E-378: identical KM products, step rectangles, τ tail.
    "ext_rmst" ->
      s"""with $durSql,
        |$riskSql,
        |f as (select tt, d, n_risk,
        |    1.0 - d / cast(n_risk as double) fac from risk),
        |s as (select tt, d,
        |    max(case when fac = 0 then 1 else 0 end) over (order by tt
        |      rows between unbounded preceding and current row) zero_seen,
        |    sum(case when fac > 0 then ln(fac) end) over (order by tt
        |      rows between unbounded preceding and current row) lnsum
        |  from f),
        |km as (select tt,
        |    case when zero_seen = 1 then 0.0 else exp(lnsum) end surv
        |  from s where d > 0),
        |intau as (select tt, surv,
        |    cast(round((tt - coalesce(lag(tt) over (order by tt), 0)) *
        |      coalesce(lag(surv) over (order by tt), 1.0) * 1e6)
        |      as bigint) tq
        |  from km where tt <= 60),
        |tail as (select tt last_tt, surv last_surv from intau
        |  order by tt desc limit 1),
        |body as (select cast(count(*) as bigint) n_steps,
        |    cast(sum(tq) as bigint) stq from intau)
        |select cast(60 as bigint) tau_days, n_steps,
        |  round(cast(stq + cast(round((60 - last_tt) * last_surv * 1e6)
        |    as bigint) as double) / 1e6, 4) rmst_days
        |from body cross join tail""".stripMargin)
}
