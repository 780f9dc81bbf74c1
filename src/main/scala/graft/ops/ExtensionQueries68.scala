package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 68: observational-causal and
  * multivariate tooling — nearest-neighbor covariate matching with the
  * before/after balance readout, closed-form 2-feature Mahalanobis
  * outliers, and Box-Cox transform selection over a λ spine.
  */
object ExtensionQueries68 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def custFrame(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(col("c_custkey").as("k"),
        round(col("c_acctbal") * 100).cast("long").as("bal"),
        (col("c_mktsegment") === "BUILDING").as("treated"))
      .join(t(s, dir, "orders").groupBy(col("o_custkey").as("k"))
        .agg(count(lit(1)).as("y")), Seq("k"), "left")
      .select(col("k"), col("bal"), col("treated"),
        coalesce(col("y"), lit(0L)).as("y"))

  // ---- E-352 nearest-neighbor matching + balance ---------------------------------
  // The observational workhorse: each BUILDING-segment customer
  // (treated) is matched to its nearest control by account balance
  // (one sorted pass — previous and next control via two windows, the
  // nearer wins, ties to the lower balance — no pair join), controls
  // reused with replacement. Reported: the standardized mean
  // difference of the matching covariate BEFORE (treated vs all
  // controls) and AFTER (treated vs matched controls) — matching must
  // crush it — and the matched-pair outcome contrast (order count),
  // the ATT under selection-on-observables. Exact decimal moments.
  def extMatching(s: SparkSession, dir: String): DataFrame = {
    // three consumers (matched + both moment aggregates) — pin the
    // customer⋈order-count frame once instead of recomputing its join
    // per consumer
    val c = custFrame(s, dir).localCheckpoint()
    val wPrev = Window.orderBy("bal", "k")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.orderBy("bal", "k")
      .rowsBetween(1, Window.unboundedFollowing)
    val ctrl = struct(col("bal"), col("k"), col("y"))
    val matched = c
      .withColumn("prevc", last(when(!col("treated"), ctrl), true).over(wPrev))
      .withColumn("nextc", first(when(!col("treated"), ctrl), true).over(wNext))
      .filter(col("treated"))
      .withColumn("mc",
        when(col("nextc").isNull, col("prevc"))
          .when(col("prevc").isNull, col("nextc"))
          .when(col("bal") - col("prevc.bal") <= col("nextc.bal") - col("bal"),
            col("prevc"))
          .otherwise(col("nextc")))
      .filter(col("mc").isNotNull)
      .select(col("k"), col("bal"), col("y"),
        col("mc.bal").as("cbal"), col("mc.y").as("cy"))
    val bd = col("bal").cast("decimal(38,0)")
    val tMom = c.filter(col("treated"))
      .agg(count(lit(1)).as("nt"), sum(bd).as("st"), sum(bd * bd).as("stt"))
    val cMom = c.filter(!col("treated"))
      .agg(count(lit(1)).as("nc"), sum(bd).as("sc"), sum(bd * bd).as("scc"))
    val mMom = matched.agg(count(lit(1)).as("nm"),
      sum(col("cbal").cast("decimal(38,0)")).as("sm"),
      sum(col("cbal").cast("decimal(38,0)") * col("cbal")).as("smm"),
      sum(col("y") - col("cy")).as("dy"))
    def meanVar(n: org.apache.spark.sql.Column, s1: org.apache.spark.sql.Column,
        s2: org.apache.spark.sql.Column) = (
      s1.cast("double") / n,
      (n * s2 - s1 * s1).cast("double") / n.cast("double") / (n - 1).cast("double"))
    tMom.crossJoin(broadcast(cMom)).crossJoin(broadcast(mMom))
      .select(col("nt"), col("nm"), {
          val (mt, vt) = meanVar(col("nt"), col("st"), col("stt"))
          val (mc, vc) = meanVar(col("nc"), col("sc"), col("scc"))
          round((mt - mc) / sqrt((vt + vc) / 2), 6).as("smd_before")
        }, {
          val (mt, vt) = meanVar(col("nt"), col("st"), col("stt"))
          val (mm, vm) = meanVar(col("nm"), col("sm"), col("smm"))
          round((mt - mm) / sqrt((vt + vm) / 2), 6).as("smd_after")
        },
        round(col("dy").cast("double") / col("nm"), 4).as("att_orders"))
  }

  // ---- E-353 Mahalanobis outliers ------------------------------------------------
  // Joint (balance, order-count) outliers the per-axis z-scores miss:
  // D² from the CLOSED-FORM 2×2 covariance inverse — moments are exact
  // decimals, each customer's D² one settled expression. Top-15 by D²;
  // the bivariate companion to ext_anomaly's univariate MAD screen.
  def extMahalanobis(s: SparkSession, dir: String): DataFrame = {
    val c = custFrame(s, dir)
      .select(col("k"), col("bal").cast("decimal(38,0)").as("x"),
        col("y").cast("decimal(38,0)").as("y"))
    val mom = c.agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum("y").as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("n"),
        (col("sx").cast("double") / col("n")).as("mx"),
        (col("sy").cast("double") / col("n")).as("my"),
        ((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") /
          col("n").cast("double") / (col("n") - 1)).as("vx"),
        ((col("n") * col("syy") - col("sy") * col("sy")).cast("double") /
          col("n").cast("double") / (col("n") - 1)).as("vy"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          col("n").cast("double") / (col("n") - 1)).as("cxy"))
    c.crossJoin(broadcast(mom.limit(1)))
      .select(col("k"),
        round(((col("x").cast("double") - col("mx")) *
            (col("x").cast("double") - col("mx")) * col("vy") -
          lit(2.0) * (col("x").cast("double") - col("mx")) *
            (col("y").cast("double") - col("my")) * col("cxy") +
          (col("y").cast("double") - col("my")) *
            (col("y").cast("double") - col("my")) * col("vx")) /
          (col("vx") * col("vy") - col("cxy") * col("cxy")), 4).as("d2"))
      .orderBy(desc("d2"), asc("k"))
      .limit(15)
  }

  // ---- E-354 Box-Cox transform selection -----------------------------------------
  // Which power transform most normalizes order totals? Profile
  // log-likelihood per λ ∈ {−1, −0.5, 0, 0.5, 1}:
  // ll(λ) = −n/2·ln σ²(t_λ) + (λ−1)·Σ ln y, with t_λ = (y^λ−1)/λ
  // (ln y at 0). Per-row transforms quantized to 1e-6 before the
  // moment sums so σ² settles identically; Σ ln y shared across the
  // spine. The transform picker a normality-assuming model runs first.
  def extBoxcox(s: SparkSession, dir: String): DataFrame = {
    val y = t(s, dir, "orders")
      .select((round(col("o_totalprice") * 100).cast("long")
        .cast("double") / 100).as("y"))
      .filter(col("y") > 0)
    val lams = y.sparkSession.range(5)
      .select((element_at(array(lit(-1.0), lit(-0.5), lit(0.0), lit(0.5),
        lit(1.0)), (col("id") + 1).cast("int"))).as("lam"))
    val q = y.crossJoin(broadcast(lams))
      .select(col("lam"),
        round(when(col("lam") === 0.0, log(col("y")))
          .otherwise((pow(col("y"), col("lam")) - 1) / col("lam")) * 1e6)
          .cast("long").cast("decimal(38,0)").as("tq"),
        round(log(col("y")) * 1e6).cast("long").cast("decimal(38,0)")
          .as("ly"))
    q.groupBy("lam")
      .agg(count(lit(1)).as("n"), sum("tq").as("st"),
        sum(col("tq") * col("tq")).as("stt"), sum("ly").as("sly"))
      .select(col("lam"), col("n"),
        round(lit(-0.5) * col("n") *
          log((col("n") * col("stt") - col("st") * col("st")).cast("double") /
            col("n").cast("double") / col("n").cast("double") / 1e12) +
          (col("lam") - 1) * col("sly").cast("double") / 1e6, 2)
          .as("profile_loglik"))
      .orderBy("lam")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_matching" -> (extMatching _),
    "ext_mahalanobis" -> (extMahalanobis _),
    "ext_boxcox" -> (extBoxcox _))

  private val custSql =
    """c as (select c_custkey k,
      |    cast(round(c_acctbal * 100) as bigint) bal,
      |    c_mktsegment = 'BUILDING' treated,
      |    cast(coalesce(o.y, 0) as bigint) y
      |  from customer
      |  left join (select o_custkey ck, count(*) y from orders
      |    group by 1) o on o.ck = c_custkey)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // E-352: identical windows, tie rule, and decimal moments.
    "ext_matching" ->
      s"""with $custSql,
        |wins as (select k, bal, treated, y,
        |    last_value(case when not treated
        |        then struct_pack(bal := bal, k := k, y := y) end
        |      ignore nulls) over (order by bal, k
        |        rows between unbounded preceding and 1 preceding) prevc,
        |    first_value(case when not treated
        |        then struct_pack(bal := bal, k := k, y := y) end
        |      ignore nulls) over (order by bal, k
        |        rows between 1 following and unbounded following) nextc
        |  from c),
        |mt as (select k, bal, y,
        |    case when nextc is null then prevc
        |      when prevc is null then nextc
        |      when bal - prevc.bal <= nextc.bal - bal then prevc
        |      else nextc end mc
        |  from wins where treated),
        |matched as (select k, bal, y, mc.bal cbal, mc.y cy
        |  from mt where mc is not null),
        |tm as (select cast(count(*) as bigint) nt,
        |    sum(cast(bal as hugeint)) st,
        |    sum(cast(bal as hugeint) * bal) stt
        |  from c where treated),
        |cm as (select cast(count(*) as bigint) nc,
        |    sum(cast(bal as hugeint)) sc,
        |    sum(cast(bal as hugeint) * bal) scc
        |  from c where not treated),
        |mm as (select cast(count(*) as bigint) nm,
        |    sum(cast(cbal as hugeint)) sm,
        |    sum(cast(cbal as hugeint) * cbal) smm,
        |    cast(sum(y - cy) as bigint) dy
        |  from matched)
        |select nt, nm,
        |  round((cast(st as double) / nt - cast(sc as double) / nc) /
        |    sqrt((cast(nt * stt - st * st as double) / nt / (nt - 1) +
        |          cast(nc * scc - sc * sc as double) / nc / (nc - 1)) / 2),
        |    6) smd_before,
        |  round((cast(st as double) / nt - cast(sm as double) / nm) /
        |    sqrt((cast(nt * stt - st * st as double) / nt / (nt - 1) +
        |          cast(nm * smm - sm * sm as double) / nm / (nm - 1)) / 2),
        |    6) smd_after,
        |  round(cast(dy as double) / nm, 4) att_orders
        |from tm cross join cm cross join mm""".stripMargin,

    // E-353: identical closed-form 2x2 inverse and decimal moments.
    "ext_mahalanobis" ->
      s"""with $custSql,
        |d as (select k, cast(bal as hugeint) x, cast(y as hugeint) y
        |  from c),
        |mom as (select cast(count(*) as bigint) n,
        |    sum(x) sx, sum(y) sy, sum(x * x) sxx, sum(y * y) syy,
        |    sum(x * y) sxy
        |  from d),
        |st as (select n,
        |    cast(sx as double) / n mx, cast(sy as double) / n my,
        |    cast(n * sxx - sx * sx as double) / n / (n - 1) vx,
        |    cast(n * syy - sy * sy as double) / n / (n - 1) vy,
        |    cast(n * sxy - sx * sy as double) / n / (n - 1) cxy
        |  from mom)
        |select k,
        |  round(((cast(x as double) - mx) * (cast(x as double) - mx) * vy -
        |    2.0 * (cast(x as double) - mx) * (cast(y as double) - my) * cxy +
        |    (cast(y as double) - my) * (cast(y as double) - my) * vx) /
        |    (vx * vy - cxy * cxy), 4) d2
        |from d cross join st
        |order by d2 desc, k limit 15""".stripMargin,

    // E-354: identical λ spine, quantized transforms, profile form.
    "ext_boxcox" ->
      """with y as (select cast(round(o_totalprice * 100) as bigint)
        |    / 100.0 y
        |  from orders
        |  where cast(round(o_totalprice * 100) as bigint) > 0),
        |lams as (select unnest([-1.0, -0.5, 0.0, 0.5, 1.0]) lam),
        |q as (select lam,
        |    cast(cast(round((case when lam = 0.0 then ln(y)
        |      else (pow(y, lam) - 1) / lam end) * 1e6) as bigint)
        |      as hugeint) tq,
        |    cast(cast(round(ln(y) * 1e6) as bigint) as hugeint) ly
        |  from y cross join lams),
        |m as (select lam, cast(count(*) as bigint) n, sum(tq) st,
        |    sum(tq * tq) stt, sum(ly) sly
        |  from q group by lam)
        |select lam, n,
        |  round(-0.5 * n *
        |    ln(cast(n * stt - st * st as double) /
        |      cast(n as double) / cast(n as double) / 1e12) +
        |    (lam - 1) * cast(sly as double) / 1e6, 2) profile_loglik
        |from m order by lam""".stripMargin)
}
