package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 72: panel and series econometrics
  * — the fixed-effects within-estimator vs pooled OLS, Oaxaca-Blinder
  * mean-gap decomposition, and the Ljung-Box portmanteau test on
  * daily revenue autocorrelations.
  */
object ExtensionQueries72 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-364 fixed-effects within-estimator --------------------------------------
  // Price-quantity slope WITH part fixed effects vs pooled: the
  // within-estimator absorbs per-part level differences by demeaning
  // inside each part. Per-part moments are exact decimals; each
  // part's centered terms (Sxy−SxSy∕n, Sxx−Sx²∕n) become one settled
  // double, 1e-4-quantized before the CROSS-GROUP fold (E-257
  // discipline — the sum must not depend on group order), one final
  // division. The pooled slope from the same global exact moments is
  // the contrast: FE ≠ pooled reveals between-part confounding.
  def extFixedeffects(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey").as("g"),
        col("l_quantity").cast("long").cast("decimal(38,0)").as("x"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long").cast("decimal(38,0)").as("y"))
    val grp = li.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    val terms = grp.select(
      round((col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double") /
          col("n").cast("double")) * 1e4).cast("long")
        .cast("decimal(38,0)").as("qnum"),
      round((col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double") /
          col("n").cast("double")) * 1e4).cast("long")
        .cast("decimal(38,0)").as("qden"),
      col("n"), col("sx"), col("sy"), col("sxy"), col("sxx"))
    terms.agg(sum(col("n")).as("nn"), count(lit(1)).as("gg"),
        sum("qnum").as("wnum"), sum("qden").as("wden"),
        sum("sx").as("tsx"), sum("sy").as("tsy"),
        sum("sxy").as("tsxy"), sum("sxx").as("tsxx"))
      .select(col("nn").as("n_rows"), col("gg").as("n_parts"),
        round(col("wnum").cast("double") / col("wden").cast("double") / 100,
          6).as("fe_slope_dollars_per_unit"),
        round((col("nn") * col("tsxy") - col("tsx") * col("tsy"))
          .cast("double") /
          (col("nn") * col("tsxx") - col("tsx") * col("tsx")).cast("double") /
          100, 6).as("pooled_slope_dollars_per_unit"))
  }

  // ---- E-365 Oaxaca-Blinder decomposition ----------------------------------------
  // Why do BUILDING-segment customers spend differently? The mean
  // spend gap decomposes (twofold, reference = non-BUILDING
  // coefficients) into EXPLAINED = b_B·(x̄_A − x̄_B) — the part due to
  // balance differences — and UNEXPLAINED = the rest. Per-group
  // simple-OLS coefficients from cross-multiplied exact decimal
  // moments; every reported number one settled double expression.
  def extOaxaca(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .join(t(s, dir, "orders").groupBy(col("o_custkey").as("c_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("spend")),
        Seq("c_custkey"))
      .select((col("c_mktsegment") === "BUILDING").as("grp_a"),
        round(col("c_acctbal") * 100).cast("long").cast("decimal(38,0)")
          .as("x"),
        col("spend").cast("decimal(38,0)").as("y"))
    val mom = c.groupBy("grp_a")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    val wide = mom.agg(
      max(when(col("grp_a"), col("n"))).as("na"),
      max(when(col("grp_a"), col("sx"))).as("sxa"),
      max(when(col("grp_a"), col("sy"))).as("sya"),
      max(when(!col("grp_a"), col("n"))).as("nb"),
      max(when(!col("grp_a"), col("sx"))).as("sxb"),
      max(when(!col("grp_a"), col("sy"))).as("syb"),
      max(when(!col("grp_a"), col("sxy"))).as("sxyb"),
      max(when(!col("grp_a"), col("sxx"))).as("sxxb"))
    val bB = (col("nb") * col("sxyb") - col("sxb") * col("syb"))
      .cast("double") /
      (col("nb") * col("sxxb") - col("sxb") * col("sxb")).cast("double")
    val gap = col("sya").cast("double") / col("na") -
      col("syb").cast("double") / col("nb")
    val explained = bB * (col("sxa").cast("double") / col("na") -
      col("sxb").cast("double") / col("nb"))
    wide.select(col("na").as("n_building"), col("nb").as("n_other"),
      round(gap / 100, 2).as("gap_dollars"),
      round(explained / 100, 2).as("explained_dollars"),
      round((gap - explained) / 100, 2).as("unexplained_dollars"))
  }

  // ---- E-366 Ljung-Box portmanteau test ------------------------------------------
  // Is daily revenue white noise? Autocorrelations r_k (k ≤ 7) with
  // EXACT integer numerators: the demeaned value is scaled by n
  // (d_t = n·x_t − Σx, an exact decimal), so Σ d_t·d_{t+k} and Σ d_t²
  // are exact folds and each r_k is one settled division. Lags pair
  // by an equi-join on the date (day series ≪ fact table). Q =
  // n(n+2)·Σ r_k²∕(n−k) vs the pinned χ²₇ 5% value 14.067140.
  def extLjungbox(s: SparkSession, dir: String): DataFrame = {
    val days = t(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"))
    val mm = days.agg(count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,0)")).as("sx")).limit(1)
    val dm = days.crossJoin(broadcast(mm))
      .select(col("d"), col("n"),
        (col("n") * col("x").cast("decimal(38,0)") - col("sx")).as("dt"))
    val den = dm.agg(first("n").as("n"),
      sum(col("dt") * col("dt")).as("s0")).limit(1)
    val lags = dm.select(col("d"), col("dt"))
      .withColumn("k", explode(sequence(lit(1), lit(7))))
      .withColumn("dlag", expr("date_sub(d, k)"))
      .join(dm.select(col("d").as("dlag"), col("dt").as("dprev")),
        Seq("dlag"))
      .groupBy("k")
      .agg(sum(col("dt") * col("dprev")).as("sk"))
    val rk = lags.crossJoin(broadcast(den))
      .select(col("k"), col("n"),
        (col("sk").cast("double") / col("s0").cast("double")).as("r"))
    rk.select(col("n"), col("k"), col("r"),
        (col("r") * col("r") / (col("n") - col("k")).cast("double"))
          .as("term"))
      .withColumn("tq", round(col("term") * lit(1e15)).cast("long"))
      .agg(first("n").as("n_days"),
        round(sum(col("tq")).cast("double") / 1e15 * first("n") *
          (first("n") + 2), 4).as("q_stat"),
        (sum(col("tq")).cast("double") / 1e15 * first("n") *
          (first("n") + 2) > lit(14.067140)).as("reject_white_noise"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_fixedeffects" -> (extFixedeffects _),
    "ext_oaxaca" -> (extOaxaca _),
    "ext_ljungbox" -> (extLjungbox _))

  val oracleSql: Map[String, String] = Map(
    // E-364: identical per-group exact moments, 1e-4 quantized terms.
    "ext_fixedeffects" ->
      """with li as (select l_partkey g,
        |    cast(cast(l_quantity as bigint) as hugeint) x,
        |    cast(cast(round(l_extendedprice * (1 - l_discount) * 100)
        |      as bigint) as hugeint) y
        |  from lineitem),
        |grp as (select g, cast(count(*) as bigint) n, sum(x) sx,
        |    sum(y) sy, sum(x * y) sxy, sum(x * x) sxx
        |  from li group by 1),
        |terms as (select n, sx, sy, sxy, sxx,
        |    cast(cast(round((cast(sxy as double) -
        |      cast(sx as double) * cast(sy as double) /
        |        cast(n as double)) * 1e4) as bigint) as hugeint) qnum,
        |    cast(cast(round((cast(sxx as double) -
        |      cast(sx as double) * cast(sx as double) /
        |        cast(n as double)) * 1e4) as bigint) as hugeint) qden
        |  from grp),
        |agg as (select cast(sum(n) as bigint) nn,
        |    cast(count(*) as bigint) gg,
        |    sum(qnum) wnum, sum(qden) wden, sum(sx) tsx, sum(sy) tsy,
        |    sum(sxy) tsxy, sum(sxx) tsxx
        |  from terms)
        |select nn n_rows, gg n_parts,
        |  round(cast(wnum as double) / cast(wden as double) / 100, 6)
        |    fe_slope_dollars_per_unit,
        |  round(cast(nn * tsxy - tsx * tsy as double) /
        |    cast(nn * tsxx - tsx * tsx as double) / 100, 6)
        |    pooled_slope_dollars_per_unit
        |from agg""".stripMargin,

    // E-365: identical group moments and twofold decomposition.
    "ext_oaxaca" ->
      """with c as (select c_mktsegment = 'BUILDING' grp_a,
        |    cast(cast(round(c_acctbal * 100) as bigint) as hugeint) x,
        |    cast(o.spend as hugeint) y
        |  from customer
        |  join (select o_custkey ck,
        |      sum(cast(round(o_totalprice * 100) as bigint)) spend
        |    from orders group by 1) o on o.ck = c_custkey),
        |mom as (select grp_a, cast(count(*) as bigint) n, sum(x) sx,
        |    sum(y) sy, sum(x * y) sxy, sum(x * x) sxx
        |  from c group by 1),
        |wide as (select
        |    max(case when grp_a then n end) na,
        |    max(case when grp_a then sx end) sxa,
        |    max(case when grp_a then sy end) sya,
        |    max(case when not grp_a then n end) nb,
        |    max(case when not grp_a then sx end) sxb,
        |    max(case when not grp_a then sy end) syb,
        |    max(case when not grp_a then sxy end) sxyb,
        |    max(case when not grp_a then sxx end) sxxb
        |  from mom)
        |select na n_building, nb n_other,
        |  round((cast(sya as double) / na - cast(syb as double) / nb) /
        |    100, 2) gap_dollars,
        |  round(cast(nb * sxyb - sxb * syb as double) /
        |    cast(nb * sxxb - sxb * sxb as double) *
        |    (cast(sxa as double) / na - cast(sxb as double) / nb) / 100, 2)
        |    explained_dollars,
        |  round(((cast(sya as double) / na - cast(syb as double) / nb) -
        |    cast(nb * sxyb - sxb * syb as double) /
        |    cast(nb * sxxb - sxb * sxb as double) *
        |    (cast(sxa as double) / na - cast(sxb as double) / nb)) / 100, 2)
        |    unexplained_dollars
        |from wide""".stripMargin,

    // E-366: identical n-scaled exact numerators, lag equi-join,
    // pinned χ²₇ threshold.
    "ext_ljungbox" ->
      """with days as (select cast(o_orderdate as date) d,
        |    sum(cast(round(o_totalprice * 100) as bigint)) x
        |  from orders group by 1),
        |mm as (select cast(count(*) as bigint) n,
        |    sum(cast(x as hugeint)) sx
        |  from days),
        |dm as (select d, n, n * cast(x as hugeint) - sx dt
        |  from days cross join mm),
        |den as (select any_value(n) n, sum(dt * dt) s0 from dm),
        |lags as (select k.k, sum(a.dt * b.dt) sk
        |  from dm a
        |  cross join (select unnest(generate_series(1, 7)) k) k
        |  join dm b on b.d = a.d - cast(k.k as integer)
        |  group by k.k),
        |rk as (select k, n,
        |    cast(sk as double) / cast(s0 as double) r
        |  from lags cross join den),
        |tq as (select n, cast(round(r * r / cast(n - k as double) * 1e15)
        |    as bigint) tq
        |  from rk)
        |select any_value(n) n_days,
        |  round(cast(sum(tq) as double) / 1e15 * any_value(n) *
        |    (any_value(n) + 2), 4) q_stat,
        |  (cast(sum(tq) as double) / 1e15 * any_value(n) *
        |    (any_value(n) + 2) > 14.067140) reject_white_noise
        |from tq""".stripMargin)
}
