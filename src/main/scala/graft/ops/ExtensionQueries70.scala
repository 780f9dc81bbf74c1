package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 70: shape-constrained and
  * parametric-count modelling — isotonic regression via the minimax
  * identity over balance deciles, empirical-Bayes beta-binomial
  * shrinkage of per-brand return rates, and the negative-binomial
  * method-of-moments fit of per-user activity counts.
  */
object ExtensionQueries70 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-358 isotonic regression (PAVA via minimax) ------------------------------
  // Monotone calibration of mean order count vs balance decile. PAVA's
  // pooled fit has the closed RELATIONAL form g(i) = max_{j≤i}
  // min_{k≥i} avg(j..k) (the minimax identity), so no sequential
  // pooling loop is needed: prefix sums over the 10-row decile frame,
  // every (j,k) segment average from two prefix lookups, one bounded
  // i×(j,k) join (10×55 rows), then min-per-(i,j) and max-per-i.
  // Integer order counts ⇒ every segment average is one settled
  // division of exact longs. Output is provably non-decreasing.
  def extIsotonic(s: SparkSession, dir: String): DataFrame = {
    val bins = t(s, dir, "customer")
      .select(col("c_custkey").as("k"),
        round(col("c_acctbal") * 100).cast("long").as("bal"))
      .join(t(s, dir, "orders").groupBy(col("o_custkey").as("k"))
        .agg(count(lit(1)).as("y")), Seq("k"), "left")
      .select(col("k"), col("bal"), coalesce(col("y"), lit(0L)).as("y"))
      .withColumn("dec", ntile(10).over(Window.orderBy("bal", "k")))
      .groupBy("dec").agg(count(lit(1)).as("n"), sum("y").as("sy"))
    val w = Window.orderBy("dec")
    val pre = bins
      .withColumn("cn", sum("n").over(w))
      .withColumn("cs", sum("sy").over(w))
      .limit(10)
    val segs = pre.select(col("dec").as("j"), col("cn").as("cnj"),
        col("cs").as("csj"), col("n").as("nj"), col("sy").as("syj"))
      .join(pre.select(col("dec").as("kk"), col("cn").as("cnk"),
        col("cs").as("csk")), col("j") <= col("kk"))
      .select(col("j"), col("kk"),
        ((col("csk") - col("csj") + col("syj")).cast("double") /
          (col("cnk") - col("cnj") + col("nj")).cast("double")).as("avg"))
      .limit(55)
    val fit = pre.select(col("dec").as("i"), col("n"),
        (col("sy").cast("double") / col("n")).as("raw_mean"))
      .join(segs, col("j") <= col("i") && col("kk") >= col("i"))
      .groupBy(col("i"), col("n"), col("raw_mean"), col("j"))
      .agg(min("avg").as("minav"))
      .groupBy(col("i"), col("n"), col("raw_mean"))
      .agg(max("minav").as("iso"))
    fit.select(col("i").as("decile"), col("n"),
        round(col("raw_mean"), 4).as("raw_mean"),
        round(col("iso"), 4).as("isotonic_fit"))
      .orderBy("decile")
  }

  // ---- E-359 beta-binomial empirical-Bayes shrinkage -----------------------------
  // Per-brand return rates shrunk toward the cross-brand prior whose
  // STRENGTH is estimated from the data (method of moments on the
  // ~25 raw rates: α+β = p̄(1−p̄)∕s² − 1), unlike E-193's fixed m=10.
  // Raw rates quantized to 1e-9 before the cross-brand moment fold
  // (one settled division per brand, then exact long sums); shrunk
  // rate = (x+α)∕(n+α+β). Top-15 by absolute shrink distance — the
  // small-sample brands move most.
  def extBetabinomial(s: SparkSession, dir: String): DataFrame = {
    val b = t(s, dir, "lineitem")
      .join(t(s, dir, "part").select(col("p_partkey").as("l_partkey"),
        col("p_brand")), Seq("l_partkey"))
      .groupBy("p_brand")
      .agg(sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("x"),
        count(lit(1)).as("n"))
      .withColumn("rq",
        round(col("x").cast("double") * 1e9 / col("n")).cast("long"))
    val mom = b.agg(count(lit(1)).as("g"), sum("rq").as("sr"),
        sum(col("rq").cast("decimal(38,0)") * col("rq")).as("srr"))
      .select(col("g"),
        (col("sr").cast("double") / col("g") / 1e9).as("pbar"),
        ((col("g") * col("srr") - col("sr").cast("decimal(38,0)") *
          col("sr")).cast("double") /
          col("g").cast("double") / (col("g") - 1).cast("double") / 1e18)
          .as("s2"))
      .select(col("pbar"),
        when(col("s2") > 0,
          greatest(col("pbar") * (lit(1.0) - col("pbar")) / col("s2") -
            1.0, lit(0.0))).otherwise(lit(0.0)).as("m"))
      .select(col("pbar"), (col("pbar") * col("m")).as("alpha"),
        ((lit(1.0) - col("pbar")) * col("m")).as("beta"))
      .limit(1)
    b.crossJoin(broadcast(mom))
      .select(col("p_brand"), col("n"),
        round(col("x").cast("double") / col("n"), 6).as("raw_rate"),
        round((col("x").cast("double") + col("alpha")) /
          (col("n").cast("double") + col("alpha") + col("beta")), 6)
          .as("shrunk_rate"))
      .withColumn("shift",
        round(abs(col("shrunk_rate") - col("raw_rate")), 6))
      .orderBy(desc("shift"), asc("p_brand"))
      .limit(15)
  }

  // ---- E-360 negative-binomial MoM fit -------------------------------------------
  // Parametric fit of per-user event counts: NB(r, p) by method of
  // moments — r = m²∕(v−m), p = r∕(r+m) — from exact decimal count
  // moments, with the Poisson-boundary guard (v ≤ m ⇒ NULL fit, the
  // dispersion ratio still reported). P(0) = p^r is the predicted
  // never-active share, the quantity the ZERO-truncated observed
  // frame cannot show directly; the parametric companion to E-351's
  // dispersion index.
  def extNegbin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .select(col("n").cast("decimal(38,0)").as("n"))
    val mom = c.agg(count(lit(1)).as("u"), sum("n").as("sn"),
        sum(col("n") * col("n")).as("snn"))
      .select(col("u"), (col("sn").cast("double") / col("u")).as("m"),
        ((col("u") * col("snn") - col("sn") * col("sn")).cast("double") /
          col("u").cast("double") / (col("u") - 1).cast("double")).as("v"))
    mom.select(col("u").as("n_users"), round(col("m"), 4).as("mean_events"),
      round(col("v") / col("m"), 4).as("dispersion_ratio"),
      round(when(col("v") > col("m"),
        col("m") * col("m") / (col("v") - col("m"))), 4).as("nb_r"),
      round(when(col("v") > col("m"),
        (col("m") * col("m") / (col("v") - col("m"))) /
          (col("m") * col("m") / (col("v") - col("m")) + col("m"))), 6)
        .as("nb_p"),
      round(when(col("v") > col("m"),
        pow((col("m") * col("m") / (col("v") - col("m"))) /
          (col("m") * col("m") / (col("v") - col("m")) + col("m")),
          col("m") * col("m") / (col("v") - col("m")))), 6)
        .as("pred_zero_share"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_isotonic" -> (extIsotonic _),
    "ext_betabinomial" -> (extBetabinomial _),
    "ext_negbin" -> (extNegbin _))

  val oracleSql: Map[String, String] = Map(
    // E-358: identical decile spine, prefix sums, minimax fold
    // (DuckDB: `dec` is reserved, the CTE column is `dc`).
    "ext_isotonic" ->
      """with base as (select c_custkey k,
        |    cast(round(c_acctbal * 100) as bigint) bal,
        |    cast(coalesce(o.y, 0) as bigint) y
        |  from customer
        |  left join (select o_custkey ck, count(*) y from orders
        |    group by 1) o on o.ck = c_custkey),
        |bins as (select dc, cast(count(*) as bigint) n,
        |    cast(sum(y) as bigint) sy
        |  from (select y, ntile(10) over (order by bal, k) dc from base)
        |  group by dc),
        |pre as (select dc, n, sy,
        |    cast(sum(n) over (order by dc) as bigint) cn,
        |    cast(sum(sy) over (order by dc) as bigint) cs
        |  from bins),
        |segs as (select a.dc j, b.dc kk,
        |    cast(b.cs - a.cs + a.sy as double) /
        |      cast(b.cn - a.cn + a.n as double) avg
        |  from pre a join pre b on a.dc <= b.dc),
        |mn as (select p.dc i, p.n, cast(p.sy as double) / p.n raw_mean,
        |    s.j, min(s.avg) minav
        |  from pre p join segs s on s.j <= p.dc and s.kk >= p.dc
        |  group by 1, 2, 3, 4)
        |select i decile, n, round(raw_mean, 4) raw_mean,
        |  round(max(minav), 4) isotonic_fit
        |from mn group by i, n, raw_mean
        |order by decile""".stripMargin,

    // E-359: identical quantized rates, MoM prior, shrink formula.
    "ext_betabinomial" ->
      """with b as (select p_brand,
        |    cast(sum(case when l_returnflag = 'R' then 1 else 0 end)
        |      as bigint) x,
        |    cast(count(*) as bigint) n
        |  from lineitem join part on p_partkey = l_partkey
        |  group by 1),
        |q as (select p_brand, x, n,
        |    cast(round(cast(x as double) * 1e9 / n) as bigint) rq
        |  from b),
        |mom as (select cast(count(*) as bigint) g,
        |    cast(sum(rq) as bigint) sr,
        |    sum(cast(rq as hugeint) * rq) srr
        |  from q),
        |st as (select cast(sr as double) / g / 1e9 pbar,
        |    cast(g * srr - cast(sr as hugeint) * sr as double) /
        |      cast(g as double) / cast(g - 1 as double) / 1e18 s2
        |  from mom),
        |pri as (select pbar,
        |    pbar * (case when s2 > 0
        |      then greatest(pbar * (1.0 - pbar) / s2 - 1.0, 0.0)
        |      else 0.0 end) alpha,
        |    (1.0 - pbar) * (case when s2 > 0
        |      then greatest(pbar * (1.0 - pbar) / s2 - 1.0, 0.0)
        |      else 0.0 end) beta
        |  from st)
        |select p_brand, n,
        |  round(cast(x as double) / n, 6) raw_rate,
        |  round((cast(x as double) + alpha) /
        |    (cast(n as double) + alpha + beta), 6) shrunk_rate,
        |  round(abs(round((cast(x as double) + alpha) /
        |      (cast(n as double) + alpha + beta), 6) -
        |    round(cast(x as double) / n, 6)), 6) shift
        |from q cross join pri
        |order by shift desc, p_brand limit 15""".stripMargin,

    // E-360: identical exact moments, boundary guard, closed forms.
    "ext_negbin" ->
      """with c as (select cast(count(*) as hugeint) n
        |  from events group by user_id),
        |mom as (select cast(count(*) as bigint) u,
        |    sum(n) sn, sum(n * n) snn
        |  from c),
        |st as (select u, cast(sn as double) / u m,
        |    cast(u * snn - sn * sn as double) / cast(u as double) /
        |      cast(u - 1 as double) v
        |  from mom)
        |select u n_users, round(m, 4) mean_events,
        |  round(v / m, 4) dispersion_ratio,
        |  round(case when v > m then m * m / (v - m) end, 4) nb_r,
        |  round(case when v > m then (m * m / (v - m)) /
        |    (m * m / (v - m) + m) end, 6) nb_p,
        |  round(case when v > m then pow((m * m / (v - m)) /
        |    (m * m / (v - m) + m), m * m / (v - m)) end, 6)
        |    pred_zero_share
        |from st""".stripMargin)
}
