package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 extension queries, batch 106: robust estimation and
  * regression diagnostics — Huber M-location by IRLS with QUANTIZED
  * integer weights (the robust mean that, unlike the E-46 MAD screen,
  * still USES soft outliers instead of discarding them) and OLS
  * influence diagnostics (leverage + Cook's distance — which single
  * days could be steering the trend line).
  */
object ExtensionQueries106 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Sign-safe half-up integer division num/den (den > 0) — both
    * engines truncate |num| identically where floor-vs-truncate
    * would diverge on negatives.
    */
  private def halfUp(num: String, den: String): String =
    s"CAST(signum($num) * ((2 * abs($num) + $den) DIV (2 * $den)) AS LONG)"

  // ---- E-445 Huber M-location (IRLS, integer weights) ------------------------------
  // Robust center of customer balances: 3 IRLS rounds with Huber
  // weights w = min(1, k/|x − μ|) at k = $1500, carried as 1e6-scaled
  // LONGS so the reweighted mean Σwx/Σw folds exact integers in any
  // order (the settled-fold discipline applied to M-estimation); μ
  // re-quantizes to whole cents per round by sign-safe half-up
  // division. Start μ₀ = the half-up integer mean. The per-round
  // trace (μ, Σw, #full-weight points) IS the contract — one
  // aggregate per round, map-side combinable, no sort, no median.
  def extHuber(s: SparkSession, dir: String): DataFrame = {
    val cents = t(s, dir, "customer")
      .select(round(col("c_acctbal") * 100).cast("long").as("x"))
      .localCheckpoint()
    val k = 150000L
    val mu0 = cents.agg(sum("x").as("sn"), count(lit(1)).as("nn"))
      .select(expr(halfUp("sn", "nn")).as("mu"))
    var state = mu0
    var out: DataFrame = null
    for (round <- 1 to 3) {
      val weighted = cents.crossJoin(broadcast(state.limit(1)))
        .select(col("x"), col("mu"),
          when(abs(col("x") - col("mu")) <= k, lit(1000000L))
            .otherwise(expr(
              s"(CAST($k AS BIGINT) * 1000000) DIV abs(x - mu)")).as("w"))
      val agg = weighted.agg(
        sum(col("w") * col("x")).as("swx"), sum(col("w")).as("sw"),
        sum(when(col("w") === 1000000L, 1L).otherwise(0L)).as("n_full"))
      val next = agg.select(expr(halfUp("swx", "sw")).as("mu"),
        col("sw"), col("n_full")).localCheckpoint()
      val row = next.select(lit(round.toLong).as("rnd"),
        col("mu").as("mu_cents"), col("sw").as("sum_w"), col("n_full"))
      out = if (out == null) row else out.unionAll(row)
      state = next.select("mu")
    }
    out.orderBy("rnd")
  }

  // ---- E-446 OLS influence diagnostics --------------------------------------------
  // Leverage and Cook's distance for the daily-revenue-vs-time
  // regression: which single days could steer the fitted trend.
  // Everything that can be exact IS exact: the normal-equation terms
  // A = nΣxy − ΣxΣy, B = nΣx² − (Σx)² in decimal(38,0); the residual
  // numerator E_i = nBy_i − BΣy + AΣx − nAx_i is an exact integer and
  // e_i = E_i/(nB) lands on whole cents by sign-safe half-up
  // division; leverage h_i = (B + (nx_i − Σx)²)/(nB) lands on
  // half-up basis points. Only Cook's D itself is a settled float —
  // computed from those identical integers on both engines. Output:
  // the 10 most influential days.
  def extInfluence(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("dy"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
      .select(col("dy"),
        datediff(col("dy"), lit("1992-01-01")).cast("long").as("x"),
        col("y"))
    val s38 = "decimal(38,0)"
    val stats = daily.agg(
      count(lit(1)).cast(s38).as("nn"),
      sum(col("x")).cast(s38).as("sx"),
      sum(col("y")).cast(s38).as("sy"),
      sum(col("x").cast(s38) * col("y").cast(s38)).as("sxy"),
      sum(col("x").cast(s38) * col("x").cast(s38)).as("sxx"))
      .select(col("nn"), col("sx"), col("sy"),
        (col("nn") * col("sxy") - col("sx") * col("sy")).as("aa"),
        (col("nn") * col("sxx") - col("sx") * col("sx")).as("bb"))
    val withE = daily.crossJoin(broadcast(stats.limit(1)))
      .select(col("dy"), col("x"), col("y"),
        expr(halfUp(
          "nn * bb * y - bb * sy + aa * sx - nn * aa * x", "nn * bb"))
          .as("e_cents"),
        expr("CAST((20000 * (bb + (nn * x - sx) * (nn * x - sx)) + nn * bb) " +
          "DIV (2 * nn * bb) AS LONG)").as("h_bp"))
      .localCheckpoint()
    // cast the exact decimal SS to double BEFORE the divide — the
    // oracle divides double by int too, so the last bits agree
    val s2 = withE.agg(
      (sum(col("e_cents").cast(s38) * col("e_cents").cast(s38))
        .cast("double") / (count(lit(1)) - 2)).as("s2"))
    withE.crossJoin(broadcast(s2.limit(1)))
      .select(col("dy"), col("e_cents"), col("h_bp"),
        round(col("e_cents").cast("double") * col("e_cents") *
          (col("h_bp") / 1e4) /
          (lit(2.0) * col("s2") *
            (lit(1.0) - col("h_bp") / 1e4) * (lit(1.0) - col("h_bp") / 1e4)),
          6).as("cook6"))
      .orderBy(desc("cook6"), asc("dy"))
      .limit(10)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_huber" -> (extHuber _),
    "ext_influence" -> (extInfluence _))

  // E-445 oracle: identical unrolled IRLS rounds, sign-safe half-up
  // divisions spelled out.
  private def huberOracle(rounds: Int): String = {
    def hu(num: String, den: String) =
      s"cast(case when $num < 0 then -1 else 1 end * " +
        s"((2 * abs($num) + $den) // (2 * $den)) as bigint)"
    val sb = new StringBuilder
    sb.append(
      """with c as (select cast(round(c_acctbal * 100) as bigint) x
        |  from customer),
        |m0 as (select """.stripMargin)
    sb.append(hu("sum(x)", "count(*)"))
    sb.append(" mu from c),\n")
    for (k <- 1 to rounds) {
      sb.append(s"w$k as (select x, case when abs(x - mu) <= 150000 ")
      sb.append(s"then cast(1000000 as bigint) ")
      sb.append(s"else cast((cast(150000 as bigint) * 1000000) // abs(x - mu) as bigint) end w ")
      sb.append(s"from c, m${k - 1}),\n")
      sb.append(s"a$k as (select cast(sum(w * x) as hugeint) swx, ")
      sb.append(s"cast(sum(w) as bigint) sw, ")
      sb.append(s"cast(count(*) filter (where w = 1000000) as bigint) n_full ")
      sb.append(s"from w$k),\n")
      sb.append(s"m$k as (select ${hu("swx", "sw")} mu, sw, n_full from a$k)")
      sb.append(",\n")
    }
    val rows = (1 to rounds).map(k =>
      s"select cast($k as bigint) rnd, mu mu_cents, sw sum_w, n_full from m$k")
    sb.append(rows.mkString("r as (", " union all ", ")\n"))
    sb.append("select rnd, mu_cents, sum_w, n_full from r order by rnd")
    sb.toString
  }

  val oracleSql: Map[String, String] = Map(
    "ext_huber" -> huberOracle(3),

    // E-446: identical exact normal-equation integers, half-up
    // residual cents and leverage bp, the same settled Cook float.
    "ext_influence" ->
      """with daily as (select cast(o_orderdate as date) dy,
        |    date_diff('day', DATE '1992-01-01', cast(o_orderdate as date)) x,
        |    cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint) y
        |  from orders group by 1, 2),
        |st as (select cast(count(*) as hugeint) nn,
        |    cast(sum(x) as hugeint) sx, cast(sum(y) as hugeint) sy,
        |    cast(sum(cast(x as hugeint) * cast(y as hugeint)) as hugeint) sxy,
        |    cast(sum(cast(x as hugeint) * cast(x as hugeint)) as hugeint) sxx
        |  from daily),
        |ab as (select nn, sx, sy, nn * sxy - sx * sy aa,
        |    nn * sxx - sx * sx bb from st),
        |we as (select dy, x, y,
        |    cast(case when nn * bb * y - bb * sy + aa * sx - nn * aa * x < 0
        |        then -1 else 1 end *
        |      ((2 * abs(nn * bb * y - bb * sy + aa * sx - nn * aa * x)
        |        + nn * bb) // (2 * nn * bb)) as bigint) e_cents,
        |    cast((20000 * (bb + (nn * x - sx) * (nn * x - sx)) + nn * bb)
        |      // (2 * nn * bb) as bigint) h_bp
        |  from daily, ab),
        |sv as (select cast(sum(cast(e_cents as hugeint)
        |      * cast(e_cents as hugeint)) as double)
        |    / (count(*) - 2) s2 from we)
        |select dy, e_cents, h_bp,
        |  round(cast(e_cents as double) * e_cents * (h_bp / 10000.0)
        |    / (2.0 * s2 * (1.0 - h_bp / 10000.0) * (1.0 - h_bp / 10000.0)),
        |    6) cook6
        |from we, sv
        |order by cook6 desc, dy limit 10""".stripMargin)
}
