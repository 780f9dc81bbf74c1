package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 extension queries, batch 113: time-series DIAGNOSTIC tests
  * completing the E-275 (Durbin-Watson, lag-1) / E-102 (ACF,
  * descriptive) family — a simplified Dickey-Fuller unit-root check
  * (is the revenue series mean-reverting or a random walk?) and the
  * Ljung-Box portmanteau (are lags 1..7 JOINTLY white noise?). Both
  * follow the E-446 exactness split: every sufficient statistic is an
  * exact decimal(38,0) cross-multiplied sum; only the final test
  * statistic is a settled float computed by the IDENTICAL expression
  * on both engines.
  */
object ExtensionQueries113 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private val s38 = "decimal(38,0)"

  private def daily(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("dy")
    t(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("dy"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
      .withColumn("x", row_number().over(w).cast("long"))
  }

  // ---- E-454 simplified Dickey-Fuller ------------------------------------------------
  // Regress Δy_t on y_{t-1} (with intercept): slope ≈ 0 ⇒ random walk
  // (differences carry no pull-back), slope « 0 ⇒ mean reversion. The
  // slope A∕B and its t-statistic come from three exact decimal
  // sufficient statistics A = mΣzd − ΣzΣd, B = mΣz² − (Σz)²,
  // C = mΣd² − (Σd)²; t = (A∕B) ∕ sqrt((C − A²∕B)∕((m−2)·B)) as one
  // settled float. (The full ADF adds lagged-difference terms —
  // documented simplification, the DF(0) case.)
  def extDickeyFuller(s: SparkSession, dir: String): DataFrame = {
    val d = daily(s, dir)
    val pairs = d.select(col("x"), col("y").as("z"))
      .join(d.select((col("x") - 1).as("x"), col("y").as("ynext")), Seq("x"))
      .select(col("z"), (col("ynext") - col("z")).as("d"))
    val st = pairs.agg(
      count(lit(1)).cast(s38).as("m"),
      sum(col("z")).cast(s38).as("sz"),
      sum(col("d")).cast(s38).as("sd"),
      sum(col("z").cast(s38) * col("z").cast(s38)).as("szz"),
      sum(col("z").cast(s38) * col("d").cast(s38)).as("szd"),
      sum(col("d").cast(s38) * col("d").cast(s38)).as("sdd"))
    st.select(col("m").cast("long").as("n_obs"),
        expr("CAST(m * szd - sz * sd AS DOUBLE)").as("a"),
        expr("CAST(m * szz - sz * sz AS DOUBLE)").as("b"),
        expr("CAST(m * sdd - sd * sd AS DOUBLE)").as("c"),
        col("m").cast("double").as("em"))
      .select(col("n_obs"),
        round(col("a") / col("b"), 8).as("slope8"),
        round((col("a") / col("b")) /
          sqrt((col("c") - col("a") * col("a") / col("b")) /
            ((col("em") - 2) * col("b"))), 4).as("t_stat4"))
  }

  // ---- E-455 Ljung-Box portmanteau ---------------------------------------------------
  // Joint white-noise test over lags 1..7: ρ_k from the exact
  // cross-multiplied autocovariances n²C_k = Σ(n·y_t − S)(n·y_{t+k} − S)
  // (decimal — no float fold), Q_k = n(n+2)·Σ_{j≤k} ρ_j²∕(n−j)
  // accumulated in ascending-k order on a 7-row frame. Q_7 » χ²_7
  // rejects white noise — the formal verdict on top of E-102's
  // descriptive ACF and E-275's lag-1 DW.
  def extLjungBox(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val d = daily(s, dir).localCheckpoint()
    val glob = d.agg(count(lit(1)).cast(s38).as("nn"),
      sum("y").cast(s38).as("sy")).limit(1)
    val spine = (1 to 7).map(_.toLong).toDF("k").limit(8)
    val lagged = d.select(col("x"), col("y").as("ya"))
      .crossJoin(broadcast(spine))
      .join(d.select(col("x").as("xb"), col("y").as("yb")),
        col("xb") === col("x") + col("k"))
    val covs = lagged.crossJoin(broadcast(glob))
      .groupBy("k")
      .agg(sum((expr(s"CAST(nn AS DECIMAL(38,0)) * ya") - col("sy")) *
        (expr(s"CAST(nn AS DECIMAL(38,0)) * yb") - col("sy"))).as("n2ck"))
    val c0 = d.crossJoin(broadcast(glob))
      .agg(sum((expr(s"CAST(nn AS DECIMAL(38,0)) * y") - col("sy")) *
        (expr(s"CAST(nn AS DECIMAL(38,0)) * y") - col("sy"))).as("n2c0"))
      .limit(1)
    val w = Window.orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    covs.crossJoin(broadcast(c0)).crossJoin(broadcast(glob))
      .select(col("k"),
        (col("n2ck").cast("double") / col("n2c0").cast("double")).as("rho"),
        col("nn").cast("double").as("en"))
      .withColumn("q",
        sum(col("rho") * col("rho") / (col("en") - col("k"))).over(w) *
          col("en") * (col("en") + 2))
      .select(col("k"), round(col("rho"), 6).as("rho6"),
        round(col("q"), 4).as("q4"))
      .orderBy("k")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_dickeyfuller" -> (extDickeyFuller _),
    "ext_ljungbox" -> (extLjungBox _))

  private val dailySql =
    """daily as (select dy, y,
      |    cast(row_number() over (order by dy) as bigint) x from (
      |  select cast(o_orderdate as date) dy,
      |    cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint) y
      |  from orders group by 1) t)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // E-454: identical exact sufficient statistics + settled formula.
    "ext_dickeyfuller" ->
      s"""with $dailySql,
        |pairs as (select a.y z, b.y - a.y d from daily a
        |  join daily b on b.x = a.x + 1),
        |st as (select cast(count(*) as hugeint) m,
        |    cast(sum(z) as hugeint) sz, cast(sum(d) as hugeint) sd,
        |    cast(sum(cast(z as hugeint) * cast(z as hugeint)) as hugeint) szz,
        |    cast(sum(cast(z as hugeint) * cast(d as hugeint)) as hugeint) szd,
        |    cast(sum(cast(d as hugeint) * cast(d as hugeint)) as hugeint) sdd
        |  from pairs),
        |f as (select cast(m as bigint) n_obs,
        |    cast(m * szd - sz * sd as double) a,
        |    cast(m * szz - sz * sz as double) b,
        |    cast(m * sdd - sd * sd as double) c,
        |    cast(m as double) em from st)
        |select n_obs, round(a / b, 8) slope8,
        |  round((a / b) / sqrt((c - a * a / b) / ((em - 2) * b)), 4) t_stat4
        |from f""".stripMargin,

    // E-455: identical exact autocovariances + ascending-k fold.
    "ext_ljungbox" ->
      s"""with $dailySql,
        |g as (select cast(count(*) as hugeint) nn,
        |    cast(sum(y) as hugeint) sy from daily),
        |covs as (select k, cast(sum((g.nn * a.y - g.sy)
        |      * (g.nn * b.y - g.sy)) as hugeint) n2ck
        |  from daily a cross join unnest(generate_series(1, 7)) s(k)
        |  join daily b on b.x = a.x + s.k cross join g
        |  group by k),
        |c0 as (select cast(sum((g.nn * y - g.sy) * (g.nn * y - g.sy))
        |    as hugeint) n2c0 from daily, g),
        |r as (select k, cast(n2ck as double) / cast(n2c0 as double) rho,
        |    cast(nn as double) en from covs, c0, g)
        |select k, round(rho, 6) rho6,
        |  round(sum(rho * rho / (en - k)) over (order by k
        |    rows between unbounded preceding and current row)
        |    * en * (en + 2), 4) q4
        |from r order by k""".stripMargin)
}
