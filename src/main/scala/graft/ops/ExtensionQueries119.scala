package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 extension queries, batch 119: OLS regression diagnostics
  * completing the E-275 (Durbin-Watson) / E-366 (Ljung-Box) / E-454
  * (Dickey-Fuller) family — a Chow structural-break test (did the
  * trend CHANGE at a known date?) and the Breusch-Pagan
  * heteroskedasticity test (does residual variance drift with the
  * regressor?). Discipline: every sufficient statistic is an exact
  * decimal cross-multiplied sum; slopes/intercepts are quantized 1e-9
  * before any per-row reuse; final test statistics are settled floats
  * from the IDENTICAL expression on both engines.
  */
object ExtensionQueries119 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private val d38 = "decimal(38,0)"

  private def daily(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("dy")
    t(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("dy"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
      .withColumn("x", row_number().over(w).cast("long"))
  }

  /** Exact regression moments of one segment, as a 1-row frame:
    * (m, sx, sy, sxx, sxy, syy) all decimal(38,0). SSR is then the
    * settled float (syy − sy²/m) − (sxy − sx·sy/m)²/(sxx − sx²/m),
    * computed in its cross-multiplied form to stay exact until one
    * final division pair.
    */
  private def moments(seg: DataFrame, tag: String) =
    seg.agg(
      count(lit(1)).cast(d38).as(s"m_$tag"),
      sum(col("x")).cast(d38).as(s"sx_$tag"),
      sum(col("y")).cast(d38).as(s"sy_$tag"),
      sum(col("x").cast(d38) * col("x").cast(d38)).as(s"sxx_$tag"),
      sum(col("x").cast(d38) * col("y").cast(d38)).as(s"sxy_$tag"),
      sum(col("y").cast(d38) * col("y").cast(d38)).as(s"syy_$tag"))

  /** SSR of a segment from its exact moments: m·SSR·m = ... rendered as
    * (m·syy − sy²)/m − (m·sxy − sx·sy)² / (m · (m·sxx − sx²)) with each
    * parenthesized factor an exact decimal cast to double once.
    */
  private def ssrExpr(tag: String): String =
    s"""(cast(m_$tag * syy_$tag - sy_$tag * sy_$tag as double) -
        cast(m_$tag * sxy_$tag - sx_$tag * sy_$tag as double) *
        cast(m_$tag * sxy_$tag - sx_$tag * sy_$tag as double) /
        cast(m_$tag * sxx_$tag - sx_$tag * sx_$tag as double)) /
       cast(m_$tag as double)"""

  // ---- E-465 Chow structural-break test --------------------------------------------------
  // Did the revenue trend change at the series midpoint? Fit y = a+b·x
  // on the full series and on each half; F = ((SSR_f − SSR_1 − SSR_2)/2)
  // / ((SSR_1 + SSR_2)/(n − 4)). The midpoint split is itself derived
  // in-plan from the exact day count (break = n div 2), every SSR comes
  // from exact decimal moments, and F is one settled float. F » 1 ⇒ the
  // two halves want different lines (break), F ≈ 1 ⇒ one line suffices.
  def extChow(s: SparkSession, dir: String): DataFrame = {
    val d = daily(s, dir)
    val withBrk = d.crossJoin(broadcast(
      d.agg((count(lit(1)) / 2).cast("long").as("brk"))))
    val seg1 = withBrk.filter(col("x") <= col("brk"))
    val seg2 = withBrk.filter(col("x") > col("brk"))
    moments(d, "f").crossJoin(broadcast(moments(seg1, "a")))
      .crossJoin(broadcast(moments(seg2, "b")))
      .select(
        col("m_f").cast("long").as("n_days"),
        col("m_a").cast("long").as("n_pre"),
        // SSRs reported in 1e12 cents² units: round(x, s) on a double
        // whose magnitude overflows llround(x·10^s) diverges by 1 ulp
        // between engines (measured at sf0.1) — scale BEFORE rounding
        round(expr(ssrExpr("f")) / 1e12, 4).as("ssr_full_e12"),
        round((expr(ssrExpr("a")) + expr(ssrExpr("b"))) / 1e12, 4).as("ssr_split_e12"),
        round(
          ((expr(ssrExpr("f")) - expr(ssrExpr("a")) - expr(ssrExpr("b"))) / lit(2.0)) /
            ((expr(ssrExpr("a")) + expr(ssrExpr("b"))) /
              (col("m_f").cast("double") - 4)), 4).as("f_stat4"))
  }

  // ---- E-466 Breusch-Pagan heteroskedasticity test ---------------------------------------
  // Does residual spread drift along the series? OLS y = a + b·x from
  // exact moments (b, a quantized 1e-9 ONCE in a 1-row broadcast);
  // per-day residual rounded to WHOLE DOLLARS — an exact bigint-sized
  // decimal, so e², the auxiliary response, and every auxiliary moment
  // (Σe², Σx·e², Σe⁴) are EXACT decimal folds with zero float
  // summation (dollar units keep Σe⁴ < 1e36 through sf1 — documented
  // headroom choice); LM = n · R²_aux as one settled float, χ²₁ cut
  // 3.841459 pinned (the E-377 constant discipline).
  def extBreuschPagan(s: SparkSession, dir: String): DataFrame = {
    val d = daily(s, dir)
    val fit = moments(d, "f").select(
      col("m_f"), col("sx_f"), col("sy_f"),
      expr("""cast(round(cast(m_f * sxy_f - sx_f * sy_f as double) /
              cast(m_f * sxx_f - sx_f * sx_f as double), 9)
              as decimal(20,9))""").as("b9"))
      .select(col("b9"),
        expr("""cast(round((cast(sy_f as double) -
                cast(b9 as double) * cast(sx_f as double)) /
                cast(m_f as double), 9) as decimal(29,9))""").as("a9"),
        col("b9").as("b9k"))
      .select(col("a9"), col("b9k").as("b9"))
    val resid = d.crossJoin(broadcast(fit))
      .select(col("x"),
        expr("""cast(round(
            (cast(y as double) - cast(a9 as double) -
             cast(b9 as double) * cast(x as double)) / 100)
            as decimal(38,0))""").as("e"))
    val aux = resid.agg(
      count(lit(1)).cast(d38).as("m"),
      sum(col("x")).cast(d38).as("sx"),
      sum(col("x").cast(d38) * col("x").cast(d38)).as("sxx"),
      sum(col("e") * col("e")).as("se"),
      sum(col("x").cast(d38) * col("e") * col("e")).as("sxe"),
      sum(col("e") * col("e") * col("e") * col("e")).as("see"))
    aux.select(col("m").cast("long").as("n_days"),
        round(
          col("m").cast("double") *
            (expr("cast(m as double) * cast(sxe as double) - cast(sx as double) * cast(se as double)") *
             expr("cast(m as double) * cast(sxe as double) - cast(sx as double) * cast(se as double)")) /
            (expr("cast(m as double) * cast(sxx as double) - cast(sx as double) * cast(sx as double)") *
             expr("cast(m as double) * cast(see as double) - cast(se as double) * cast(se as double)")), 4)
          .as("lm4"))
      .withColumn("reject_homosked", col("lm4") > 3.841459)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_chow" -> (extChow _),
    "ext_breuschpagan" -> (extBreuschPagan _))

  private val dailySql =
    """daily as (select dy, y,
      |    cast(row_number() over (order by dy) as bigint) x from (
      |  select cast(o_orderdate as date) dy,
      |    cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint) y
      |  from orders group by 1) t)""".stripMargin

  private def momentsSql(src: String, tag: String): String =
    s"""select cast(count(*) as hugeint) m_$tag,
       |    cast(sum(x) as hugeint) sx_$tag, cast(sum(y) as hugeint) sy_$tag,
       |    cast(sum(cast(x as hugeint) * cast(x as hugeint)) as hugeint) sxx_$tag,
       |    cast(sum(cast(x as hugeint) * cast(y as hugeint)) as hugeint) sxy_$tag,
       |    cast(sum(cast(y as hugeint) * cast(y as hugeint)) as hugeint) syy_$tag
       |  from $src""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // E-465: identical exact moments per segment + settled F.
    "ext_chow" ->
      s"""with $dailySql,
        |brk as (select cast(count(*) // 2 as bigint) brk from daily),
        |seg1 as (select d.* from daily d cross join brk where d.x <= brk.brk),
        |seg2 as (select d.* from daily d cross join brk where d.x > brk.brk),
        |mf as (${momentsSql("daily", "f")}),
        |ma as (${momentsSql("seg1", "a")}),
        |mb as (${momentsSql("seg2", "b")})
        |select cast(m_f as bigint) n_days, cast(m_a as bigint) n_pre,
        |  round((${ssrExpr("f")}) / 1e12, 4) ssr_full_e12,
        |  round((${ssrExpr("a")} + ${ssrExpr("b")}) / 1e12, 4) ssr_split_e12,
        |  round(((${ssrExpr("f")} - ${ssrExpr("a")} - ${ssrExpr("b")}) / 2.0) /
        |    ((${ssrExpr("a")} + ${ssrExpr("b")}) / (cast(m_f as double) - 4)), 4)
        |    f_stat4
        |from mf cross join ma cross join mb""".stripMargin,
    // E-466: identical quantized fit + quantized e² + settled LM.
    "ext_breuschpagan" ->
      s"""with $dailySql,
        |mf as (${momentsSql("daily", "f")}),
        |fit0 as (select m_f, sx_f, sy_f,
        |    cast(round(cast(m_f * sxy_f - sx_f * sy_f as double) /
        |      cast(m_f * sxx_f - sx_f * sx_f as double), 9) as decimal(20,9)) b9
        |  from mf),
        |fit as (select
        |    cast(round((cast(sy_f as double) -
        |      cast(b9 as double) * cast(sx_f as double)) /
        |      cast(m_f as double), 9) as decimal(29,9)) a9, b9
        |  from fit0),
        |resid as (select x,
        |    cast(round(
        |      (cast(y as double) - cast(a9 as double) -
        |       cast(b9 as double) * cast(x as double)) / 100)
        |      as hugeint) e
        |  from daily cross join fit),
        |aux as (select cast(count(*) as hugeint) m,
        |    cast(sum(x) as hugeint) sx,
        |    cast(sum(cast(x as hugeint) * cast(x as hugeint)) as hugeint) sxx,
        |    sum(e * e) se,
        |    sum(cast(x as hugeint) * e * e) sxe,
        |    sum(e * e * e * e) see
        |  from resid)
        |select cast(m as bigint) n_days,
        |  round(cast(m as double) *
        |    ((cast(m as double) * cast(sxe as double) -
        |      cast(sx as double) * cast(se as double)) *
        |     (cast(m as double) * cast(sxe as double) -
        |      cast(sx as double) * cast(se as double))) /
        |    ((cast(m as double) * cast(sxx as double) -
        |      cast(sx as double) * cast(sx as double)) *
        |     (cast(m as double) * cast(see as double) -
        |      cast(se as double) * cast(se as double))), 4) lm4,
        |  round(cast(m as double) *
        |    ((cast(m as double) * cast(sxe as double) -
        |      cast(sx as double) * cast(se as double)) *
        |     (cast(m as double) * cast(sxe as double) -
        |      cast(sx as double) * cast(se as double))) /
        |    ((cast(m as double) * cast(sxx as double) -
        |      cast(sx as double) * cast(sx as double)) *
        |     (cast(m as double) * cast(see as double) -
        |      cast(se as double) * cast(se as double))), 4) > 3.841459
        |    reject_homosked
        |from aux""".stripMargin)
}
