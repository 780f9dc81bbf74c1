package graft.ops

import graft.Tables
import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 39: model diagnostics — McNemar's
  * paired test and Cochran's Q over deterministic document judges
  * (INTEGER closed forms), a lag-1 Granger-causality F on daily event
  * counts (2-regressor OLS from exact integer moments), and the
  * Durbin–Watson serial-correlation statistic on quantized residuals.
  * Completes the inference family with the MODEL-comparison layer
  * (agreement E-72 kappa; k-group E-243..E-246).
  */
object ExtensionQueries39 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Three deterministic binary "judges" over each document. */
  private def judges(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityFeatures(t(s, dir, "documents"))
      .select(col("doc_id"),
        (col("quality") >= 0.5).cast("long").as("ja"),
        (col("n_tokens") >= 60).cast("long").as("jb"),
        (col("distinct_ratio") >= 0.7).cast("long").as("jc"))

  // ---- E-272 McNemar's test ------------------------------------------------------
  // Do two keep/drop judges disagree SYSTEMATICALLY (not just often)?
  // Only the discordant cells matter: b = A-keep/B-drop, c = the
  // reverse; χ² = (|b−c|−1)²/(b+c) with continuity correction, and the
  // 5% verdict decided by INTEGER cross-multiply — the paired
  // comparison Cohen's κ (E-72) doesn't test.
  def extMcnemar(s: SparkSession, dir: String): DataFrame =
    judges(s, dir).agg(count(lit(1)).as("n"),
        sum(when(col("ja") === 1 && col("jb") === 0, 1L).otherwise(0L))
          .as("b"),
        sum(when(col("ja") === 0 && col("jb") === 1, 1L).otherwise(0L))
          .as("c"))
      .select(col("n"), col("b"), col("c"),
        // zero-disagreement guard: b + c = 0 would divide by zero under
        // ANSI mode (and the test is undefined) — report null / false
        when(col("b") + col("c") > 0,
          round((abs(col("b") - col("c")) - 1).cast("double") *
            (abs(col("b") - col("c")) - 1) / (col("b") + col("c")), 4))
          .as("chisq"),
        (col("b") + col("c") > 0 &&
          (abs(col("b") - col("c")) - 1) * (abs(col("b") - col("c")) - 1) *
          1000 > (col("b") + col("c")) * 3841).as("significant"))

  // ---- E-273 Cochran's Q ---------------------------------------------------------
  // The k=3 extension: do the three judges have the same keep rate?
  // Q = (k−1)·[k·ΣGⱼ² − (ΣG)²] / (k·ΣLᵢ − ΣLᵢ²) — G are judge totals,
  // L per-doc positive counts — every term an exact integer, one
  // division at the end.
  def extCochranq(s: SparkSession, dir: String): DataFrame = {
    val j = judges(s, dir)
      .withColumn("li", col("ja") + col("jb") + col("jc"))
    j.agg(count(lit(1)).as("n_docs"),
        sum("ja").as("ga"), sum("jb").as("gb"), sum("jc").as("gc"),
        sum("li").as("sl"), sum(col("li") * col("li")).as("sll"))
      .select(col("n_docs"), col("ga"), col("gb"), col("gc"),
        round(lit(2.0) *
          (lit(3) * (col("ga") * col("ga") + col("gb") * col("gb") +
            col("gc") * col("gc")) -
            (col("ga") + col("gb") + col("gc")) *
            (col("ga") + col("gb") + col("gc"))).cast("double") /
          (lit(3) * col("sl") - col("sll")), 4).as("q"),
        ((lit(3) * (col("ga") * col("ga") + col("gb") * col("gb") +
          col("gc") * col("gc")) -
          (col("ga") + col("gb") + col("gc")) *
          (col("ga") + col("gb") + col("gc"))) * 2 * 1000 >
          (lit(3) * col("sl") - col("sll")) * 5991).as("significant"))
  }

  // ---- E-274 Granger causality (lag 1) -------------------------------------------
  // Do yesterday's views help predict today's purchases beyond
  // yesterday's purchases? Restricted (y ~ y₋₁) vs unrestricted
  // (y ~ y₋₁ + x₋₁) OLS, both in closed form from EXACT integer
  // daily-count moments (centered via n·Σ − Σ·Σ cross-multiplies);
  // F = (RSS_r − RSS_u)/(RSS_u/(n−3)). Windows run over the ~30-row
  // day series.
  def extGranger(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("dy"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x"))
    val w = Window.orderBy("dy")
    val lagged = daily
      .withColumn("z1", lag("y", 1).over(w))
      .withColumn("z2", lag("x", 1).over(w))
      .filter(col("z1").isNotNull)
      .select(col("y").cast("decimal(38,0)").as("y"),
        col("z1").cast("decimal(38,0)").as("z1"),
        col("z2").cast("decimal(38,0)").as("z2"))
    val m = lagged.agg(count(lit(1)).as("n"),
      sum("y").as("sy"), sum("z1").as("s1"), sum("z2").as("s2"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("z1") * col("z1")).as("s11"),
      sum(col("z2") * col("z2")).as("s22"),
      sum(col("z1") * col("z2")).as("s12"),
      sum(col("z1") * col("y")).as("s1y"),
      sum(col("z2") * col("y")).as("s2y"))
    m.select(col("n"),
        (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
          .as("cyy"),
        (col("n") * col("s11") - col("s1") * col("s1")).cast("double")
          .as("c11"),
        (col("n") * col("s22") - col("s2") * col("s2")).cast("double")
          .as("c22"),
        (col("n") * col("s12") - col("s1") * col("s2")).cast("double")
          .as("c12"),
        (col("n") * col("s1y") - col("s1") * col("sy")).cast("double")
          .as("c1y"),
        (col("n") * col("s2y") - col("s2") * col("sy")).cast("double")
          .as("c2y"))
      .withColumn("det", col("c11") * col("c22") - col("c12") * col("c12"))
      .withColumn("rss_u", col("cyy") -
        (col("c1y") * (col("c1y") * col("c22") - col("c2y") * col("c12")) +
          col("c2y") * (col("c2y") * col("c11") - col("c1y") * col("c12"))) /
          col("det"))
      .withColumn("rss_r", col("cyy") - col("c1y") * col("c1y") / col("c11"))
      .select(col("n"),
        round((col("rss_r") - col("rss_u")) /
          (col("rss_u") / (col("n") - 3)), 4).as("f"),
        round(lit(1.0) - col("rss_u") / col("cyy"), 6).as("r2_unrestricted"),
        round(lit(1.0) - col("rss_r") / col("cyy"), 6).as("r2_restricted"))
  }

  // ---- E-275 Durbin–Watson -------------------------------------------------------
  // Serial correlation of daily-revenue OLS residuals: e_t from the
  // exact-moment line fit, QUANTIZED to integer cents (the E-257
  // discipline) so Σ(Δe)² and Σe² are exact decimals and
  // DW = Σ(Δe)²/Σe² is one settled division. DW ≈ 2 ⇒ independent;
  // < 1.5 flags positive autocorrelation (trend left in the
  // residuals).
  def extDw(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("dy"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("yc"))
      .withColumn("xi",
        (row_number().over(Window.orderBy("dy")) - 1).cast("long"))
    val m = daily.agg(count(lit(1)).as("n"),
      sum(col("xi").cast("decimal(38,0)")).as("sx"),
      sum(col("yc").cast("decimal(38,0)")).as("sy"),
      sum(col("xi").cast("decimal(38,0)") * col("yc")).as("sxy"),
      sum(col("xi").cast("decimal(38,0)") * col("xi")).as("sxx"))
    val fitted = daily.crossJoin(broadcast(m))
      .withColumn("beta",
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
      .withColumn("alpha",
        (col("sy").cast("double") - col("beta") * col("sx").cast("double")) /
          col("n"))
      .withColumn("e",
        round(col("yc") - col("alpha") - col("beta") * col("xi"))
          .cast("long").cast("decimal(38,0)"))
      .withColumn("e_prev", lag("e", 1).over(Window.orderBy("dy")))
    fitted.filter(col("e_prev").isNotNull)
      .agg(count(lit(1)).as("n_diffs"),
        sum((col("e") - col("e_prev")) * (col("e") - col("e_prev")))
          .as("sdd"),
        sum(col("e") * col("e")).as("see"))
      .select(col("n_diffs"),
        round(col("sdd").cast("double") / col("see"), 4).as("dw"))
      .withColumn("positive_autocorr", col("dw") < 1.5)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_mcnemar" -> (extMcnemar _),
    "ext_cochranq" -> (extCochranq _),
    "ext_granger" -> (extGranger _),
    "ext_dw" -> (extDw _))

  // The quality/judge CTE shared by E-272/E-273 (the ext_budget oracle's
  // formula verbatim, thresholded into three binary judges).
  private val judgesSql =
    """f as (select doc_id,
      |  cast(len(list_filter(string_split(text,' '), t -> t <> '')) as double) nt,
      |  cast(len(list_filter(string_split(text,' '),
      |    t -> t in ('the','a','of','and','to','in','is','on','for','with'))) as double) nstop,
      |  cast(len(list_distinct(list_filter(string_split(text,' '), t -> t <> ''))) as double) nd,
      |  cast(length(text) as double) nc,
      |  cast(length(regexp_replace(text, '[^a-z0-9]', '', 'g')) as double) nalnum
      |  from documents),
      |q as (select doc_id, cast(nt as bigint) n_tokens,
      |  round(case when nt > 0 then
      |    least(cast(1.0 as double), nt / cast(100.0 as double)) * cast(0.4 as double)
      |    + (nd / nt) * cast(0.3 as double)
      |    + (cast(1.0 as double) - nstop / nt) * cast(0.2 as double)
      |    + (case when nc > 0 then nalnum / nc else 0 end) * cast(0.1 as double)
      |  else 0 end, 4) quality,
      |  round(case when nt > 0 then nd / nt else 0 end, 4) distinct_ratio
      |  from f),
      |j as (select doc_id,
      |    case when quality >= 0.5 then 1 else 0 end ja,
      |    case when n_tokens >= 60 then 1 else 0 end jb,
      |    case when distinct_ratio >= 0.7 then 1 else 0 end jc
      |  from q)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // E-272: identical judges and continuity-corrected integer form,
    // with the same b + c = 0 zero-disagreement guard as the engine.
    "ext_mcnemar" ->
      s"""with $judgesSql,
        |m as (select cast(count(*) as bigint) n,
        |    cast(sum(case when ja = 1 and jb = 0 then 1 else 0 end)
        |      as bigint) b,
        |    cast(sum(case when ja = 0 and jb = 1 then 1 else 0 end)
        |      as bigint) c
        |  from j)
        |select n, b, c,
        |  case when b + c > 0 then
        |    round(cast((abs(b - c) - 1) * (abs(b - c) - 1) as double)
        |      / (b + c), 4) end chisq,
        |  (b + c > 0 and
        |    (abs(b - c) - 1) * (abs(b - c) - 1) * 1000 > (b + c) * 3841)
        |    significant
        |from m""".stripMargin,

    // E-273: identical integer Q (5.991 = χ²₀.₀₅,df=2, cross-multiplied).
    "ext_cochranq" ->
      s"""with $judgesSql,
        |li as (select doc_id, ja, jb, jc, ja + jb + jc l from j),
        |agg as (select cast(count(*) as bigint) n_docs,
        |    cast(sum(ja) as bigint) ga, cast(sum(jb) as bigint) gb,
        |    cast(sum(jc) as bigint) gc,
        |    cast(sum(l) as bigint) sl, cast(sum(l * l) as bigint) sll
        |  from li)
        |select n_docs, ga, gb, gc,
        |  round(2.0 * cast(3 * (ga * ga + gb * gb + gc * gc)
        |    - (ga + gb + gc) * (ga + gb + gc) as double)
        |    / (3 * sl - sll), 4) q,
        |  (3 * (ga * ga + gb * gb + gc * gc)
        |    - (ga + gb + gc) * (ga + gb + gc)) * 2 * 1000
        |    > (3 * sl - sll) * 5991 significant
        |from agg""".stripMargin,

    // E-274: identical exact-moment normal equations.
    "ext_granger" ->
      """with daily as (select cast(ts as date) dy,
        |    cast(sum(case when event_type = 'purchase' then 1 else 0 end)
        |      as bigint) y,
        |    cast(sum(case when event_type = 'view' then 1 else 0 end)
        |      as bigint) x
        |  from events group by 1),
        |lagged as (select cast(y as hugeint) y,
        |    cast(lag(y) over (order by dy) as hugeint) z1,
        |    cast(lag(x) over (order by dy) as hugeint) z2
        |  from daily qualify z1 is not null),
        |m as (select cast(count(*) as bigint) n, sum(y) sy, sum(z1) s1,
        |    sum(z2) s2, sum(y * y) syy, sum(z1 * z1) s11,
        |    sum(z2 * z2) s22, sum(z1 * z2) s12, sum(z1 * y) s1y,
        |    sum(z2 * y) s2y
        |  from lagged),
        |c as (select n,
        |    cast(n * syy - sy * sy as double) cyy,
        |    cast(n * s11 - s1 * s1 as double) c11,
        |    cast(n * s22 - s2 * s2 as double) c22,
        |    cast(n * s12 - s1 * s2 as double) c12,
        |    cast(n * s1y - s1 * sy as double) c1y,
        |    cast(n * s2y - s2 * sy as double) c2y
        |  from m),
        |r as (select n, cyy,
        |    cyy - (c1y * (c1y * c22 - c2y * c12)
        |      + c2y * (c2y * c11 - c1y * c12))
        |      / (c11 * c22 - c12 * c12) rss_u,
        |    cyy - c1y * c1y / c11 rss_r
        |  from c)
        |select n, round((rss_r - rss_u) / (rss_u / (n - 3)), 4) f,
        |  round(1.0 - rss_u / cyy, 6) r2_unrestricted,
        |  round(1.0 - rss_r / cyy, 6) r2_restricted
        |from r""".stripMargin,

    // E-275: identical fit, quantized residuals, exact DW sums.
    "ext_dw" ->
      """with daily as (select cast(o_orderdate as date) dy,
        |    cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint) yc
        |  from orders group by 1),
        |ix as (select dy, yc,
        |    cast(row_number() over (order by dy) as bigint) - 1 xi
        |  from daily),
        |m as (select cast(count(*) as bigint) n,
        |    sum(cast(xi as hugeint)) sx, sum(cast(yc as hugeint)) sy,
        |    sum(cast(xi as hugeint) * yc) sxy,
        |    sum(cast(xi as hugeint) * xi) sxx
        |  from ix),
        |f as (select dy, yc, xi,
        |    cast(n * sxy - sx * sy as double)
        |      / cast(n * sxx - sx * sx as double) beta,
        |    n, sx, sy from ix cross join m),
        |e0 as (select dy,
        |    cast(round(yc - (cast(sy as double) - beta
        |      * cast(sx as double)) / n - beta * xi) as hugeint) e
        |  from f),
        |d as (select e, lag(e) over (order by dy) e_prev from e0)
        |select cast(count(*) as bigint) n_diffs,
        |  round(cast(sum((e - e_prev) * (e - e_prev)) as double)
        |    / cast(sum(e * e) as double), 4) dw,
        |  round(cast(sum((e - e_prev) * (e - e_prev)) as double)
        |    / cast(sum(e * e) as double), 4) < 1.5 positive_autocorr
        |from d where e_prev is not null""".stripMargin)
}
