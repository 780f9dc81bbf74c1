package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 61: sequential drift detection and
  * agreement/effect statistics — the Page-Hinkley changepoint score
  * over the daily-revenue series, Krippendorff's alpha for the 3-judge
  * keep/drop panel, and Cliff's delta ordinal effect size computed
  * WITHOUT a pair join (value-level rank trick, exact integers).
  */
object ExtensionQueries61 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-334 Page-Hinkley drift score --------------------------------------------
  // The sequential changepoint monitor: d_t = y_t − ȳ_t (deviation
  // from the RUNNING mean, quantized to 1e-4 before the cumulative
  // fold — E-257), U_T = Σ d_t, PH_T = U_T − min_{t≤T} U_t. A mean
  // shift makes PH climb; the top-15 days by PH are where a monitor
  // would alarm (threshold left to the consumer, E-311 discipline).
  // Windows are unpartitioned but CALENDAR-bounded (day series).
  def extPagehinkley(s: SparkSession, dir: String): DataFrame = {
    val day = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("dy"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
    val w = Window.orderBy("dy")
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = day
      .withColumn("dq",
        round((col("y") -
          sum("y").over(wc).cast("double") / count(lit(1)).over(wc)) * 10000)
          .cast("long"))
      .withColumn("u", sum("dq").over(wc))
      .withColumn("runmin", min("u").over(wc))
      .select(col("dy"), round(col("y") / lit(100.0), 2).as("revenue"),
        round((col("u") - col("runmin")).cast("double") / 1e6, 2)
          .as("ph_dollars"))
    scored.orderBy(desc("ph_dollars"), asc("dy")).limit(15)
  }

  // ---- E-335 Krippendorff's alpha ------------------------------------------------
  // Chance-corrected agreement for the 3-judge binary keep/drop panel:
  // alpha = 1 − D_o/D_e with D_o from within-unit disagreeing rating
  // pairs (2·o_u·(3−o_u) per doc) and D_e from the pooled margins —
  // the multi-rater generalization of kappa (E-72) that Cochran's Q
  // (E-273) tests but does not quantify. Integer tallies, two settled
  // divisions; D_e = 0 (unanimous corpus) reports null.
  def extKrippendorff(s: SparkSession, dir: String): DataFrame = {
    val toksN = size(filter(split(col("text"), " "), x => x =!= ""))
    val j = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        toksN.cast("long").as("nt"),
        size(array_distinct(filter(split(col("text"), " "),
          x => x =!= ""))).cast("long").as("nd"))
      .select(
        (col("nt") >= 60).cast("long").as("ja"),
        (col("n_chars") >= 300).cast("long").as("jb"),
        (col("nd") >= 40).cast("long").as("jc"))
      .withColumn("o", col("ja") + col("jb") + col("jc"))
    j.agg(count(lit(1)).as("n"),
        sum(col("o") * (lit(3) - col("o")) * 2).as("dis_pairs"),
        sum("o").as("n1"))
      .select(col("n"), col("n1"), (col("n") * 3 - col("n1")).as("n0"),
        round(col("dis_pairs").cast("double") / (col("n") * 6), 6)
          .as("d_o"),
        when(col("n1") > 0 && col("n") * 3 > col("n1"),
          round(lit(1.0) -
            (col("dis_pairs").cast("double") / (col("n") * 6)) /
            (lit(2.0) * col("n1") * (col("n") * 3 - col("n1")) /
              (col("n") * 3).cast("double") /
              (col("n") * 3 - 1).cast("double")), 6))
          .as("alpha"))
  }

  // ---- E-336 Cliff's delta -------------------------------------------------------
  // Ordinal effect size for purchase-vs-click event values:
  // δ = (#(x>y) − #(x<y)) / (n_x·n_y), computed EXACTLY without the
  // O(n²) pair join — collapse to the value level (cents), then one
  // cumulative count over ascending value gives every x's count of
  // smaller/larger y. The domain-bounded value spine keeps the window
  // safe at any row count. Ties contribute to neither side (standard
  // Cliff). Complements ext_mannwhitney's p-value with a magnitude.
  def extCliffsdelta(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .filter(col("event_type").isin("purchase", "click"))
      .select(round(col("value") * 100).cast("long").as("v"),
        (col("event_type") === "purchase").cast("long").as("isx"))
    val byVal = e.groupBy("v")
      .agg(sum("isx").as("nx"), sum(lit(1) - col("isx")).as("ny"))
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val cum = byVal
      .withColumn("ny_le", sum("ny").over(w))
      .withColumn("ny_below", col("ny_le") - col("ny"))
      .withColumn("ny_tot", max("ny_le").over(Window.partitionBy()))
    cum.agg(sum("nx").as("n_x"), sum("ny").as("n_y"),
        sum(col("nx") * col("ny_below")).as("gt"),
        sum(col("nx") * (col("ny_tot") - col("ny_le"))).as("lt"))
      .select(col("n_x"), col("n_y"), col("gt"), col("lt"),
        round((col("gt") - col("lt")).cast("double") /
          (col("n_x") * col("n_y")), 6).as("cliffs_delta"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_pagehinkley" -> (extPagehinkley _),
    "ext_krippendorff" -> (extKrippendorff _),
    "ext_cliffsdelta" -> (extCliffsdelta _))

  val oracleSql: Map[String, String] = Map(
    // E-334: identical running-mean quantization and prefix-min fold.
    "ext_pagehinkley" ->
      """with day as (select cast(o_orderdate as date) dy,
        |    cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint) y
        |  from orders group by 1),
        |d as (select dy, y,
        |    cast(round((y - cast(sum(y) over wc as double) /
        |      count(*) over wc) * 10000) as bigint) dq
        |  from day
        |  window wc as (order by dy rows unbounded preceding)),
        |u as (select dy, y, sum(dq) over wc u
        |  from d window wc as (order by dy rows unbounded preceding)),
        |ph as (select dy, y,
        |    u - min(u) over (order by dy rows unbounded preceding) ph
        |  from u)
        |select dy, round(y / 100.0, 2) revenue,
        |  round(cast(ph as double) / 1e6, 2) ph_dollars
        |from ph order by ph_dollars desc, dy limit 15""".stripMargin,

    // E-335: identical judges, tallies, and chance correction.
    "ext_krippendorff" ->
      """with j as (select
        |    case when len(list_filter(string_split(text, ' '),
        |      w -> w <> '')) >= 60 then 1 else 0 end ja,
        |    case when n_chars >= 300 then 1 else 0 end jb,
        |    case when len(list_distinct(list_filter(string_split(text, ' '),
        |      w -> w <> ''))) >= 40 then 1 else 0 end jc
        |  from documents),
        |o as (select ja + jb + jc o from j),
        |agg as (select cast(count(*) as bigint) n,
        |    cast(sum(o * (3 - o) * 2) as bigint) dis_pairs,
        |    cast(sum(o) as bigint) n1
        |  from o)
        |select n, n1, n * 3 - n1 n0,
        |  round(cast(dis_pairs as double) / (n * 6), 6) d_o,
        |  case when n1 > 0 and n * 3 > n1 then
        |    round(1.0 - (cast(dis_pairs as double) / (n * 6)) /
        |      (2.0 * n1 * (n * 3 - n1) / cast(n * 3 as double) /
        |        cast(n * 3 - 1 as double)), 6) end alpha
        |from agg""".stripMargin,

    // E-336: identical value-level collapse and cumulative counts.
    "ext_cliffsdelta" ->
      """with e as (select cast(round(value * 100) as bigint) v,
        |    case when event_type = 'purchase' then 1 else 0 end isx
        |  from events where event_type in ('purchase', 'click')),
        |bv as (select v, cast(sum(isx) as bigint) nx,
        |    cast(sum(1 - isx) as bigint) ny
        |  from e group by v),
        |cum as (select v, nx, ny,
        |    cast(sum(ny) over (order by v rows unbounded preceding)
        |      as bigint) ny_le
        |  from bv),
        |tot as (select max(ny_le) ny_tot from cum)
        |select cast(sum(nx) as bigint) n_x, cast(sum(ny) as bigint) n_y,
        |  cast(sum(nx * (ny_le - ny)) as bigint) gt,
        |  cast(sum(nx * (ny_tot - ny_le)) as bigint) lt,
        |  round(cast(sum(nx * (ny_le - ny)) - sum(nx * (ny_tot - ny_le))
        |      as double) /
        |    (sum(nx) * sum(ny)), 6) cliffs_delta
        |from cum cross join tot""".stripMargin)
}
