package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 89: exact distribution distances —
  * 1-D Wasserstein-1, total variation, and the energy distance between
  * the BUILDING segment and the rest, every statistic an exact
  * integer/decimal computation until one final division (no binning,
  * no sampling, no float folds).
  */
object ExtensionQueries89 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Value-collapsed balance grid: per distinct cent value, counts in
    * group A (BUILDING) and B (rest), with prefix sums and the gap to
    * the next value — the shared spine of all three distances.
    */
  private def grid(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(round(col("c_acctbal") * 100).cast("long").as("v"),
        (col("c_mktsegment") === "BUILDING").as("ga"))
    val byVal = c.groupBy("v")
      .agg(sum(when(col("ga"), 1L).otherwise(0L)).as("av"),
        sum(when(!col("ga"), 1L).otherwise(0L)).as("bv"))
    val w = Window.orderBy("v")
    byVal
      .withColumn("cuma", sum("av").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cumb", sum("bv").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("gap", coalesce(lead("v", 1).over(w) - col("v"),
        lit(0L)))
  }

  // ---- E-411 exact Wasserstein-1 distance ----------------------------------------
  // How much "work" separates the two balance distributions? W₁ =
  // ∫|F_A−F_B| dx computed EXACTLY on the value-collapsed grid:
  // Σ gap·|cumA·n_B − cumB·n_A| as one decimal fold, divided once by
  // n_A·n_B at the end — no binning, no float CDFs. Reported in
  // dollars; the magnitude-aware complement to KS (E-71).
  def extWasserstein(s: SparkSession, dir: String): DataFrame = {
    val g = grid(s, dir)
    val tot = g.agg(sum("av").as("na"), sum("bv").as("nb")).limit(1)
    g.crossJoin(broadcast(tot))
      .select(col("na"), col("nb"),
        (col("gap").cast("decimal(38,0)") *
          abs(col("cuma") * col("nb") - col("cumb") * col("na")))
          .as("term"))
      .agg(first("na").as("n_building"), first("nb").as("n_other"),
        sum("term").as("s"))
      .select(col("n_building"), col("n_other"),
        round(col("s").cast("double") /
          (col("n_building").cast("double") * col("n_other")
            .cast("double")) / 100, 4).as("w1_dollars"))
  }

  // ---- E-412 total variation distance --------------------------------------------
  // The sharpest bound on how differently any event can be scored by
  // the two distributions: TV = ½Σ|p−q| over the distinct-value
  // grid, cross-multiplied to the exact integer Σ|a_v·n_B − b_v·n_A|
  // — one decimal fold, one final division by 2·n_A·n_B. The
  // bin-free exact form of the PSI-family drift screens.
  def extTotalvariation(s: SparkSession, dir: String): DataFrame = {
    val g = grid(s, dir)
    val tot = g.agg(sum("av").as("na"), sum("bv").as("nb")).limit(1)
    g.crossJoin(broadcast(tot))
      .select(col("na"), col("nb"),
        abs(col("av") * col("nb") - col("bv") * col("na"))
          .cast("decimal(38,0)").as("term"))
      .agg(first("na").as("n_building"), first("nb").as("n_other"),
        sum("term").as("s"))
      .select(col("n_building"), col("n_other"),
        round(col("s").cast("double") /
          (lit(2.0) * col("n_building").cast("double") *
            col("n_other").cast("double")), 6).as("tv_distance"))
  }

  // ---- E-413 energy distance -----------------------------------------------------
  // The modern two-sample statistic: D² = 2·E|X−Y| − E|X−X′| −
  // E|Y−Y′|, each expectation EXACT via the gap identity
  // ΣΣ|x−y| = Σ_t gap_t·(cumA_t·(n_B−cumB_t) + cumB_t·(n_A−cumA_t))
  // (pairs straddling each gap) — three decimal folds over the same
  // grid, three final divisions, zero approximation. Sensitive to ANY
  // distributional difference, not just location.
  def extEnergydist(s: SparkSession, dir: String): DataFrame = {
    val g = grid(s, dir)
    val tot = g.agg(sum("av").as("na"), sum("bv").as("nb")).limit(1)
    val terms = g.crossJoin(broadcast(tot))
      .select(col("na"), col("nb"),
        (col("gap").cast("decimal(38,0)") *
          (col("cuma") * (col("nb") - col("cumb")) +
           col("cumb") * (col("na") - col("cuma")))).as("sab"),
        (col("gap").cast("decimal(38,0)") * lit(2) *
          col("cuma") * (col("na") - col("cuma"))).as("saa"),
        (col("gap").cast("decimal(38,0)") * lit(2) *
          col("cumb") * (col("nb") - col("cumb"))).as("sbb"))
    terms.agg(first("na").as("na"), first("nb").as("nb"),
        sum("sab").as("tab"), sum("saa").as("taa"), sum("sbb").as("tbb"))
      .select(col("na").as("n_building"), col("nb").as("n_other"),
        round((lit(2.0) * col("tab").cast("double") /
          (col("na").cast("double") * col("nb").cast("double")) -
          col("taa").cast("double") /
            (col("na").cast("double") * col("na").cast("double")) -
          col("tbb").cast("double") /
            (col("nb").cast("double") * col("nb").cast("double"))) / 100,
          6).as("energy_dist_dollars"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_wasserstein" -> (extWasserstein _),
    "ext_totalvariation" -> (extTotalvariation _),
    "ext_energydist" -> (extEnergydist _))

  private val gridSql =
    """c as (select cast(round(c_acctbal * 100) as bigint) v,
      |    c_mktsegment = 'BUILDING' ga
      |  from customer),
      |byval as (select v,
      |    cast(sum(case when ga then 1 else 0 end) as bigint) av,
      |    cast(sum(case when not ga then 1 else 0 end) as bigint) bv
      |  from c group by 1),
      |grid as (select v, av, bv,
      |    cast(sum(av) over (order by v
      |      rows between unbounded preceding and current row)
      |      as bigint) cuma,
      |    cast(sum(bv) over (order by v
      |      rows between unbounded preceding and current row)
      |      as bigint) cumb,
      |    cast(coalesce(lead(v) over (order by v) - v, 0) as bigint) gap
      |  from byval),
      |tot as (select cast(sum(av) as bigint) na,
      |    cast(sum(bv) as bigint) nb from byval)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // E-411: identical grid, exact decimal fold, one division.
    "ext_wasserstein" ->
      s"""with $gridSql
        |select any_value(na) n_building, any_value(nb) n_other,
        |  round(cast(sum(cast(gap as hugeint) *
        |      abs(cuma * nb - cumb * na)) as double) /
        |    (cast(any_value(na) as double) *
        |      cast(any_value(nb) as double)) / 100, 4) w1_dollars
        |from grid cross join tot""".stripMargin,

    // E-412: identical cross-multiplied integer fold.
    "ext_totalvariation" ->
      s"""with $gridSql
        |select any_value(na) n_building, any_value(nb) n_other,
        |  round(cast(sum(cast(abs(av * nb - bv * na) as hugeint))
        |      as double) /
        |    (2.0 * cast(any_value(na) as double) *
        |      cast(any_value(nb) as double)), 6) tv_distance
        |from grid cross join tot""".stripMargin,

    // E-413: identical gap-identity folds and closed assembly.
    "ext_energydist" ->
      s"""with $gridSql,
        |terms as (select na, nb,
        |    cast(gap as hugeint) * (cuma * (nb - cumb) +
        |      cumb * (na - cuma)) sab,
        |    cast(gap as hugeint) * 2 * cuma * (na - cuma) saa,
        |    cast(gap as hugeint) * 2 * cumb * (nb - cumb) sbb
        |  from grid cross join tot)
        |select any_value(na) n_building, any_value(nb) n_other,
        |  round((2.0 * cast(sum(sab) as double) /
        |      (cast(any_value(na) as double) *
        |        cast(any_value(nb) as double)) -
        |    cast(sum(saa) as double) /
        |      (cast(any_value(na) as double) *
        |        cast(any_value(na) as double)) -
        |    cast(sum(sbb) as double) /
        |      (cast(any_value(nb) as double) *
        |        cast(any_value(nb) as double))) / 100, 6)
        |    energy_dist_dollars
        |from terms""".stripMargin)
}
