package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift detection via the population stability index
  * (E-65): PSI = Σ_bins (p − q)·ln(p ∕ q) between a reference slice
  * and a current slice of the same column — the standard ML-ops
  * monitor for "has this feature's distribution moved since training"
  * (rule of thumb: < 0.1 stable, > 0.2 action). The per-bin
  * contributions localize WHERE the mass moved.
  *
  * One scan: both slices aggregate in the same pass (conditional
  * sums), shares are Laplace-smoothed so bins empty on one side stay
  * defined. Bins with no rows in either slice are absent (their
  * smoothed contribution is the same tiny constant everywhere —
  * reported PSI is over observed bins; the smoothing denominator
  * still counts all nBins).
  */
object Drift {

  /** @param isRef boolean column marking the reference slice; rows
    *              where it is false belong to the current slice
    * @return per-bin (bin, c_ref, c_cur, p, q, contrib)
    */
  def psiBins(df: DataFrame, value: Column, isRef: Column,
      binWidth: Double, nBins: Int): DataFrame = {
    // Clamp BOTH ends: without the greatest(), a negative value would
    // land in a bin < 0 that silently sits outside the declared
    // [0, nBins) histogram while the smoothing denominator still
    // assumes nBins bins.
    val bin = greatest(least(floor(value / binWidth), lit(nBins - 1)), lit(0))
      .cast("int")
    val w = Window.partitionBy()
    df.select(bin.as("bin"), isRef.as("ref"))
      .groupBy("bin")
      .agg(sum(when(col("ref"), 1L).otherwise(0L)).as("c_ref"),
        sum(when(!col("ref"), 1L).otherwise(0L)).as("c_cur"))
      .withColumn("p",
        (col("c_ref") + 1) / (sum("c_ref").over(w) + nBins))
      .withColumn("q",
        (col("c_cur") + 1) / (sum("c_cur").over(w) + nBins))
      .withColumn("contrib", (col("p") - col("q")) * log(col("p") / col("q")))
  }

  /** Two-sample Kolmogorov–Smirnov statistic (E-71) — the bin-free
    * complement to [[psiBins]]: D = max_x |F_ref(x) − F_cur(x)| over
    * the empirical CDFs. Computed relationally and tie-safely: group by
    * distinct value first (so a value's whole tie block enters both
    * ECDFs at once), then one ordered cumulative-sum window over the
    * distinct values, then an argmax. The argmax row is pinned
    * deterministic by ranking on the ROUNDED gap with the value as
    * tiebreak.
    *
    * Scale: the window is a single global sort over DISTINCT values —
    * fine for monitor-sized slices; at full-corpus scale feed a
    * quantile sketch of each side instead (the D statistic only needs
    * ECDFs at the evaluation points).
    *
    * @return one row: (n_ref, n_cur, ks_at, ks) — the statistic and
    *         the smallest value where the gap attains it
    */
  def ks(df: DataFrame, value: Column, isRef: Column): DataFrame = {
    val wAll = Window.partitionBy()
    val wCum = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(value.as("v"), isRef.as("ref"))
      .groupBy("v")
      .agg(sum(when(col("ref"), 1L).otherwise(0L)).as("a_ref"),
        sum(when(!col("ref"), 1L).otherwise(0L)).as("a_cur"))
      .withColumn("gap", round(abs(
        sum("a_ref").over(wCum) / sum("a_ref").over(wAll).cast("double")
          - sum("a_cur").over(wCum) / sum("a_cur").over(wAll).cast("double")), 6))
      .withColumn("n_ref", sum("a_ref").over(wAll))
      .withColumn("n_cur", sum("a_cur").over(wAll))
      .orderBy(desc("gap"), asc("v"))
      .limit(1)
      .select(col("n_ref"), col("n_cur"), col("v").as("ks_at"),
        col("gap").as("ks"))
  }
}
