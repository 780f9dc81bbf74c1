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
}
