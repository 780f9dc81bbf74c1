package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: densify each key's observations onto a
  * regular time grid and forward-fill the gaps.
  *
  * Input contract: at most ONE row per (key, bucket) — pre-aggregate
  * with a deterministic picker first (e.g. latest-by-(ts, unique-id),
  * see ops.Upsert.latestPerKey). The op then:
  *   1. derives each key's [min, max] bucket span (one aggregate),
  *   2. explodes a `sequence(lo, hi, step)` grid per key — grid size is
  *      per-key-span/step rows, generated distributed, never on the
  *      driver,
  *   3. left-joins observations onto the grid (same key partitioning as
  *      the span aggregate — one shuffle reused),
  *   4. forward-fills with `last(value, ignoreNulls)` over an
  *      unbounded-preceding row frame per key.
  *
  * Leading grid slots before a key's first observation stay NULL (there
  * is nothing to carry forward) — standard resample semantics.
  */
object Resample {

  def gridForwardFill(observations: DataFrame, key: String, bucket: String,
      value: String, step: Column): DataFrame = {
    val lo = "__lo"; val hi = "__hi"
    val bounds = observations.groupBy(key)
      .agg(min(bucket).as(lo), max(bucket).as(hi))
    val grid = bounds.select(col(key),
      explode(sequence(col(lo), col(hi), step)).as(bucket))
    val w = Window.partitionBy(key).orderBy(bucket)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(observations, Seq(key, bucket), "left")
      .withColumn(value, last(col(value), ignoreNulls = true).over(w))
  }

  /** Same grid, LINEAR interpolation instead of carry-forward: a gap
    * slot between observations at fractional position f gets
    * prev + (next − prev)·f, where f = (slot − prevSlot)/(nextSlot −
    * prevSlot) computed on epoch seconds. Slots before the first / after
    * the last observation have no bracketing pair and stay at the
    * one-sided neighbor (standard interp semantics: extrapolation is
    * clamped). Two extra windows over the SAME per-key partitioning as
    * the fill — no additional shuffle.
    */
  def gridInterpolate(observations: DataFrame, key: String, bucket: String,
      value: String, step: Column): DataFrame = {
    val lo = "__lo"; val hi = "__hi"
    val bounds = observations.groupBy(key)
      .agg(min(bucket).as(lo), max(bucket).as(hi))
    val grid = bounds.select(col(key),
      explode(sequence(col(lo), col(hi), step)).as(bucket))
    val back = Window.partitionBy(key).orderBy(bucket)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(key).orderBy(bucket)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val t = unix_timestamp(col(bucket)).cast("double")
    val joined = grid.join(observations, Seq(key, bucket), "left")
      .withColumn("__pv", last(col(value), ignoreNulls = true).over(back))
      .withColumn("__pt",
        last(when(col(value).isNotNull, t), ignoreNulls = true).over(back))
      .withColumn("__nv", first(col(value), ignoreNulls = true).over(fwd))
      .withColumn("__nt",
        first(when(col(value).isNotNull, t), ignoreNulls = true).over(fwd))
    joined
      .withColumn(value,
        when(col("__pv").isNull, col("__nv"))
          .when(col("__nv").isNull, col("__pv"))
          .when(col("__nt") === col("__pt"), col("__pv"))
          .otherwise(col("__pv") + (col("__nv") - col("__pv"))
            * (t - col("__pt")) / (col("__nt") - col("__pt"))))
      .drop("__pv", "__pt", "__nv", "__nt")
  }
}
