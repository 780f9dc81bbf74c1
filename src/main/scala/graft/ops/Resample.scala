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
}
