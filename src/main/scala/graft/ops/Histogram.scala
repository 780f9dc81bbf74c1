package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-range equi-width histogram: `width_bucket` semantics computed
  * with plain floor arithmetic so any engine reproduces it bit-for-bit
  * (DuckDB 1.0 has no width_bucket; this is also what keeps the oracle
  * trivial). One scan + one hash aggregate on a dense integer key —
  * fully partial-aggregatable, the cheapest possible distribution probe
  * at 100 TB.
  */
object Histogram {

  /** Bucket id in 1..nBuckets for x ∈ [min, max): values below min clamp
    * to 1, at or above max to nBuckets.
    */
  def bucketOf(x: Column, min: Double, max: Double, nBuckets: Int): Column = {
    require(max > min && nBuckets > 0)
    least(lit(nBuckets.toLong), greatest(lit(1L),
      (floor((x - min) / ((max - min) / nBuckets)) + 1).cast("long")))
  }

  /** Histogram of `valueCol`: one row per non-empty bucket with bounds
    * and count, ordered by bucket.
    */
  def histogram(df: DataFrame, valueCol: String,
      min: Double, max: Double, nBuckets: Int): DataFrame = {
    val w = (max - min) / nBuckets
    df.select(bucketOf(col(valueCol), min, max, nBuckets).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))
      .select(col("bucket"),
        round(lit(min) + (col("bucket") - 1) * w, 4).as("lo"),
        round(lit(min) + col("bucket") * w, 4).as("hi"),
        col("cnt"))
      .orderBy("bucket")
  }

  /** Equi-DEPTH histogram (E-76): ntile(nBins) over a TOTAL order —
    * `tiebreak` must make the sort unique, or tied values straddle bin
    * boundaries in an engine-dependent order. Each bin carries the same
    * row count (±1) with data-driven bounds — the distribution probe
    * for skewed columns where equi-width histograms put everything in
    * one bucket (and the shape query optimizers build for selectivity
    * estimation).
    *
    * Scale note: ntile needs one global sort; for a 100 TB column use
    * approx percentiles as cut points instead — this operator is the
    * exact form for monitor-sized slices and the oracle for that
    * approximation.
    */
  def equiDepth(df: DataFrame, value: Column, tiebreak: Column,
      nBins: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(value, tiebreak)
    df.select(value.as("v"), ntile(nBins).over(w).as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("cnt"), min("v").as("lo"), max("v").as("hi"))
      .orderBy("bin")
  }
}
