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
}
