package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two integral
  * columns so rows close in BOTH dimensions land close in the sort
  * order — the storage-layout operator behind multi-dimensional file
  * skipping. A table range-partitioned and sorted by z-value yields
  * per-file min/max bounds that are tight in every interleaved
  * dimension, where a single-column sort gives tight bounds in one
  * dimension and the full domain in the others (ZOrderSpec measures
  * exactly this on a grid).
  *
  * The code is a pure arithmetic projection (shift/mask/add — all
  * codegen'd built-ins, no shuffle); `cluster` adds the one range
  * shuffle any layout rewrite needs.
  */
object ZOrder {

  /** Morton code over the low `bits` bits of `a` (even positions) and
    * `b` (odd positions). Deterministic, ANSI-arithmetic-expressible —
    * [[zValueSql]] renders the identical formula for the DuckDB oracle.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftright(a.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(b.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** The same interleave as ANSI SQL text (`>>`, `&`, `*`, `+`). */
  def zValueSql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"(($a >> $i) & 1) * ${1L << (2 * i)} + (($b >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  /** Rewrite `df` into `numPartitions` z-clustered ranges, sorted
    * within each — the layout to write out for skippable storage.
    */
  def cluster(df: DataFrame, a: String, b: String, numPartitions: Int,
      bits: Int = 16): DataFrame = {
    val z = zValue(col(a), col(b), bits)
    df.repartitionByRange(numPartitions, z).sortWithinPartitions(z)
  }
}
