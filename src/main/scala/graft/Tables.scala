package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loader.
  *
  * `events.ts` is schema-adaptive (FIXTURES.md quirk 1): fixture
  * generations have shipped BOTH physical encodings, so we always read
  * with `spark.sql.legacy.parquet.nanosAsLong=true` (a no-op for non-ns
  * files) and dispatch on the resolved type of `ts`:
  *   - LongType            => nanosecond Parquet timestamp surfaced as a
  *     raw long; truncate ns -> us with integer division
  *     (`timestamp_micros(ts div 1000)`) — exactly the truncation DuckDB
  *     applies natively on read, so the oracle sees identical values.
  *     (NOT `cast(ts/1000 as long)`: `/` on longs goes through DOUBLE,
  *     which has only 53 mantissa bits — ~1.7e18 ns loses precision.)
  *   - TimestampNTZType    => microsecond timestamp without tz; cast to
  *     the session-standard TIMESTAMP. The session timezone is UTC in
  *     every entry point (Verify/Bench/specs), so the wall-clock value is
  *     reinterpreted as the same UTC instant the old ns path produced —
  *     window()/date_trunc/unix_micros results are identical.
  *   - TimestampType       => pass through.
  *
  * Scale note: all reads are plain columnar Parquet scans — vectorized
  * reader, column pruning and predicate pushdown all apply. At 100 TB the
  * same loader works over a partitioned directory layout; nothing here
  * assumes single files.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Resolved-relation cache, keyed by (session, dir, table). A catalog
  // resolves a relation once (file listing + footer schema) and reuses the
  // plan; re-running spark.read.parquet per query repeats that I/O on
  // every call — at 100 TB the listing alone is a real cost. DataFrames
  // are immutable plans, so sharing is safe; the cache holds a snapshot
  // of the file listing (same semantics as a registered view).
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  /** Read one fixture table from `dir` (e.g. /root/testdata/sf0.01). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, dir, name), _ => load(spark, dir, name))

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      raw.schema("ts").dataType match {
        case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
        case TimestampType    => raw
        case other => throw new IllegalStateException(
          s"events.ts has unsupported physical type $other (expected ns-long, timestamp, or timestamp_ntz)")
      }
    case other =>
      spark.read.parquet(s"$dir/$other.parquet")
  }

  /** Register every fixture table as a temp view (SQL entry point). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
