package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loader.
  *
  * Handles the one physical-type quirk in the driver fixtures
  * (FIXTURES.md quirk 1): `events.ts` is a nanosecond Parquet timestamp,
  * which stock Spark refuses with [PARQUET_TYPE_ILLEGAL]. We read it as a
  * raw long (`spark.sql.legacy.parquet.nanosAsLong=true`) and truncate
  * ns -> us with integer division (`ts div 1000`) — exactly the truncation
  * DuckDB applies natively on read, so the oracle sees identical values.
  * (NOT `cast(ts/1000 as long)`: `/` on longs goes through DOUBLE, which
  * has only 53 mantissa bits — ~1.7e18 ns loses precision.)
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
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case other =>
      spark.read.parquet(s"$dir/$other.parquet")
  }

  /** Register every fixture table as a temp view (SQL entry point). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
