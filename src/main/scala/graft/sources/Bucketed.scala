package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: persist a table hash-bucketed (and sorted)
  * by its join/aggregation key so repeated big-big joins and
  * aggregations on that key run WITHOUT a shuffle — the storage-level
  * answer to "co-locate the join" at 100 TB, where re-shuffling a fact
  * table per query is the dominant cost.
  *
  * Bucketing only takes effect through the session catalog
  * (saveAsTable/table — path-based parquet has no bucket metadata).
  */
object Bucketed {

  /** Write `df` as a bucketed, sorted managed table (overwriting). */
  def write(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
