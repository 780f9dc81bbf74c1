package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet table with snapshot isolation and time travel
  * (SURVEY §2, S-20).
  *
  * Layout: `dir/v=N/` — one immutable parquet directory per commit.
  * A version EXISTS iff its directory contains the `_SUCCESS` marker
  * Spark's commit protocol writes last; a crashed or in-flight write
  * leaves a directory without the marker and stays invisible to every
  * reader. That makes the whole scheme metadata-free and crash-safe:
  * no manifest to corrupt, `latestVersion` is a one-level directory
  * listing, and concurrent readers of any pinned version never see a
  * partial file set. (Real lakehouse formats add a manifest for
  * file-level pruning and multi-writer CAS; single-writer snapshot
  * semantics need neither.)
  *
  * Scale shape: time travel is free at read time — a pinned version is
  * just a parquet scan of that directory, with the usual pushdown and
  * pruning; nothing is rewritten on read, and commits touch only the
  * new version's files.
  */
object VersionedTable {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versions(spark: SparkSession, dir: String): Seq[Int] = {
    val f = fs(spark, dir)
    val base = new Path(dir)
    if (!f.exists(base)) return Seq.empty
    f.listStatus(base).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .filter(st => f.exists(new Path(st.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("v=").toInt)
      .sorted
  }

  /** Highest committed (i.e. `_SUCCESS`-marked) version, or -1. */
  def latestVersion(spark: SparkSession, dir: String): Int =
    versions(spark, dir).lastOption.getOrElse(-1)

  /** Write `df` as the next version; returns the new version number.
    * The version becomes visible atomically when the parquet commit
    * writes `_SUCCESS` — a failure mid-write leaves an unmarked
    * directory that readers (and the next commit, which skips past
    * it) ignore.
    */
  def commit(spark: SparkSession, dir: String, df: DataFrame): Int = {
    val f = fs(spark, dir)
    // next = one past ANY existing directory, committed or crashed —
    // a leftover unmarked v=K must never be reused
    val existing = Option(f.globStatus(new Path(dir, "v=*")))
      .map(_.toSeq).getOrElse(Seq.empty)
      .map(_.getPath.getName.stripPrefix("v=").toInt)
    val next = (latestVersion(spark, dir) +: existing).max + 1
    df.write.parquet(s"$dir/v=$next")
    next
  }

  /** Read a pinned version, or the latest when `version` < 0. */
  def read(spark: SparkSession, dir: String, version: Int = -1): DataFrame = {
    val v = if (version >= 0) version else latestVersion(spark, dir)
    require(versions(spark, dir).contains(v),
      s"version $v does not exist (committed: ${versions(spark, dir).mkString(",")})")
    spark.read.parquet(s"$dir/v=$v")
  }

  /** Remove the whole table (all versions). */
  def drop(spark: SparkSession, dir: String): Unit =
    fs(spark, dir).delete(new Path(dir), true)
}
