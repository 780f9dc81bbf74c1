package graft.sources

import graft.SparkFixture
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S-20: versioned parquet table — commit/read/latest semantics,
  * crash-safety (unmarked directories are invisible AND never
  * reused), and pinned-version isolation.
  */
class VersionedTableSpec extends AnyFunSuite with SparkFixture {

  private def path = spark.conf.get("spark.sql.warehouse.dir") +
    "/graft_versioned_spec"

  test("commit chain, pinned reads, latest resolution") {
    VersionedTable.drop(spark, path)
    import spark.implicits._
    assert(VersionedTable.latestVersion(spark, path) == -1)
    assert(VersionedTable.commit(spark, path,
      Seq((1L, "a"), (2L, "b")).toDF("k", "s")) == 0)
    assert(VersionedTable.commit(spark, path,
      Seq((1L, "a2"), (3L, "c")).toDF("k", "s")) == 1)
    assert(VersionedTable.latestVersion(spark, path) == 1)
    assert(VersionedTable.read(spark, path, 0).count() == 2)
    assert(VersionedTable.read(spark, path) // latest
      .filter(col("k") === 1L).select("s").head().getString(0) == "a2")
    // v0 unchanged by the v1 commit
    assert(VersionedTable.read(spark, path, 0)
      .filter(col("k") === 1L).select("s").head().getString(0) == "a")
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, path, 7)
    }
    VersionedTable.drop(spark, path)
  }

  test("a directory without _SUCCESS is invisible and its number is skipped") {
    VersionedTable.drop(spark, path)
    import spark.implicits._
    VersionedTable.commit(spark, path, Seq((1L, "a")).toDF("k", "s"))
    // simulate a crashed writer: v=1 exists but has no _SUCCESS
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(path, "v=1"))
    assert(VersionedTable.latestVersion(spark, path) == 0)
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, path, 1)
    }
    // next commit must NOT reuse the crashed slot
    val v = VersionedTable.commit(spark, path, Seq((2L, "b")).toDF("k", "s"))
    assert(v == 2)
    assert(VersionedTable.latestVersion(spark, path) == 2)
    assert(VersionedTable.read(spark, path).count() == 1)
    VersionedTable.drop(spark, path)
  }
}
