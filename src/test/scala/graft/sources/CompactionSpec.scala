package graft.sources

import graft.{SparkFixture, Tables}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Compaction contract (S-15): file count collapses to the byte-target
  * bound, rows and values are untouched, and a second pass is a no-op
  * (already-compacted input stays at one file).
  */
class CompactionSpec extends AnyFunSuite with SparkFixture {

  test("fragmented dir compacts to the byte-target file count; rows survive") {
    val dir = Files.createTempDirectory("compact").toString + "/c"
    val src = Tables.table(spark, sf001, "customer")
      .select("c_custkey", "c_acctbal")
    src.repartition(32).write.mode("overwrite").parquet(dir)
    val (before, after) = Compaction.compactParquet(spark, dir)
    assert(before == 32, s"expected 32 fragments, found $before")
    assert(after == 1, s"tiny table must compact to one file, got $after")
    val back = spark.read.parquet(dir)
    assert(back.count() == src.count())
    // second pass: stable at one file
    val (b2, a2) = Compaction.compactParquet(spark, dir)
    assert(b2 == 1 && a2 == 1)
  }
}
