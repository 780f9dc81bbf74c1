package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite with SparkFixture {

  test("zValue interleaves bits (known Morton codes)") {
    import spark.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 0L),
        (0L, 2L), (3L, 3L), (7L, 0L))
      .toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"), 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 1L, 2L, 3L, 4L, 8L, 15L, 21L))
  }

  test("z-clustering bounds BOTH dimensions per partition; a single-column sort does not") {
    import spark.implicits._
    // full 64x64 grid; 16 partitions
    val grid = spark.range(4096)
      .select((col("id") % 64).as("a"), (col("id") / 64).cast("long").as("b"))
    def avgRangeOfB(df: org.apache.spark.sql.DataFrame): Double = {
      val spans = df.select(col("b"), spark_partition_id().as("p"))
        .groupBy("p").agg((max("b") - min("b")).as("span"))
        .collect().map(_.getLong(1))
      spans.sum.toDouble / spans.length
    }
    val zClustered = ZOrder.cluster(grid, "a", "b", numPartitions = 16, bits = 6)
    val aSorted = grid.repartitionByRange(16, col("a"))
    val zSpan = avgRangeOfB(zClustered)
    val aSpan = avgRangeOfB(aSorted)
    // perfect quadrants span 16 in b; a-ranged strips span the full 63
    assert(zSpan <= 20.0, s"z-cluster b-span $zSpan")
    assert(aSpan >= 60.0, s"a-sort b-span $aSpan")
    // and the a-dimension stays bounded too (quadrant, not strip)
    val spansA = zClustered.select(col("a"), spark_partition_id().as("p"))
      .groupBy("p").agg((max("a") - min("a")).as("s"))
      .collect().map(_.getLong(1))
    assert(spansA.forall(_ <= 20), s"z-cluster a-spans ${spansA.toSeq}")
  }

  test("SQL rendering matches the Column formulation") {
    import spark.implicits._
    val df = Seq((13L, 42L), (255L, 1L), (1000L, 999L)).toDF("a", "b")
    val viaCol = df.select(ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    val viaSql = df.selectExpr(ZOrder.zValueSql("a", "b") + " as z")
      .collect().map(_.getLong(0)).toSeq
    assert(viaCol == viaSql)
  }
}
