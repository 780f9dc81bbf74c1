package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the batch-7 queries (interpolated percentiles,
  * co-occurrence projection, rolling trend) on inputs with closed-form
  * answers; DuckDB value equality is the ext_* contracts' job.
  */
class Batch7Spec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  test("interpolated percentile machinery matches the closed form") {
    // v = 100..(100+n-1) cents, n=101: p-th percentile = 100 + (n-1)p/100
    // exactly (every rem lands on an integer grid)
    val base = (0 until 101).map(i => ("A", (100 + i).toLong, i.toLong))
    val df = base.toDF("st", "v", "k")
    val ranked = df
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("st").orderBy("v", "k")))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("st")))
    val spec = ranked.select("st", "n").distinct()
      .select(col("st"), col("n"),
        explode(array(lit(25L), lit(50L), lit(75L), lit(90L))).as("p"))
      .withColumn("lo", expr("((n - 1) * p) div 100"))
      .withColumn("rem", expr("((n - 1) * p) % 100"))
    val lo = ranked.select(col("st").as("st1"), col("rn").as("rn1"),
      col("v").as("v_lo"))
    val out = spec.join(lo, col("st1") === spec("st") &&
        col("rn1") === spec("lo") + 1)
      .select(col("p"), col("v_lo"), col("rem")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // (n-1)p/100 = p exactly: lo = p, rem = 0, value = 100 + p
    for (p <- Seq(25L, 50L, 75L, 90L)) assert(out(p) == ((100 + p, 0L)))
  }

  test("cocite projection equals brute force and respects the degree cap") {
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L), (2L, 11L),
      (1L, 12L), (4L, 12L)).toDF("s", "p")
    // shared parts: (1,2)->2 [10,11], (1,3)->1, (2,3)->1, (1,4)->1, (2,4)->0? no:
    // 4 shares 12 with 1 only
    val brute = edges.select(col("p"), col("s").as("a"))
      .join(edges.select(col("p"), col("s").as("b")), "p")
      .filter(col("a") < col("b")).groupBy("a", "b").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(brute == Map((1L, 2L) -> 2L, (1L, 3L) -> 1L, (2L, 3L) -> 1L,
      (1L, 4L) -> 1L))
    // cap=2 drops part 10 (degree 3): only pairs via 11 and 12 remain
    val deg = edges.groupBy("p").agg(count(lit(1)).as("d")).filter(col("d") <= 2)
    val pruned = edges.join(deg.select("p"), "p")
    val capped = pruned.select(col("p"), col("s").as("a"))
      .join(pruned.select(col("p"), col("s").as("b")), "p")
      .filter(col("a") < col("b")).groupBy("a", "b").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(capped == Map((1L, 2L) -> 1L, (1L, 4L) -> 1L))
  }

  test("rolling trend recovers an exact linear law's slope") {
    // y = 500 + 3x exactly: every full window's OLS slope is exactly 3
    val days = (0 until 60).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(1992, 1, 1).plusDays(i)),
        (500 + 3 * i).toLong, i.toLong)
    }
    val df = days.toDF("dy", "y", "x")
    val w = org.apache.spark.sql.expressions.Window.orderBy("dy")
      .rowsBetween(-27, org.apache.spark.sql.expressions.Window.currentRow)
    val out = df
      .withColumn("nw", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .withColumn("sxy", sum(col("x") * col("y")).over(w))
      .filter(col("nw") === 28)
      .select(((col("nw") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (col("nw") * col("sxx") - col("sx") * col("sx")).cast("double"))
        .as("slope"))
      .collect()
    assert(out.length == 60 - 27)
    out.foreach(r => assert(r.getDouble(0) == 3.0))
  }
}
