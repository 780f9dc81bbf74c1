package graft.ops

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** E-110: the incremental view maintenance algebra must reproduce the
  * full recompute exactly (up to float rounding) for ANY split — the
  * driver gate pins the 1997/1998 split; this spec pins a different
  * one plus the delta-only and empty-delta edges.
  */
class IvmSpec extends AnyFunSuite with SparkFixture {

  private def frames(splitYear: Int) = {
    val o = Tables.table(spark, sf0001, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).as("oy"))
    val l = Tables.table(spark, sf0001, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"),
        year(col("l_shipdate")).as("ly"))
    (o.filter(col("oy") <= splitYear).drop("oy"),
      o.filter(col("oy") > splitYear).drop("oy"),
      l.filter(col("ly") <= splitYear).drop("ly"),
      l.filter(col("ly") > splitYear).drop("ly"),
      o.drop("oy"), l.drop("ly"))
  }

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap

  /** Same keys, same counts, sums equal within float-merge noise. */
  private def assertSameView(a: Map[Long, (Double, Long)],
      b: Map[Long, (Double, Long)]): Unit = {
    assert(a.keySet == b.keySet)
    a.foreach { case (k, (s1, c1)) =>
      val (s2, c2) = b(k)
      assert(c1 == c2, s"count drift at $k")
      assert(math.abs(s1 - s2) < 1e-6, s"sum drift at $k: $s1 vs $s2")
    }
  }

  test("maintained view equals full recompute for a 1996 split") {
    val (oldO, dO, oldL, dL, allO, allL) = frames(1996)
    val v1 = Ivm.merge(
      Ivm.initial(oldO, oldL, "o_orderkey", "o_custkey", "rev"),
      Ivm.deltaGroups(oldO, dO, oldL, dL, "o_orderkey", "o_custkey", "rev"),
      "o_custkey")
      .select(col("o_custkey"), col("v_sum"), col("v_cnt"))
    val full = allO.join(allL, "o_orderkey")
      .groupBy("o_custkey")
      .agg(sum("rev").as("v_sum"), count(lit(1)).as("v_cnt"))
    assertSameView(asMap(v1), asMap(full))
  }

  test("empty delta is a no-op; all-delta equals the recompute") {
    val (_, _, _, _, allO, allL) = frames(1996)
    val v0 = Ivm.initial(allO, allL, "o_orderkey", "o_custkey", "rev")
    val emptyO = allO.limit(0)
    val emptyL = allL.limit(0)
    val noop = Ivm.merge(v0,
      Ivm.deltaGroups(allO, emptyO, allL, emptyL, "o_orderkey", "o_custkey", "rev"),
      "o_custkey")
    assertSameView(
      asMap(noop.select(col("o_custkey"), col("v_sum"), col("v_cnt"))),
      asMap(v0.select(col("o_custkey"), col("v_sum"), col("v_cnt"))))
    // all rows arriving as delta onto an empty base
    val fromDeltas = Ivm.merge(
      Ivm.initial(emptyO, emptyL, "o_orderkey", "o_custkey", "rev"),
      Ivm.deltaGroups(emptyO, allO, emptyL, allL, "o_orderkey", "o_custkey", "rev"),
      "o_custkey")
    assertSameView(
      asMap(fromDeltas.select(col("o_custkey"), col("v_sum"), col("v_cnt"))),
      asMap(v0.select(col("o_custkey"), col("v_sum"), col("v_cnt"))))
  }
}
