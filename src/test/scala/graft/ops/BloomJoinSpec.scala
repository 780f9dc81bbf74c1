package graft.ops

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom-join contract (E-27): the prefiltered fact set is a superset of
  * the exact semi-join (no false negatives, bounded false positives),
  * the reduced join equals the plain join exactly, and the prefilter
  * plans as a scan+filter with no join node.
  */
class BloomJoinSpec extends AnyFunSuite with SparkFixture {

  private lazy val lineitem = Tables.table(spark, sf001, "lineitem")
    .select("l_orderkey", "l_extendedprice")
  private lazy val urgent = Tables.table(spark, sf001, "orders")
    .filter(col("o_orderpriority") === "1-URGENT")
    .select("o_orderkey")

  test("prefilter never drops a matching row and filters most others") {
    val pre = BloomJoin.prefilter(lineitem, "l_orderkey", urgent, "o_orderkey")
    val exact = lineitem.join(urgent,
      col("l_orderkey") === col("o_orderkey"), "left_semi")
    // no false negatives: every semi-join row survives the prefilter
    assert(exact.exceptAll(pre.select("l_orderkey", "l_extendedprice")).count() == 0)
    // selective: false positives are a small fraction of the non-matches
    val total = lineitem.count()
    val kept = pre.count()
    val matches = exact.count()
    assert(kept >= matches)
    assert(kept - matches < (total - matches) / 10,
      s"fp too high: kept=$kept matches=$matches total=$total")
  }

  test("reduced join result equals the plain join") {
    val viaBloom = BloomJoin.join(lineitem, "l_orderkey", urgent, "o_orderkey")
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"), sum("l_extendedprice").as("s"))
    val plain = lineitem.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"), sum("l_extendedprice").as("s"))
    assert(viaBloom.exceptAll(plain).count() == 0 &&
      plain.exceptAll(viaBloom).count() == 0)
  }

  test("empty dim side: prefilter keeps nothing, join result is empty") {
    val noOrders = urgent.filter(lit(false))
    val pre = BloomJoin.prefilter(lineitem, "l_orderkey", noOrders, "o_orderkey")
    assert(pre.count() == 0, "bloom over zero keys must reject everything")
    assert(BloomJoin.join(lineitem, "l_orderkey", noOrders, "o_orderkey").count() == 0)
  }

  test("prefilter plans as scan+filter: no join node, filter is a literal") {
    val pre = BloomJoin.prefilter(lineitem, "l_orderkey", urgent, "o_orderkey")
    val plan = pre.queryExecution.sparkPlan.toString
    assert(!plan.contains("Join"), s"prefilter introduced a join:\n${plan.take(1500)}")
    assert(plan.contains("might_contain"), s"bloom predicate missing:\n${plan.take(1500)}")
  }
}
