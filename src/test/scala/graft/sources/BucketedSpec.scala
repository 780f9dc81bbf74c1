package graft.sources

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves the bucketing contract: a join of two tables bucketed on the
  * join key plans with NO shuffle on either side, and produces the same
  * result as the plain path-based join.
  */
class BucketedSpec extends AnyFunSuite with SparkFixture {

  test("bucketed big-big join is shuffle-free and result-identical") {
    val orders = Tables.table(spark, sf0001, "orders")
    val lineitem = Tables.table(spark, sf0001, "lineitem")
    Bucketed.write(orders.withColumnRenamed("o_orderkey", "k"), "b_orders", "k", 8)
    Bucketed.write(lineitem.withColumnRenamed("l_orderkey", "k"), "b_lineitem", "k", 8)

    // disable auto-broadcast so the join strategy is the big-big path
    // the test is about
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.read(spark, "b_orders")
        .join(Bucketed.read(spark, "b_lineitem"), "k")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(k"),
        s"bucketed join still shuffles on the key:\n${plan.take(2500)}")

      val expected = orders.join(lineitem,
          orders("o_orderkey") === lineitem("l_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("drop table if exists b_orders")
      spark.sql("drop table if exists b_lineitem")
    }
  }
}
