package graft.functions

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKAggregatorSpec extends AnyFunSuite with SparkFixture {

  test("typed top-k aggregator reproduces the B4 window result") {
    import spark.implicits._
    val orders = Tables.table(spark, sf0001, "orders")
    val viaAgg = orders
      .select(col("o_custkey").cast("long").as("g"),
        col("o_totalprice").as("score"), col("o_orderkey").cast("long").as("tiebreak"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, score, tb) => Scored(score, tb) }
      .agg(new TopKAggregator(3).toColumn.name("top"))
      .flatMap { case (g, top) =>
        top.zipWithIndex.map { case (s, i) =>
          (g, s.tiebreak, s.score, (i + 1).toLong)
        }
      }
      .toDF("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
      .limit(100)
    val viaWindow = graft.queries.ContractQueries.b4(spark, sf0001)
      .select(col("o_custkey").cast("long"), col("o_orderkey").cast("long"),
        col("o_totalprice"), col("rn"))
    assert(viaAgg.collect().map(_.toSeq).toSeq ==
      viaWindow.collect().map(_.toSeq).toSeq)
  }

  test("merge is bounded and associative across partitionings") {
    import spark.implicits._
    val data = (1 to 1000).map(i => (i % 7L, (i * 37 % 1000).toDouble, i.toLong))
    for (parts <- Seq(1, 4, 13)) {
      val out = spark.createDataset(data).repartition(parts)
        .groupByKey(_._1)
        .mapValues { case (_, s, t) => Scored(s, t) }
        .agg(new TopKAggregator(5).toColumn.name("top"))
        .collect().sortBy(_._1)
      assert(out.forall(_._2.length == 5))
      // all partitionings agree exactly
      val expected = data.groupBy(_._1).map { case (g, rows) =>
        g -> rows.map(r => Scored(r._2, r._3))
          .sortBy(s => (-s.score, s.tiebreak)).take(5)
      }
      out.foreach { case (g, top) => assert(top == expected(g), s"group $g") }
    }
  }
}
