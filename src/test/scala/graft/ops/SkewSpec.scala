package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite with SparkFixture {

  // Zipfian-ish skew: 90% of rows share one key
  private lazy val skewed = {
    import spark.implicits._
    (1 to 5000).map { i =>
      val k = if (i % 10 != 0) 1L else (i % 50).toLong
      (k, i.toDouble)
    }.toDF("k", "v")
  }

  private lazy val dim = {
    import spark.implicits._
    (0L to 49L).map(k => (k, s"name_$k")).toDF("k", "name")
  }

  test("saltedJoin equals the plain join on skewed data") {
    val plain = skewed.join(dim, Seq("k"), "inner")
      .select("k", "v", "name").collect().map(_.toSeq).sortBy(_.mkString("|"))
    val salted = Skew.saltedJoin(skewed, dim, "k", factor = 8)
      .select("k", "v", "name").collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedSum equals the plain aggregation") {
    val plain = skewed.groupBy("k").agg(sum("v").as("sum_v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSum(skewed, "k", "v", factor = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(salted.keySet == plain.keySet)
    plain.foreach { case (k, s) =>
      assert(math.abs(salted(k) - s) < 1e-6, s"key $k")
    }
  }

  test("salted join spreads a hot key across partitions") {
    val spread = Skew.saltedJoin(skewed, dim, "k", factor = 8)
      .filter(col("k") === 1L)
      .withColumn("p", spark_partition_id())
      .select("p").distinct().count()
    assert(spread > 1, "hot key still confined to one partition")
  }
}
