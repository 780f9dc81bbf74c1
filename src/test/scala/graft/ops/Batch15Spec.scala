package graft.ops

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the round-6 batch-15 queries; DuckDB value equality is
  * the ext_* contracts' job.
  */
class Batch15Spec extends AnyFunSuite with SparkFixture {

  test("dedup yield accounting is internally consistent") {
    val r = ExtensionQueries15.extDedupYield(spark, sf001).collect()(0)
    val (docs, clusters, removed) = (r.getAs[Long]("n_docs"),
      r.getAs[Long]("n_clusters"), r.getAs[Long]("n_removed"))
    assert(docs == Tables.table(spark, sf001, "documents").count())
    assert(removed == docs - clusters)
    assert(r.getAs[Long]("chars_removed") <= r.getAs[Long]("chars_total"))
  }

  test("boilerplate heads are 3-token openings with valid shares") {
    val rows = ExtensionQueries15.extBoilerplate(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("head3").split(" ").length == 3)
      val s = r.getAs[Double]("head_share")
      assert(s > 0 && s <= 1.0)
    }
  }

  test("embedding health reports all 64 dims over every vector") {
    val rows = ExtensionQueries15.extEmbHealth(spark, sf001).collect()
    assert(rows.length == 64)
    val n = Tables.table(spark, sf001, "embeddings").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Double]("std") >= 0.0)
    }
  }

  test("lag correlations are valid coefficients over shrinking windows") {
    val rows = ExtensionQueries15.extLagCorr(spark, sf001).orderBy("lag").collect()
    assert(rows.map(_.getAs[Int]("lag")).toSeq == Seq(0, 1, 2, 3))
    val days = rows.map(_.getAs[Long]("n_days"))
    assert(days.zip(days.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val c = r.getAs[Double]("lag_corr")
      assert(c >= -1.0 && c <= 1.0)
    }
  }

  test("length outliers truly exceed their language's p95") {
    val rows = ExtensionQueries15.extLenOutliers(spark, sf001).collect()
    assert(rows.nonEmpty)
    val p95 = Tables.table(spark, sf001, "documents")
      .groupBy("lang").agg(expr("percentile(n_chars, 0.95)").as("p"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_chars") > p95(r.getAs[String]("lang")))
    }
  }
}
