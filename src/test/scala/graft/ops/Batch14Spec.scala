package graft.ops

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the round-6 batch-14 queries; DuckDB value equality is
  * the ext_* contracts' job.
  */
class Batch14Spec extends AnyFunSuite with SparkFixture {

  test("cross-language dup groups really span languages") {
    val rows = ExtensionQueries14.extCrossLangDup(spark, sf001).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_langs") > 1)
      assert(r.getAs[Long]("n_docs") > 1)
      assert(r.getAs[String]("langs").split(",").length ==
        r.getAs[Long]("n_langs").toInt)
    }
  }

  test("knn purity is a k=5 share and self is never a neighbor") {
    val rows = ExtensionQueries14.extKnnPurity(spark, sf001).collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_same")
      assert(n >= 0 && n <= 5)
      assert(r.getAs[Double]("purity") == n / 5.0)
    }
  }

  test("novelty: the smallest doc is fully novel, shares bounded") {
    val rows = ExtensionQueries14.extNovelty(spark, sf001).collect()
    assert(rows.nonEmpty)
    val first = rows.minBy(_.getAs[Long]("doc_id"))
    assert(first.getAs[Double]("novelty") == 1.0,
      "doc with the smallest id must be 100% novel")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_grams"))
    }
  }

  test("shard balance covers all docs and skew averages ~1") {
    val rows = ExtensionQueries14.extHashBalance(spark, sf001).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.table(spark, sf001, "documents").count())
    rows.foreach(r => assert(r.getAs[Long]("shard") >= 0 &&
      r.getAs[Long]("shard") < 16))
    val meanSkew = rows.map(_.getAs[Double]("skew")).sum / rows.length
    assert(math.abs(meanSkew - 1.0) < 0.05)
  }
}
