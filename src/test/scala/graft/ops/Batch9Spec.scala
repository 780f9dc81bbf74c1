package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the round-6 batch-9 queries on closed-form inputs and
  * fixture invariants; DuckDB value equality is the ext_* contracts' job.
  */
class Batch9Spec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  test("ext_jsd is bounded by [0, ln 2] and zero iff distributions match") {
    val r = ExtensionQueries9.extJsd(spark, sf001).collect()(0)
    val jsd = r.getAs[Double]("jsd")
    assert(jsd >= 0.0 && jsd <= math.log(2) + 1e-9, s"jsd=$jsd out of range")
    assert(r.getAs[Long]("n_union") > 0)
  }

  test("ext_theil is non-negative and zero on constant input") {
    val r = ExtensionQueries9.extTheil(spark, sf001).collect()(0)
    assert(r.getAs[Double]("theil") >= 0.0)
    // closed form: equal values => x/mu = 1 => ln term 0 => T = 0
    val const = Seq(5.0, 5.0, 5.0).toDF("x")
    val mu = const.agg(avg("x").as("mu"), count(lit(1)).as("n"))
    val t = const.crossJoin(mu)
      .agg((sum((col("x") / col("mu")) * log(col("x") / col("mu"))) / max("n")).as("t"))
      .collect()(0).getDouble(0)
    assert(math.abs(t) < 1e-12)
  }

  test("ext_cramersv lies in [0, 1] with the full fixture grid dims") {
    val r = ExtensionQueries9.extCramersV(spark, sf001).collect()(0)
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0, s"V=$v out of range")
    assert(r.getAs[Long]("r") > 1 && r.getAs[Long]("c") > 1)
  }

  test("ext_cohend: both groups populated, d finite") {
    val r = ExtensionQueries9.extCohenD(spark, sf001).collect()(0)
    assert(r.getAs[Long]("n_purchase") > 0 && r.getAs[Long]("n_click") > 0)
    assert(!r.getAs[Double]("cohen_d").isNaN)
  }

  test("ext_rfm partitions every customer into exactly one segment") {
    val seg = ExtensionQueries9.extRfm(spark, sf001)
    val total = seg.agg(sum("n_customers")).collect()(0).getLong(0)
    val nCust = graft.Tables.table(spark, sf001, "orders")
      .select("o_custkey").distinct().count()
    assert(total == nCust, s"segment sizes sum $total != $nCust customers")
    val bad = seg.filter(col("r_bin").between(1, 4) === false ||
      col("f_bin").between(1, 4) === false || col("m_bin").between(1, 4) === false)
    assert(bad.count() == 0)
  }

  test("winnowing guarantee: docs sharing a long run share a fingerprint") {
    // MOSS: any shared token run of length >= w + k - 1 = 6 yields at
    // least one common selected fingerprint. Two docs share an 8-token
    // run embedded in different contexts.
    val tmp = java.nio.file.Files.createTempDirectory("winnow").toString
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    Seq(
      (1L, s"one two $run x y z"),
      (2L, s"nine eight seven $run p q"),
      (3L, "completely different words only here")
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val fp = ExtensionQueries9.extWinnow(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("fp_csv").split(",").map(_.toLong).toSet).toMap
    assert((fp(1L) & fp(2L)).nonEmpty, "shared 8-token run produced no shared fingerprint")
    assert((fp(1L) & fp(3L)).isEmpty, "unrelated docs should share nothing")
  }

  test("ext_oov rates are valid shares over every source") {
    val rows = ExtensionQueries9.extOov(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rate = r.getAs[Double]("oov_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("n_oov") <= r.getAs[Long]("n_tokens"))
    }
  }
}
