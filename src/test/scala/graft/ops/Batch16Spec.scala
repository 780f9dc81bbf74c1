package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the round-6 batch-16 queries; DuckDB value equality is
  * the ext_* contracts' job.
  */
class Batch16Spec extends AnyFunSuite with SparkFixture {

  test("lift matrix cells average to ~1 under weighting by joint counts") {
    val rows = ExtensionQueries16.extLiftMatrix(spark, sf001).collect()
    assert(rows.nonEmpty)
    // Σ n_ab·lift / Σ n_ab = n·Σ(n_ab²/(n_a·n_b))/n_total — not exactly 1,
    // but every lift must be positive and finite
    rows.foreach(r => assert(r.getAs[Double]("lift") > 0))
    // weighted by P(a,b): Σ P(ab)·(P(ab)/(P(a)P(b))) >= 1 (Cauchy-Schwarz)
    val n = rows.map(_.getAs[Long]("n_ab")).sum.toDouble
    val chi = rows.map(r => r.getAs[Long]("n_ab") / n * r.getAs[Double]("lift")).sum
    assert(chi >= 1.0 - 1e-9)
  }

  test("runs test counts are consistent: runs between 1 and n") {
    val r = ExtensionQueries16.extRunsTest(spark, sf001).collect()(0)
    val (runs, above, below) = (r.getAs[Long]("n_runs"),
      r.getAs[Long]("n_above"), r.getAs[Long]("n_below"))
    assert(runs >= 1 && runs <= above + below)
    assert(!r.getAs[Double]("z").isNaN)
  }

  test("ABC classes partition parts with A the largest revenue share") {
    val rows = ExtensionQueries16.extAbc(spark, sf001).collect()
      .map(r => r.getAs[String]("abc") ->
        ((r.getAs[Long]("n_parts"), r.getAs[Double]("rev_share")))).toMap
    assert(rows.keySet == Set("A", "B", "C"))
    assert(math.abs(rows.values.map(_._2).sum - 1.0) < 1e-5)
    assert(rows("A")._2 <= 0.8 + 1e-9, "class A holds at most 80% by construction")
    assert(rows("A")._2 > rows("C")._2)
  }

  test("X-MR chart emits one flagged row per day") {
    val rows = ExtensionQueries16.extXmr(spark, sf001).collect()
    val nDays = graft.Tables.table(spark, sf001, "events")
      .filter(col("event_type") === "purchase")
      .select(to_date(col("ts"))).distinct().count()
    assert(rows.length == nDays)
    assert(rows.forall(r => Set("in", "above", "below")(r.getAs[String]("side"))))
  }

  test("KMV estimate lands within 50% of exact at k=64") {
    val r = ExtensionQueries16.extKmv(spark, sf001).collect()(0)
    assert(r.getAs[Long]("k") <= 64)
    // KMV with k=64 has ~1/sqrt(62) ≈ 13% std error; 50% is a loose gate
    assert(r.getAs[Double]("rel_err") < 0.5,
      s"rel_err ${r.getAs[Double]("rel_err")} implausible for k=64")
  }
}
