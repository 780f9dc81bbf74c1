package graft.ops

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the round-6 batch-10 queries on fixture invariants;
  * DuckDB value equality is the ext_* contracts' job.
  */
class Batch10Spec extends AnyFunSuite with SparkFixture {

  test("attribution partitions every purchase into exactly one touch bucket") {
    val out = ExtensionQueries10.extAttribution(spark, sf001)
    val attributed = out.agg(sum("n_purchases")).collect()(0).getLong(0)
    val purchases = Tables.table(spark, sf001, "events")
      .filter(col("event_type") === "purchase").count()
    assert(attributed == purchases, s"$attributed attributed != $purchases purchases")
    val types = out.collect().map(_.getString(0)).toSet
    assert(types.subsetOf(Set("click", "error", "signup", "view", "none")))
  }

  test("interarrival gap counts equal events minus one per (user, type) series") {
    val out = ExtensionQueries10.extInterarrival(spark, sf001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("mean_gap_s") > 0)
      assert(r.getAs[Double]("lambda_mle") > 0)
    }
    val totalGaps = out.map(_.getAs[Long]("n_gaps")).sum
    val e = Tables.table(spark, sf001, "events")
    val expected = e.count() -
      e.select("user_id", "event_type").distinct().count()
    assert(totalGaps == expected, s"gaps $totalGaps != events - series $expected")
  }

  test("stickiness: DAU never exceeds the trailing WAU, ratio in (0, 1]") {
    val rows = ExtensionQueries10.extStickiness(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("dau") <= r.getAs[Long]("wau"))
      val st = r.getAs[Double]("stickiness")
      assert(st > 0 && st <= 1.0)
    }
  }

  test("pareto shares are monotone in the cut and bounded by 1") {
    val rows = ExtensionQueries10.extPareto(spark, sf001)
      .orderBy("pct").collect()
    assert(rows.map(_.getAs[Long]("pct")).toSeq == Seq(1L, 5L, 10L, 20L, 50L))
    val shares = rows.map(_.getAs[Double]("rev_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b },
      s"shares not monotone: ${shares.mkString(",")}")
    assert(shares.last <= 1.0 && shares.head > 0)
    // top-k% always captures at least k% of revenue (revenue sorted desc)
    rows.foreach(r => assert(
      r.getAs[Double]("rev_share") >= r.getAs[Long]("pct") / 100.0 - 1e-9))
  }

  test("lexical richness counts nest: hapax <= types <= tokens") {
    val rows = ExtensionQueries10.extLexical(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tok, ty, hap) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_types"), r.getAs[Long]("n_hapax"))
      assert(hap <= ty && ty <= tok)
      assert(r.getAs[Double]("ttr") > 0 && r.getAs[Double]("ttr") <= 1.0)
    }
  }

  test("domain similarity matrix covers every label pair once, cosines in [-1,1]") {
    val rows = ExtensionQueries10.extDomainSim(spark, sf001).collect()
    val nLabels = Tables.table(spark, sf001, "embeddings")
      .select("label").distinct().count().toInt
    assert(rows.length == nLabels * (nLabels - 1) / 2,
      s"${rows.length} pairs for $nLabels labels")
    rows.foreach { r =>
      val c = r.getAs[Double]("cosine")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      assert(r.getAs[Int]("la") < r.getAs[Int]("lb"))
    }
  }
}
