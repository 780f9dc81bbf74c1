package graft.ops

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the round-6 batch-12 queries; DuckDB value equality is
  * the ext_* contracts' job.
  */
class Batch12Spec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  test("peaks beat both neighbors in the daily series") {
    val daily = Tables.table(spark, sf001, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("rev"))
      .orderBy("d").collect()
      .map(r => r.getDate(0).toString -> r.getLong(1))
    val peaks = ExtensionQueries12.extPeaks(spark, sf001).collect()
      .map(r => r.getDate(0).toString).toSet
    daily.sliding(3).foreach {
      case Array((_, a), (dm, m), (_, b)) =>
        assert(peaks.contains(dm) == (m > a && m > b), s"peak flag wrong at $dm")
      case _ =>
    }
    // series ends can never be peaks
    assert(!peaks.contains(daily.head._1) && !peaks.contains(daily.last._1))
  }

  test("streaks are true runs: closed form on a crafted calendar") {
    val tmp = java.nio.file.Files.createTempDirectory("streak").toString
    // user 1: days 1,2,3, 5,6 -> longest 3 starting day 1
    // user 2: days 2, 4, 6 -> longest 1 starting day 2 (earliest tie)
    val days = Seq((1L, 1), (1L, 2), (1L, 3), (1L, 5), (1L, 6),
      (2L, 2), (2L, 4), (2L, 6))
    days.toDF("user_id", "dd")
      .select(col("user_id"),
        (expr("timestamp '2024-03-01 00:00:00'") +
          expr("make_interval(0,0,0,dd,0,0,0)")).as("ts"),
        lit("click").as("event_type"), lit(1.0).as("value"),
        monotonically_increasing_id().as("event_id"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = ExtensionQueries12.extStreak(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDate(2).toString))).toMap
    assert(out(1L) == ((3L, "2024-03-02")))
    assert(out(2L) == ((1L, "2024-03-03")))
  }

  test("time profile covers only valid (isodow, hour) cells and sums to all events") {
    val rows = ExtensionQueries12.extTimeProfile(spark, sf001).collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("isodow") >= 1 && r.getAs[Int]("isodow") <= 7)
      assert(r.getAs[Int]("hr") >= 0 && r.getAs[Int]("hr") <= 23)
    }
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == Tables.table(spark, sf001, "events").count())
  }

  test("readability: more syllables per word lowers the score") {
    val rows = ExtensionQueries12.extReadability(spark, sf001).collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      assert(r.getAs[Long]("syllables") >= 0)
      assert(r.getAs[Long]("words") > 0)
    }
  }
}
