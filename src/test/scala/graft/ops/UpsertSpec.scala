package graft.ops

import graft.{SparkFixture, Tables}
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the round-2 pipeline ops: CDC upsert apply (ops.Upsert)
  * and PII scrubbing (TextAnalysis.scrub). Cross-engine value equality is
  * the DuckDB oracle's job (ext_upsert / ext_scrub); these pin the
  * algebraic properties the oracle can't express.
  */
class UpsertSpec extends AnyFunSuite with SparkFixture {

  private lazy val customer = Tables.table(spark, sf0001, "customer")
  private lazy val events = Tables.table(spark, sf0001, "events")
    .select("user_id", "ts", "event_id", "value")

  test("applyLatest is idempotent: re-applying the same updates is a no-op") {
    def applied() = Upsert.applyLatest(
        customer, "c_custkey", "c_acctbal",
        events, "user_id", "value",
        Seq(col("ts"), col("event_id")), "new_bal")
      .select("c_custkey", "new_bal", "updated")
    val once = applied()
    // fold the result back in as the snapshot; same updates → same values
    val snap2 = once.withColumnRenamed("new_bal", "c_acctbal").drop("updated")
    val twice = Upsert.applyLatest(
        snap2, "c_custkey", "c_acctbal",
        events, "user_id", "value",
        Seq(col("ts"), col("event_id")), "new_bal")
      .select("c_custkey", "new_bal", "updated")
    assert(once.orderBy("c_custkey").collect().toSeq ==
      twice.orderBy("c_custkey").collect().toSeq)
  }

  test("applyLatest with no updates passes the snapshot through unchanged") {
    val out = Upsert.applyLatest(
        customer, "c_custkey", "c_acctbal",
        events.filter(lit(false)), "user_id", "value",
        Seq(col("ts"), col("event_id")), "new_bal")
    assert(out.filter(col("updated")).count() == 0)
    assert(out.filter(col("new_bal") =!= col("c_acctbal")).count() == 0)
    assert(out.count() == customer.count())
  }

  test("latestPerKey picks exactly one row per key, the max under ordering") {
    val latest = Upsert.latestPerKey(events, "user_id", Seq(col("ts"), col("event_id")))
    val perKey = latest.groupBy("user_id").count().filter(col("count") > 1)
    assert(perKey.count() == 0)
    val maxTs = events.groupBy("user_id").agg(max("ts").as("mts"))
    val joined = latest.join(maxTs, "user_id").filter(col("ts") =!= col("mts"))
    assert(joined.count() == 0)
  }

  test("scrub replaces URLs, e-mails and digit runs, and is idempotent") {
    val df = spark.createDataFrame(Seq(
      (1L, "see https://a.b/c?d=1 then mail bob.smith+x@ex-2.org room 42"),
      (2L, "no noise here"),
      (3L, "just 123 456"))).toDF("id", "text")
    val once = df.select(col("id"), TextAnalysis.scrub(col("text")).as("s"))
    val got = once.orderBy("id").collect().map(_.getString(1)).toSeq
    assert(got == Seq(
      "see <URL> then mail <EMAIL> room <NUM>",
      "no noise here",
      "just <NUM> <NUM>"))
    val twice = once.select(col("id"), TextAnalysis.scrub(col("s")).as("s"))
    assert(twice.orderBy("id").collect().map(_.getString(1)).toSeq == got)
  }
}
