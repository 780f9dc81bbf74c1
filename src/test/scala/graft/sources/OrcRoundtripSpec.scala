package graft.sources

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S-8: ORC source/sink. Completes the format matrix (parquet S-1/S-5,
  * CSV S-4 + malformed modes S-18, JSON lines q56's sink): a
  * write→read roundtrip must be lossless, and the ORC scan must take
  * predicate pushdown and column pruning exactly like the parquet path
  * — same DataFrame API, different `format`, so the whole engine
  * surface works unchanged over ORC at any scale.
  */
class OrcRoundtripSpec extends AnyFunSuite with SparkFixture {

  test("S-8: ORC write→read roundtrip is lossless and pushes filters down") {
    val tmp = "/tmp/graft_orc_customer"
    val src = Tables.table(spark, sf0001, "customer")
    src.write.mode("overwrite").orc(tmp)

    val back = spark.read.orc(tmp)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      src.schema.map(f => (f.name, f.dataType)), "schema drift through ORC")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("c_custkey").collect().map(_.toSeq).toSeq
    assert(canon(back) == canon(src), "row drift through ORC")

    // scan quality: filter reaches the ORC reader, columns prune
    val q = back.filter(col("c_acctbal") > 1000.0)
      .select("c_custkey", "c_acctbal")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(c_acctbal), " +
      "GreaterThan(c_acctbal,1000.0)"),
      s"no ORC predicate pushdown:\n${plan.take(1500)}")
    val readSchema = "ReadSchema: [^\n]+".r.findFirstIn(plan).getOrElse("")
    assert(!readSchema.contains("c_mktsegment"),
      s"ORC column pruning failed: $readSchema")
  }
}
