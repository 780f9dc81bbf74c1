package graft.sources

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SqlMergeSpec extends AnyFunSuite with SparkFixture {

  test("mergeInto applies update/insert/keep and the delete condition") {
    import spark.implicits._
    SqlMerge.dropManaged(spark, "sqlmerge_spec_t")
    Seq((1L, 10.0, "K"), (2L, 20.0, "K"), (3L, 30.0, "K"))
      .toDF("k", "bal", "op").createOrReplaceTempView("sqlmerge_spec_snap")
    spark.sql("""CREATE TABLE sqlmerge_spec_t USING parquet AS
                 SELECT * FROM sqlmerge_spec_snap""")
    // key 1: updated; key 2: DELETED (negative update); key 3: kept
    // (no source row); key 9: inserted
    Seq((1L, 11.0), (2L, -1.0), (9L, 90.0))
      .toDF("k", "bal").createOrReplaceTempView("sqlmerge_spec_upd")
    SqlMerge.mergeInto(spark, "sqlmerge_spec_t", "sqlmerge_spec_upd",
      "k", Seq("bal"), opColumn = Some("op"),
      deleteCondition = Some("s.bal < 0"))
    val got = spark.table("sqlmerge_spec_t")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(got == Seq((1L, 11.0, "U"), (3L, 30.0, "K"), (9L, 90.0, "I")))
    // the staging table must not linger
    assert(!spark.catalog.tableExists("sqlmerge_spec_t_merge_stage"))
    SqlMerge.dropManaged(spark, "sqlmerge_spec_t")
  }

  test("mergeInto rejects a source that does not cover the target schema") {
    import spark.implicits._
    SqlMerge.dropManaged(spark, "sqlmerge_spec_t2")
    Seq((1L, 10.0)).toDF("k", "bal")
      .createOrReplaceTempView("sqlmerge_spec_snap2")
    spark.sql("""CREATE TABLE sqlmerge_spec_t2 USING parquet AS
                 SELECT * FROM sqlmerge_spec_snap2""")
    intercept[IllegalArgumentException] {
      SqlMerge.mergeInto(spark, "sqlmerge_spec_t2", "sqlmerge_spec_snap2",
        "k", Seq("bal", "missing"))
    }
    SqlMerge.dropManaged(spark, "sqlmerge_spec_t2")
  }
}
