package graft.sources

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-layout scale gates (SURVEY §4.1 rows previously marked "not
  * exercised by t2"): static partition pruning and dynamic partition
  * pruning (DPP) over a year-partitioned copy of `orders`. At 100 TB the
  * fact tables live partitioned by date — these two rewrites are what
  * turn "scan everything" into "scan one partition", so they are pinned
  * here the same way PlanQualitySpec pins pushdown/broadcast.
  */
class PartitionPruningSpec extends AnyFunSuite with SparkFixture {

  // orders written partitioned by order year, once per suite
  private lazy val partDir: String = {
    val d = java.nio.file.Files.createTempDirectory("orders_by_year").toString
    Tables.table(spark, sf001, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(d)
    d
  }

  test("static partition pruning: a year filter scans only that partition") {
    val df = spark.read.parquet(partDir).filter(col("o_year") === 1997)
    val s = df.queryExecution.executedPlan.toString

    assert(s.contains("PartitionFilters: ["), s"no partition filters:\n${s.take(1500)}")
    assert(s.contains("(o_year"), s"o_year filter not in PartitionFilters:\n${s.take(1500)}")

    // count the files actually selected vs the total
    val scanned = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.totalNumberOfFiles
    }.get
    val all = spark.read.parquet(partDir).queryExecution.executedPlan
      .collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles
      }.get
    assert(scanned < all, s"pruning selected $scanned of $all files")

    // and the pruned read agrees with the unpartitioned table
    val expected = Tables.table(spark, sf001, "orders")
      .filter(year(col("o_orderdate")) === 1997).count()
    assert(df.count() == expected)
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    val fact = spark.read.parquet(partDir)
    // a tiny dim keyed by year; the filter on it is only usable for
    // pruning the fact side via DPP's runtime subquery broadcast. The dim
    // must be a real file scan: a LocalRelation's filter constant-folds
    // away during optimization and DPP then sees no selective predicate.
    import spark.implicits._
    val dimDir = java.nio.file.Files.createTempDirectory("dim_year").toString
    Seq((1996, "keep"), (1997, "drop")).toDF("d_year", "d_tag")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = fact.join(dim, col("o_year") === col("d_year"))
      .filter(col("d_tag") === "keep")
    val s = joined.queryExecution.executedPlan.toString
    assert(s.contains("dynamicpruningexpression"),
      s"no DPP expression in plan:\n${s.take(2000)}")
    val expected = Tables.table(spark, sf001, "orders")
      .filter(year(col("o_orderdate")) === 1996).count()
    assert(joined.count() == expected)
  }
}
