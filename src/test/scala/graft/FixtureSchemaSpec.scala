package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-drift tripwire (VERDICT r5 §missing-3).
  *
  * Round 5 lost 33 driver queries to a silent fixture regeneration that
  * flipped `events.ts` from ns-long to µs timestamp. This spec pins the
  * post-load schema of every fixture table, so the next drift fails ONE
  * named test instead of detonating downstream, and proves the events
  * loader normalizes BOTH physical `ts` encodings to identical values.
  */
class FixtureSchemaSpec extends AnyFunSuite with SparkFixture {

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    // ts is TimestampType POST-LOAD regardless of the physical encoding —
    // that normalization is the whole point of the adaptive loader.
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType)
  )

  for (dir <- Seq(sf0001, sf001); t <- Tables.all) {
    test(s"post-load schema of $t at ${dir.split('/').last} matches the pin") {
      val got = Tables.table(spark, dir, t).schema.map(f => f.name -> f.dataType)
      assert(got == expected(t), s"\nfixture drift in $t: got $got")
    }
  }

  test("events loader normalizes ns-long and us-ntz encodings to identical values") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-evt").toString
    import spark.implicits._
    // Micro-instants chosen to have sub-millisecond components so the
    // ns->us truncation path is actually exercised.
    val micros = Seq(1700000000123456L, 1700000999000001L, 1703123456654321L)
    micros.map(_ * 1000).toDF("ts").withColumn("event_id", monotonically_increasing_id())
      .write.mode("overwrite").parquet(s"$tmp/ns/events.parquet")
    micros.toDF("us").select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .withColumn("event_id", monotonically_increasing_id())
      .write.mode("overwrite").parquet(s"$tmp/us/events.parquet")
    val fromNs = Tables.table(spark, s"$tmp/ns", "events")
      .select(unix_micros(col("ts"))).as[Long].collect().sorted
    val fromUs = Tables.table(spark, s"$tmp/us", "events")
      .select(unix_micros(col("ts"))).as[Long].collect().sorted
    assert(fromNs.toSeq == micros.sorted, "ns-long path decoded wrong instants")
    assert(fromUs.toSeq == micros.sorted, "us-ntz path decoded wrong instants")
    assert(Tables.table(spark, s"$tmp/ns", "events").schema("ts").dataType == TimestampType)
    assert(Tables.table(spark, s"$tmp/us", "events").schema("ts").dataType == TimestampType)
  }
}
