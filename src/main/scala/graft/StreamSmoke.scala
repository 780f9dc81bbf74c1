package graft

import graft.streaming.Streams
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Drives the streaming surface end-to-end outside the test suite:
  * replays sf0.001 events through tumbling-window aggregation and
  * stateful sessionization into memory sinks and prints the results.
  */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = Files.createTempDirectory("stream_smoke")
    Files.copy(Paths.get(s"$sfDir/events.parquet"), dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    val q1 = Streams.tumblingCounts(Streams.readEvents(spark, dir.toString))
      .writeStream.format("memory").queryName("smoke_tumbling")
      .outputMode("complete").start()
    q1.processAllAvailable(); q1.stop()
    val windows = spark.table("smoke_tumbling").count()
    println(s"STREAM tumbling windows=$windows")

    val q2 = Streams.statefulSessionCounts(Streams.readEvents(spark, dir.toString))
      .toDF().writeStream.format("memory").queryName("smoke_sessions")
      .outputMode("update").start()
    q2.processAllAvailable(); q2.stop()
    val users = spark.table("smoke_sessions").count()
    println(s"STREAM session users=$users")
    spark.table("smoke_sessions").orderBy("user_id").show(5)

    // transformWithState variant (needs the RocksDB state store)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q3 = Streams.twsSessionCounts(Streams.readEvents(spark, dir.toString))
      .toDF().writeStream.format("memory").queryName("smoke_tws")
      .outputMode("update").start()
    q3.processAllAvailable(); q3.stop()
    val twsUsers = spark.table("smoke_tws").count()
    println(s"STREAM tws session users=$twsUsers")

    // stream-stream interval join (ST-8)
    val q4 = Streams.clickViewJoin(Streams.readEvents(spark, dir.toString))
      .writeStream.format("memory").queryName("smoke_ssjoin")
      .outputMode("append").start()
    q4.processAllAvailable(); q4.stop()
    val ssPairs = spark.table("smoke_ssjoin").count()
    println(s"STREAM click-view pairs=$ssPairs")

    // streaming content near-dup filter (ST-24)
    val docsDir = Files.createDirectory(dir.resolve("docs"))
    Files.copy(Paths.get(s"$sfDir/documents.parquet"),
      docsDir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val docsSchema = spark.read.parquet(docsDir.toString)
      .select("doc_id", "text").schema
    val docStream = spark.readStream.schema(docsSchema)
      .parquet(docsDir.toString)
    val q5 = Streams.nearDupFilter(docStream.select("doc_id", "text"))
      .toDF().writeStream.format("memory").queryName("smoke_neardup")
      .outputMode("update").start()
    q5.processAllAvailable(); q5.stop()
    val keptDocs = spark.table("smoke_neardup")
      .filter(org.apache.spark.sql.functions.col("kept")).count()
    val totalDocs = spark.table("smoke_neardup").count()
    println(s"STREAM neardup kept=$keptDocs of=$totalDocs")

    assert(windows > 0 && users > 0 && twsUsers == users && ssPairs > 0 &&
      keptDocs > 0 && keptDocs < totalDocs)
    spark.stop()
  }
}
