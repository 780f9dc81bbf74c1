package graft.streaming

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Replay-equivalence harness (SURVEY §5.4): replay events.parquet
  * through each streaming operator into a memory sink and require the
  * final state to equal the batch formulation of the same logic.
  */
class StreamingSpec extends AnyFunSuite with SparkFixture {

  // the streaming file source requires a DIRECTORY; the fixture is a
  // single file — stage it into a temp dir once
  private lazy val eventsDir: String = {
    val d = Files.createTempDirectory("events_replay")
    Files.copy(Paths.get(s"$sf0001/events.parquet"), d.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    d.toString
  }

  private lazy val batchEvents = Tables.table(spark, sf0001, "events").cache()

  private var sinkId = 0
  /** Run a streaming DF to completion against a memory sink; return the
    * sink contents as a DataFrame.
    */
  private def replay(df: DataFrame, mode: String): DataFrame = {
    sinkId += 1
    val name = s"sink_$sinkId"
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** Like replay, but also returns the final state-store row count
    * (sum over stateful operators) so bounded-state claims are
    * MEASURED: an operator whose state grows with the stream instead
    * of with its key domain fails its pinned bound.
    */
  private def replayWithState(df: DataFrame, mode: String): (DataFrame, Long) = {
    sinkId += 1
    val name = s"sink_$sinkId"
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    val state = Option(q.lastProgress).toSeq
      .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
    q.stop()
    (spark.table(name), state)
  }

  private def canon(df: DataFrame): Seq[Seq[Any]] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq
  }

  test("ST-1 tumbling window replay equals batch date_trunc aggregation") {
    val stream = Streams.tumblingCounts(Streams.readEvents(spark, eventsDir))
    val got = replay(stream, "complete")
    val expected = batchEvents
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(round(sum("value"), 2).as("sv"), count(lit(1)).as("cnt"))
    assert(canon(got) == canon(expected))
  }

  test("ST-2 sliding window replay equals the oracle-anchored expansion (q65)") {
    val stream = Streams.slidingCounts(Streams.readEvents(spark, eventsDir))
    val got = replay(stream, "complete")
    // q65_sliding is the pure-epoch-arithmetic window expansion that the
    // driver hash-checks against DuckDB — comparing the replay to it
    // anchors the streaming path to the cross-engine oracle rather than
    // to Spark's own window() implementation.
    val expected = graft.queries.ContractQueries2.q65Sliding(spark, sf0001)
    assert(canon(got) == canon(expected))
    // each event lands in exactly 4 sliding windows
    val totalInWindows = got.agg(sum("cnt")).collect()(0).getLong(0)
    assert(totalInWindows == batchEvents.count() * 4)
  }

  test("ST-3 session windows: per-user session totals equal Q25") {
    val stream = Streams.sessionCounts(Streams.readEvents(spark, eventsDir))
    val got = Streams.sessionTotals(replay(stream, "complete"))
      .orderBy("user_id").limit(50)
    val expected = graft.queries.ContractQueries.q25(spark, sf0001)
    assert(canon(got) == canon(expected))
  }

  test("ST-3b session replay equals the oracle-anchored islands form (q73)") {
    // q73_sessionwin is the batch session_window query the driver
    // hash-checks against DuckDB's gaps-and-islands rewrite — comparing
    // the replay to it at SESSION granularity (start/end/count) anchors
    // the streaming path to the cross-engine oracle, like q65 does for
    // ST-2.
    val stream = Streams.sessionCounts(Streams.readEvents(spark, eventsDir))
    val (gotRaw, st3State) = replayWithState(stream, "complete")
    val got = gotRaw
      .select(col("user_id"), col("s").as("ss"), col("e").as("se"), col("n_events"))
      .orderBy("user_id", "ss").limit(200)
    val expected = graft.queries.ContractQueries3.q73SessionWin(spark, sf0001)
    assert(canon(got) == canon(expected))
    // MEASURED state bound: session-window state is one row per open
    // session — in complete mode (nothing evicted) that is exactly the
    // session count, never the event count. A state row per EVENT would
    // be unbounded at 100 TB; per session it tracks the key domain.
    val nSessions = gotRaw.count()
    val nEvents = batchEvents.count()
    assert(st3State == nSessions,
      s"session state $st3State != session count $nSessions")
    assert(st3State < nEvents,
      s"session state $st3State not below event count $nEvents")
  }

  test("ST-10 streaming approx_top_k replay equals the oracle-anchored q68") {
    val stream = Streams.topEventTypes(Streams.readEvents(spark, eventsDir))
    val (gotRaw, stateRows) = replayWithState(stream, "complete")
    // the sketch aggregate keeps ONE state row (a single global group),
    // never per-event state — the bounded-state claim, measured
    assert(stateRows <= 1L, s"sketch state grew to $stateRows rows")
    val got = gotRaw
      .select(explode(col("t")).as("e"))
      .select(col("e.item").as("event_type"), col("e.count").as("cnt"))
      .orderBy(desc("cnt"), col("event_type"))
    val expected = graft.queries.ContractQueries2.q68ApproxTopK(spark, sf0001)
    assert(canon(got) == canon(expected))
  }

  test("ST-5 streaming dedup: duplicate event_ids collapse on replay") {
    // craft a replay dir with the fixture file twice -> every event is
    // duplicated across micro-batches
    val tmp = Files.createTempDirectory("events_dup")
    val src = Paths.get(s"$sf0001/events.parquet")
    Files.copy(src, tmp.resolve("a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(src, tmp.resolve("b.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val stream = Streams.dedupByEventId(
      Streams.readEvents(spark, tmp.toString, maxFilesPerTrigger = Some(1)))
    val got = replay(stream, "append")
    assert(got.count() == batchEvents.count())
    assert(got.select("event_id").distinct().count() == batchEvents.count())
  }

  test("ST-4 watermark drops events older than the cutoff on a crafted replay") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("events_late")
    val base = "2024-06-01 12:00:00"
    def mk(rows: Seq[(Long, Long, Long)], file: String, mtime: Long): Unit = {
      val df = rows.toDF("event_id", "mins", "user_id")
        .select(col("event_id"),
          (unix_timestamp(lit(base).cast("timestamp")) + col("mins") * 60)
            .cast("long").*(lit(1000000000L)).as("ts"),
          col("user_id"), lit("t").as("event_type"),
          lit(1.0).as("value"), lit("{}").as("props"))
      val out = tmp.resolve(file + ".tmpdir")
      df.coalesce(1).write.mode("overwrite").parquet(out.toString)
      val part = Files.list(out).filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = tmp.resolve(file)
      Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
      dst.toFile.setLastModified(mtime)
    }
    // Three micro-batches: f1 at 12:00..13:00 advances the watermark to
    // 12:50; f2 keeps it moving; f3 carries a 2h-late event (11:00).
    // Two behaviors measured in THIS repo (Spark 4.1.2), both asserted:
    //  - dropDuplicates does NOT filter late input rows (only evicts
    //    state), so watermark-drop tests must aggregate;
    //  - since the multiple-stateful-operator change, late-record
    //    filtering uses the PREVIOUS batch's watermark
    //    (watermarkForLateEvents), so a late row is only dropped when it
    //    arrives >= 2 batches after the event that advanced the
    //    watermark — hence three files, not two.
    val t0 = System.currentTimeMillis() - 100000
    mk(Seq((1L, 0L, 1L), (2L, 30L, 1L), (3L, 60L, 1L)), "f1.parquet", t0)
    mk(Seq((4L, 70L, 1L)), "f2.parquet", t0 + 30000)
    mk(Seq((5L, -60L, 1L), (6L, 80L, 1L)), "f3.parquet", t0 + 60000)
    val stream = Streams.tumblingCounts(
      Streams.readEvents(spark, tmp.toString, maxFilesPerTrigger = Some(1)),
      watermark = "10 minutes")
    val got = replay(stream, "append")
    val byHour = got.collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(3)).toMap
    assert(!byHour.keySet.exists(_.startsWith("2024-06-01 11:")),
      s"late event created a watermark-expired window: $byHour")
    assert(byHour.getOrElse("2024-06-01 12:00:00.0", 0L) == 2L,
      s"on-time window wrong: $byHour")
  }

  test("ST-9 dropDuplicatesWithinWatermark: dedup while state lives, re-emit after eviction") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("events_wmdedup")
    val base = "2024-06-01 12:00:00"
    def mk(rows: Seq[(Long, Long, Long)], file: String, mtime: Long): Unit = {
      val df = rows.toDF("event_id", "mins", "user_id")
        .select(col("event_id"),
          (unix_timestamp(lit(base).cast("timestamp")) + col("mins") * 60)
            .cast("long").*(lit(1000000000L)).as("ts"),
          col("user_id"), lit("t").as("event_type"),
          lit(1.0).as("value"), lit("{}").as("props"))
      val out = tmp.resolve(file + ".tmpdir")
      df.coalesce(1).write.mode("overwrite").parquet(out.toString)
      val part = Files.list(out).filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.move(part, tmp.resolve(file), StandardCopyOption.REPLACE_EXISTING)
      tmp.resolve(file).toFile.setLastModified(mtime)
    }
    // f1: events 1 (12:00) and 2 (12:10).
    // f2: duplicate id=1 at 12:05 — state alive -> DROPPED; id=3 at
    //     13:30 is the watermark source (wm -> 13:20).
    // f3: filler id=5 at 13:35 — watermark advancement lags one batch
    //     (the ST-4 lesson), so id=1's state is evicted here.
    // f4: id=1 again at 13:40 with state evicted -> RE-EMITTED; id=4.
    val t0 = System.currentTimeMillis() - 100000
    mk(Seq((1L, 0L, 1L), (2L, 10L, 1L)), "f1.parquet", t0)
    mk(Seq((1L, 5L, 1L), (3L, 90L, 1L)), "f2.parquet", t0 + 30000)
    mk(Seq((5L, 95L, 1L)), "f3.parquet", t0 + 60000)
    mk(Seq((1L, 100L, 1L), (4L, 110L, 1L)), "f4.parquet", t0 + 90000)
    val stream = Streams.dedupWithinWatermark(
      Streams.readEvents(spark, tmp.toString, maxFilesPerTrigger = Some(1)),
      watermark = "10 minutes")
    val (gotDf, stateRows) = replayWithState(stream, "append")
    // state holds only ids seen within the live watermark window (1 and
    // 4 after f4; older entries evicted) — measured, not narrated
    assert(stateRows <= 4L, s"watermark dedup state grew to $stateRows rows")
    val got = gotDf
      .select("event_id").collect().map(_.getLong(0)).toSeq.sorted
    // id=1 twice (before and after eviction); 2, 3, 4, 5 once each
    assert(got == Seq(1L, 1L, 2L, 3L, 4L, 5L), s"got $got")
  }

  test("ST-13 streaming corpus scoring replays equal to the batch text stages") {
    // stage documents.parquet as a stream directory
    val d = Files.createTempDirectory("docs_replay")
    Files.copy(Paths.get(s"$sf0001/documents.parquet"), d.resolve("documents.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val batchDocs = Tables.table(spark, sf0001, "documents")
    val stream = spark.readStream
      .schema(batchDocs.schema)
      .parquet(d.toString)
    val got = replay(Streams.scoreDocs(stream), "append")
    val expected = Streams.scoreDocs(batchDocs)
    assert(canon(got) == canon(expected))
    assert(got.columns.contains("quality") && got.columns.contains("lang_id"))
  }

  test("ST-15 point-in-time enrichment against an SCD2 dimension equals batch; " +
      "every event gets exactly one version") {
    // dimension: each user's value history as SCD2 validity intervals
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("dim_user").orderBy("valid_from", "eid")
    val dim = batchEvents.filter(col("user_id") <= 30)
      .select(col("user_id").as("dim_user"), col("ts").as("valid_from"),
        round(col("value"), 2).as("dim_v"), col("event_id").as("eid"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .drop("eid")
    val stream = Streams.readEvents(spark, eventsDir)
      .filter(col("user_id") <= 30)
    val got = replay(Streams.enrichPointInTime(stream, dim)
      .select(col("event_id"), col("dim_v")), "append")
    val expected = Streams.enrichPointInTime(
        batchEvents.filter(col("user_id") <= 30), dim)
      .select(col("event_id"), col("dim_v"))
    assert(canon(got) == canon(expected))
    // point-in-time correctness: exactly ONE dimension version per event
    // (intervals partition each user's timeline)
    val n = batchEvents.filter(col("user_id") <= 30).count()
    assert(got.count() == n, s"expected $n enriched events, got ${got.count()}")
  }

  test("ST-14 streaming drift histogram: derived PSI equals batch Drift.psiBins") {
    // current slice (odd users) streams; even users are the static
    // reference. The sink's histogram + the reference histogram must
    // yield exactly the batch operator's per-bin PSI contributions.
    val binW = 20.0; val nBins = 5
    val stream = Streams.readEvents(spark, eventsDir)
      .filter(col("user_id") % 2 === 1)
    val got = replay(Streams.valueBins(stream, binW, nBins), "complete")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val ref = batchEvents.filter(col("user_id") % 2 === 0)
      .select(least(floor(col("value") / binW), lit(nBins - 1))
        .cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val bins = (got.keySet ++ ref.keySet).toSeq.sorted
    val (nCur, nRef) = (got.values.sum.toDouble, ref.values.sum.toDouble)
    val psiStream = bins.map { b =>
      val p = (ref.getOrElse(b, 0L) + 1) / (nRef + nBins)
      val q = (got.getOrElse(b, 0L) + 1) / (nCur + nBins)
      (p - q) * math.log(p / q)
    }.sum
    val psiBatch = graft.ops.Drift.psiBins(batchEvents,
        value = col("value"), isRef = col("user_id") % 2 === 0,
        binWidth = binW, nBins = nBins)
      .agg(sum("contrib")).collect()(0).getDouble(0)
    assert(math.abs(psiStream - psiBatch) < 1e-12,
      s"stream-derived PSI $psiStream != batch $psiBatch")
  }

  test("ST-6 stream-static join equals batch join") {
    val customers = Tables.table(spark, sf0001, "customer")
      .select("c_custkey", "c_mktsegment")
    val stream = Streams.enrichWithCustomers(
        Streams.readEvents(spark, eventsDir), customers)
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    val got = replay(stream, "complete")
    val expected = batchEvents.join(customers,
        batchEvents("user_id") === customers("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    assert(canon(got) == canon(expected))
  }

  test("S-7 parquet sink and foreachBatch write streaming output durably") {
    val outDir = Files.createTempDirectory("stream_out")
    // parquet streaming sink (append) with checkpoint
    val q1 = Streams.dedupByEventId(Streams.readEvents(spark, eventsDir))
      .writeStream.format("parquet")
      .option("path", s"$outDir/parquet")
      .option("checkpointLocation", s"$outDir/cp1")
      .outputMode("append").start()
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(s"$outDir/parquet").count() == batchEvents.count())

    // foreachBatch: arbitrary per-micro-batch logic (here: upsert-style
    // write of an aggregation)
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val q2 = Streams.tumblingCounts(Streams.readEvents(spark, eventsDir))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        seen.addAndGet(batch.count())
        batch.write.mode("overwrite").parquet(s"$outDir/fb_$id")
      }
      .outputMode("complete").start()
    q2.processAllAvailable(); q2.stop()
    assert(seen.get() > 0)
  }

  test("ST-19 idempotent foreachBatch sink survives batch re-delivery and heals partial writes") {
    val outDir = Files.createTempDirectory("stream_idem").toString
    // Two-file replay with maxFilesPerTrigger=1 forces >= 2 micro-batches.
    val tmp = Files.createTempDirectory("events_idem")
    val src = Paths.get(s"$sf0001/events.parquet")
    Files.copy(src, tmp.resolve("a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(src, tmp.resolve("b.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val stream = spark.readStream
      .schema(Streams.readEvents(spark, eventsDir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(tmp.toString)
      .select(col("event_id"), col("user_id"), col("value"))
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        Streams.idempotentBatchWrite(batch.toDF(), id, outDir)
      }
      .option("checkpointLocation", s"$outDir/_cp")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val afterRun = spark.read.parquet(s"$outDir/batch=*").count()
    assert(afterRun == batchEvents.count() * 2, "both micro-batches landed")

    // Simulated at-least-once re-delivery: batch 0 arrives AGAIN (same
    // id, possibly different plan) -> the sink's own marker makes it a
    // no-op; contents must be unchanged.
    Streams.idempotentBatchWrite(
      batchEvents.select(col("event_id"), col("user_id"), col("value")).limit(5),
      0L, outDir)
    assert(spark.read.parquet(s"$outDir/batch=*").count() == afterRun,
      "re-delivered batch 0 must not duplicate or overwrite")

    // A half-written partition (files present, no _SUCCESS marker — the
    // crash-mid-write shape) must be healed by a full rewrite.
    val half = new java.io.File(s"$outDir/batch=7"); half.mkdirs()
    batchEvents.select(col("event_id"), col("user_id"), col("value")).limit(3)
      .write.mode("overwrite").parquet(half.toString)
    // note: the committer's _SUCCESS may be present — the sink's own
    // explicit marker is what gates, so a partial write is healed even
    // when success markers are enabled (committer-independent)
    new java.io.File(half, "_GRAFT_COMMITTED").delete()
    Streams.idempotentBatchWrite(
      batchEvents.select(col("event_id"), col("user_id"), col("value")).limit(10),
      7L, outDir)
    assert(spark.read.parquet(s"$outDir/batch=7").count() == 10,
      "markerless partial partition must be rewritten, not trusted")
  }

  test("ST-20 token-bucket rate limiter replay equals the batch fold") {
    // Two TIME-DISJOINT halves force multiple micro-batches that
    // arrive in event-time order (a token bucket is an order-sensitive
    // fold — replay equality is only defined for identically-ordered
    // input); the bucket state (lastUs, milliTokens, counters) must
    // carry across the boundary for the final per-user row to equal
    // the single-pass batch fold.
    val tmp = Files.createTempDirectory("events_bucket")
    val all = batchEvents.orderBy("ts", "event_id")
    val cut = all.select(expr("percentile(unix_micros(ts), 0.5)"))
      .collect()(0).getDouble(0).toLong
    all.filter(unix_micros(col("ts")) <= cut)
      .coalesce(1).write.parquet(s"$tmp/a")
    all.filter(unix_micros(col("ts")) > cut)
      .coalesce(1).write.parquet(s"$tmp/b")
    Files.move(Files.list(Paths.get(s"$tmp/a")).filter(_.toString.endsWith(".parquet")).findFirst().get(),
      Paths.get(s"$tmp/a.parquet"))
    Files.move(Files.list(Paths.get(s"$tmp/b")).filter(_.toString.endsWith(".parquet")).findFirst().get(),
      Paths.get(s"$tmp/b.parquet"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$tmp/a"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$tmp/b"))
    // FileStreamSource orders files by modification time; both moves can
    // land in the same timestamp granule, which would let b process first
    // and diverge the order-sensitive token-bucket fold. Pin distinct
    // mtimes so a.parquet always precedes b.parquet.
    Files.setLastModifiedTime(Paths.get(s"$tmp/a.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(1000000000000L))
    Files.setLastModifiedTime(Paths.get(s"$tmp/b.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(1000000002000L))
    val schema = Streams.readEvents(spark, eventsDir).schema
    val streamIn = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(tmp.toString)
    val (gotRaw, st20State) = replayWithState(
      Streams.tokenBucketCounts(streamIn).toDF(), "update")
    val got = gotRaw
      .groupBy("user_id")
      .agg(max("n_events").as("n_events"),
        max("n_throttled").as("n_throttled"))
    val batchIn = spark.read.parquet(s"$tmp/a.parquet", s"$tmp/b.parquet")
    val expected = Streams.tokenBucketBatch(batchIn).toDF()
    assert(canon(got) == canon(expected))
    // the limiter must actually bite on the doubled stream
    val throttled = expected.agg(sum("n_throttled")).collect()(0).getLong(0)
    assert(throttled > 0, "expected some throttling on the doubled stream")
    // one bucket row per user — state scales with the key domain only
    val nUsers = batchEvents.select("user_id").distinct().count()
    assert(st20State == nUsers,
      s"token-bucket state $st20State != user count $nUsers")
  }

  test("ST-23 keyed streaming EWMA replay equals the batch fold") {
    // Same ordering contract as ST-20: the EWMA recursion is an
    // order-sensitive integer fold, so the split is time-disjoint with
    // pinned file mtimes; the (ewma, count) state must carry across
    // the micro-batch boundary for the final per-type level to match
    // the single-pass batch fold.
    val tmp = Files.createTempDirectory("events_ewma")
    val all = batchEvents.orderBy("ts", "event_id")
    val cut = all.select(expr("percentile(unix_micros(ts), 0.5)"))
      .collect()(0).getDouble(0).toLong
    all.filter(unix_micros(col("ts")) <= cut)
      .coalesce(1).write.parquet(s"$tmp/a")
    all.filter(unix_micros(col("ts")) > cut)
      .coalesce(1).write.parquet(s"$tmp/b")
    Files.move(Files.list(Paths.get(s"$tmp/a")).filter(_.toString.endsWith(".parquet")).findFirst().get(),
      Paths.get(s"$tmp/a.parquet"))
    Files.move(Files.list(Paths.get(s"$tmp/b")).filter(_.toString.endsWith(".parquet")).findFirst().get(),
      Paths.get(s"$tmp/b.parquet"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$tmp/a"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$tmp/b"))
    Files.setLastModifiedTime(Paths.get(s"$tmp/a.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(1000000000000L))
    Files.setLastModifiedTime(Paths.get(s"$tmp/b.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(1000000002000L))
    val schema = Streams.readEvents(spark, eventsDir).schema
    val streamIn = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(tmp.toString)
    val (gotRaw, st23State) = replayWithState(
      Streams.ewmaByType(streamIn).toDF(), "update")
    // update mode re-emits per micro-batch: the final row per type is
    // the one with the max running count
    val got = gotRaw
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type")
          .orderBy(col("n_events").desc)))
      .filter(col("rk") === 1).drop("rk")
    val batchIn = spark.read.parquet(s"$tmp/a.parquet", s"$tmp/b.parquet")
    val expected = Streams.ewmaByTypeBatch(batchIn).toDF()
    assert(canon(got) == canon(expected))
    // one state row per event type — O(key domain) only
    val nTypes = batchEvents.select("event_type").distinct().count()
    assert(st23State == nTypes,
      s"ewma state $st23State != type count $nTypes")
  }

  test("ST-25 keyed streaming anomaly flagger replay equals the batch fold") {
    // Prequential fold ⇒ order-sensitive, same time-disjoint split +
    // pinned-mtime discipline as ST-23; the (n, Σx, Σx², flagged)
    // state must carry across the micro-batch boundary.
    val tmp = Files.createTempDirectory("events_anom")
    val all = batchEvents.orderBy("ts", "event_id")
    val cut = all.select(expr("percentile(unix_micros(ts), 0.5)"))
      .collect()(0).getDouble(0).toLong
    all.filter(unix_micros(col("ts")) <= cut)
      .coalesce(1).write.parquet(s"$tmp/a")
    all.filter(unix_micros(col("ts")) > cut)
      .coalesce(1).write.parquet(s"$tmp/b")
    Files.move(Files.list(Paths.get(s"$tmp/a")).filter(_.toString.endsWith(".parquet")).findFirst().get(),
      Paths.get(s"$tmp/a.parquet"))
    Files.move(Files.list(Paths.get(s"$tmp/b")).filter(_.toString.endsWith(".parquet")).findFirst().get(),
      Paths.get(s"$tmp/b.parquet"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$tmp/a"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$tmp/b"))
    Files.setLastModifiedTime(Paths.get(s"$tmp/a.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(1000000000000L))
    Files.setLastModifiedTime(Paths.get(s"$tmp/b.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(1000000002000L))
    val schema = Streams.readEvents(spark, eventsDir).schema
    val streamIn = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(tmp.toString)
    val (gotRaw, st25State) = replayWithState(
      Streams.anomalyByType(streamIn).toDF(), "update")
    val got = gotRaw
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type")
          .orderBy(col("n_events").desc)))
      .filter(col("rk") === 1).drop("rk")
    val batchIn = spark.read.parquet(s"$tmp/a.parquet", s"$tmp/b.parquet")
    val expected = Streams.anomalyByTypeBatch(batchIn).toDF()
    assert(canon(got) == canon(expected))
    // the screen must actually fire on the fixture (37±/type at sf0.01)
    val flagged = expected.agg(sum("n_flagged")).collect()(0).getLong(0)
    assert(flagged > 0, "expected some anomaly flags on the fixture stream")
    // one state row per event type — O(key domain) only
    val nTypes = batchEvents.select("event_type").distinct().count()
    assert(st25State == nTypes,
      s"anomaly state $st25State != type count $nTypes")
  }

  test("ST-27 checkpoint recovery: a restarted stateful query is exactly-once end-to-end") {
    // Fault tolerance, MEASURED: run a stateful windowed aggregation
    // over file 1, STOP the query (simulated driver death), drop file
    // 2 in, start a NEW query from the SAME checkpoint into the same
    // parquet sink. Offsets AND window state must both recover: the
    // final sink contents must equal the batch aggregate of file1 ∪
    // file2 for windows the final watermark closed — no window lost
    // (state recovered), none double-counted (offsets recovered).
    val tmp = Files.createTempDirectory("events_ckpt")
    val ckpt = s"$tmp/checkpoint"
    val outDir = s"$tmp/out"
    val inDir = s"$tmp/in"
    Files.createDirectory(Paths.get(inDir))
    val all = batchEvents.orderBy("ts", "event_id")
    val cut = all.select(expr("percentile(unix_micros(ts), 0.5)"))
      .collect()(0).getDouble(0).toLong
    all.filter(unix_micros(col("ts")) <= cut)
      .coalesce(1).write.parquet(s"$tmp/a")
    Files.move(Files.list(Paths.get(s"$tmp/a")).filter(_.toString.endsWith(".parquet")).findFirst().get(),
      Paths.get(s"$inDir/a.parquet"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$tmp/a"))
    val schema = Streams.readEvents(spark, eventsDir).schema
    def agg() = Streams.readEvents(spark, inDir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
    def run(): Unit = {
      val q = agg().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    run() // first life: file 1 only
    all.filter(unix_micros(col("ts")) > cut)
      .coalesce(1).write.parquet(s"$tmp/b")
    Files.move(Files.list(Paths.get(s"$tmp/b")).filter(_.toString.endsWith(".parquet")).findFirst().get(),
      Paths.get(s"$inDir/b.parquet"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$tmp/b"))
    run() // second life: recovered from the same checkpoint
    val got = spark.read.schema(
        "ws TIMESTAMP, event_type STRING, n BIGINT").parquet(outDir)
    val wmFinal = batchEvents
      .select(max(unix_millis(col("ts")))).collect()(0).getLong(0) -
      10L * 60 * 1000
    val expected = batchEvents
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
      .filter(unix_millis(col("ws")) + 3600000L <= wmFinal)
    assert(canon(got) == canon(expected))
    assert(got.count() > 0, "expected some finalized windows")
  }

  test("ST-26 timer-finalized sessions equal the batch sessionization modulo watermark") {
    // Event-time timers: a session with NO successor event can only be
    // emitted by handleExpiredTimer once the watermark passes
    // lastTs + gap. Expected emission set, computed in batch: every
    // session EXCEPT a user's final one, plus final sessions provably
    // closed under the final watermark (end + 30 min ≤ max ts − 10 min).
    val tmp = Files.createTempDirectory("events_tsess")
    val all = batchEvents.orderBy("ts", "event_id")
    val cut = all.select(expr("percentile(unix_micros(ts), 0.5)"))
      .collect()(0).getDouble(0).toLong
    all.filter(unix_micros(col("ts")) <= cut)
      .coalesce(1).write.parquet(s"$tmp/a")
    all.filter(unix_micros(col("ts")) > cut)
      .coalesce(1).write.parquet(s"$tmp/b")
    Files.move(Files.list(Paths.get(s"$tmp/a")).filter(_.toString.endsWith(".parquet")).findFirst().get(),
      Paths.get(s"$tmp/a.parquet"))
    Files.move(Files.list(Paths.get(s"$tmp/b")).filter(_.toString.endsWith(".parquet")).findFirst().get(),
      Paths.get(s"$tmp/b.parquet"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$tmp/a"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$tmp/b"))
    Files.setLastModifiedTime(Paths.get(s"$tmp/a.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(1000000000000L))
    Files.setLastModifiedTime(Paths.get(s"$tmp/b.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(1000000002000L))
    val schema = Streams.readEvents(spark, eventsDir).schema
    val streamIn = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(tmp.toString)
    // timers need multiple state-store column families → RocksDB
    // provider (HDFSBackedStateStoreProvider rejects them)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val (got, st26State) =
      try replayWithState(Streams.timerSessions(streamIn).toDF(), "append")
      finally prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    val batchIn = spark.read.parquet(s"$tmp/a.parquet", s"$tmp/b.parquet")
    val sessions = Streams.gapSessionsBatch(batchIn)
    val wmFinal = batchIn.select(max(unix_millis(col("ts")))).collect()(0)
      .getLong(0) - 10L * 60 * 1000
    val lastW = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("end_ms").desc)
    val expected = sessions
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(lastW))
      .filter(col("rk") > 1 ||
        col("end_ms") + 30L * 60 * 1000 <= wmFinal)
      .select("user_id", "start_ms", "end_ms", "n_events")
    assert(canon(got) == canon(expected))
    assert(got.count() > 0, "expected some closed sessions")
    // state holds OPEN sessions only — at most one row per user
    val nUsers = batchEvents.select("user_id").distinct().count()
    assert(st26State <= nUsers,
      s"timer-session state $st26State > user count $nUsers")
  }

  test("ST-28 MapState/ListState user profiles replay equals the batch profile") {
    // Composite typed state: MapState counts per (user, type) updated
    // in place, ListState trimmed to the last-3 ids. Same
    // time-disjoint split + pinned mtimes as ST-23; state must carry.
    val tmp = Files.createTempDirectory("events_prof")
    val all = batchEvents.orderBy("ts", "event_id")
    val cut = all.select(expr("percentile(unix_micros(ts), 0.5)"))
      .collect()(0).getDouble(0).toLong
    all.filter(unix_micros(col("ts")) <= cut)
      .coalesce(1).write.parquet(s"$tmp/a")
    all.filter(unix_micros(col("ts")) > cut)
      .coalesce(1).write.parquet(s"$tmp/b")
    Files.move(Files.list(Paths.get(s"$tmp/a")).filter(_.toString.endsWith(".parquet")).findFirst().get(),
      Paths.get(s"$tmp/a.parquet"))
    Files.move(Files.list(Paths.get(s"$tmp/b")).filter(_.toString.endsWith(".parquet")).findFirst().get(),
      Paths.get(s"$tmp/b.parquet"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$tmp/a"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$tmp/b"))
    Files.setLastModifiedTime(Paths.get(s"$tmp/a.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(1000000000000L))
    Files.setLastModifiedTime(Paths.get(s"$tmp/b.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(1000000002000L))
    val schema = Streams.readEvents(spark, eventsDir).schema
    val streamIn = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(tmp.toString)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val gotRaw =
      try replay(Streams.userProfiles(streamIn).toDF(), "update")
      finally prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    val got = gotRaw
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("n_events").desc)))
      .filter(col("rk") === 1).drop("rk")
    val batchIn = spark.read.parquet(s"$tmp/a.parquet", s"$tmp/b.parquet")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
    val uw = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val tops = batchIn.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        uw.orderBy(col("cnt").desc, col("event_type").asc)))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("event_type").as("top_type"),
        col("cnt").as("top_n"))
    val recents = batchIn
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        uw.orderBy(col("us").desc, col("event_id").desc)))
      .filter(col("rk") <= 3)
      .groupBy("user_id")
      // sort the kept (us, eid) structs ascending so the csv matches
      // the stream's append order (collect_list alone is unordered)
      .agg(concat_ws(",", transform(
        sort_array(collect_list(struct(col("us"), col("event_id")))),
        x => x.getField("event_id"))).as("recent"),
        count(lit(1)).as("n_r"))
    val expected = batchIn.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
      .join(tops, Seq("user_id")).join(recents.drop("n_r"), Seq("user_id"))
      .select("user_id", "n_events", "top_type", "top_n", "recent")
    assert(canon(got) == canon(expected))
  }

  test("ST-29 windowed trending top-k: timer-finalized leaderboards equal " +
      "the batch rank for watermark-closed hours") {
    // Per-hour RANKED top-3 event types, emitted exactly once when the
    // watermark passes the hour end — the leaderboard ST-1's raw
    // window counts and ST-10's global sketch stop short of. Same
    // time-disjoint two-file split + pinned mtimes as ST-26 so state
    // and timers must carry across micro-batches.
    val tmp = Files.createTempDirectory("events_trend")
    val all = batchEvents.orderBy("ts", "event_id")
    val cut = all.select(expr("percentile(unix_micros(ts), 0.5)"))
      .collect()(0).getDouble(0).toLong
    all.filter(unix_micros(col("ts")) <= cut)
      .coalesce(1).write.parquet(s"$tmp/a")
    all.filter(unix_micros(col("ts")) > cut)
      .coalesce(1).write.parquet(s"$tmp/b")
    Files.move(Files.list(Paths.get(s"$tmp/a")).filter(_.toString.endsWith(".parquet")).findFirst().get(),
      Paths.get(s"$tmp/a.parquet"))
    Files.move(Files.list(Paths.get(s"$tmp/b")).filter(_.toString.endsWith(".parquet")).findFirst().get(),
      Paths.get(s"$tmp/b.parquet"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$tmp/a"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$tmp/b"))
    Files.setLastModifiedTime(Paths.get(s"$tmp/a.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(1000000000000L))
    Files.setLastModifiedTime(Paths.get(s"$tmp/b.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(1000000002000L))
    val schema = Streams.readEvents(spark, eventsDir).schema
    val streamIn = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(tmp.toString)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val (got, st29State) =
      try replayWithState(Streams.trendingTypes(streamIn).toDF(), "append")
      finally prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    val batchIn = spark.read.parquet(s"$tmp/a.parquet", s"$tmp/b.parquet")
    val wmFinal = batchIn.select(max(unix_millis(col("ts")))).collect()(0)
      .getLong(0) - 10L * 60 * 1000
    // strict <: Spark expires event-time timers only when timer <
    // watermark, so an hour whose close lands EXACTLY on the final
    // watermark is still open in the stream — the batch anchor must
    // exclude it too or the comparison flakes on boundary-aligned data
    val expected = Streams.trendingBatch(batchIn)
      .filter(col("hour_ms") + 3600L * 1000 < wmFinal)
    assert(canon(got) == canon(expected))
    assert(got.count() > 0, "expected some closed leaderboards")
    // state = open hours × (types + armed flag), never O(stream)
    val nHours = batchIn
      .select((unix_millis(col("ts")) - pmod(unix_millis(col("ts")),
        lit(3600L * 1000))).as("h")).distinct().count()
    val nTypes = batchIn.select("event_type").distinct().count()
    assert(st29State <= nHours * (nTypes + 1),
      s"trending state $st29State > ${nHours * (nTypes + 1)}")
  }

  test("ST-30 transformWithState kill-and-restart: timers + MapState recover " +
      "from the RocksDB checkpoint") {
    // The ST-27 driver-death pattern applied to the transformWithState
    // surface — the operators with the MOST state machinery (event-time
    // timers + MapState + armed ValueState) had replay and state pins
    // but no restart gate. Life 1 processes the first half of the
    // events and STOPS (armed timers + in-flight per-hour counts live
    // only in the RocksDB checkpoint); life 2 starts a NEW query from
    // the SAME checkpoint over the second half. Hours straddling the
    // restart are correct ONLY if (a) the MapState counts recovered,
    // (b) the armed timers recovered and fire when the new watermark
    // passes them, and (c) file-source offsets recovered (no double
    // count) — the final sink must equal the batch leaderboard of
    // file1 ∪ file2 for watermark-closed hours, exactly once.
    val tmp = Files.createTempDirectory("events_twsr")
    val ckpt = s"$tmp/checkpoint"
    val outDir = s"$tmp/out"
    val inDir = s"$tmp/in"
    Files.createDirectory(Paths.get(inDir))
    val all = batchEvents.orderBy("ts", "event_id")
    val cut = all.select(expr("percentile(unix_micros(ts), 0.5)"))
      .collect()(0).getDouble(0).toLong
    def land(name: String, half: DataFrame): Unit = {
      half.coalesce(1).write.parquet(s"$tmp/$name")
      Files.move(Files.list(Paths.get(s"$tmp/$name"))
        .filter(_.toString.endsWith(".parquet")).findFirst().get(),
        Paths.get(s"$inDir/$name.parquet"))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$tmp/$name"))
    }
    land("a", all.filter(unix_micros(col("ts")) <= cut))
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    var st30State = 0L
    try {
      def run(): Unit = {
        val q = Streams.trendingTypes(Streams.readEvents(spark, inDir)).toDF()
          .writeStream.format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .outputMode("append").start()
        q.processAllAvailable()
        st30State = Option(q.lastProgress).toSeq
          .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
        q.stop()
      }
      run() // life 1: first half, then simulated driver death
      land("b", all.filter(unix_micros(col("ts")) > cut))
      run() // life 2: recovered timers + MapState from the checkpoint
    } finally prevProvider match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
    val got = spark.read.schema(
      "hour_ms BIGINT, rank INT, event_type STRING, cnt BIGINT").parquet(outDir)
    val batchIn = spark.read.parquet(s"$inDir/a.parquet", s"$inDir/b.parquet")
    val wmFinal = batchIn.select(max(unix_millis(col("ts")))).collect()(0)
      .getLong(0) - 10L * 60 * 1000
    // strict <: timers expire only when timer < watermark (ST-29 rule)
    val expected = Streams.trendingBatch(batchIn)
      .filter(col("hour_ms") + 3600L * 1000 < wmFinal)
    assert(canon(got) == canon(expected))
    assert(got.count() > 0, "expected some closed leaderboards")
    // state pin intact after restart: open hours × (types + armed flag)
    val nHours = batchIn
      .select((unix_millis(col("ts")) - pmod(unix_millis(col("ts")),
        lit(3600L * 1000))).as("h")).distinct().count()
    val nTypes = batchIn.select("event_type").distinct().count()
    assert(st30State <= nHours * (nTypes + 1),
      s"post-restart trending state $st30State > ${nHours * (nTypes + 1)}")
  }

  test("ST-11 foreachBatch incremental CDC merge equals the global batch upsert") {
    // The lakehouse MERGE pattern without a table format: each
    // micro-batch folds into a running latest-per-key state via
    // ops.Upsert. Incremental merge ≡ global latest BECAUSE
    // latest-per-key under a total (ts, event_id) order is an
    // associative fold — which is exactly what this replay pins.
    // Two-file replay (fixture twice, maxFilesPerTrigger=1) forces
    // multiple batches; duplicate ids tie on (ts, event_id) with equal
    // values, so the fold is unaffected.
    val tmp = Files.createTempDirectory("events_cdc")
    val src = Paths.get(s"$sf0001/events.parquet")
    Files.copy(src, tmp.resolve("a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(src, tmp.resolve("b.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val state = new java.util.concurrent.atomic.AtomicReference[DataFrame](null)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = Streams.readEvents(spark, tmp.toString, maxFilesPerTrigger = Some(1))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val updates = batch.select("user_id", "value", "ts", "event_id")
        batches.incrementAndGet()
        val merged = graft.ops.Upsert.latestPerKey(
          Option(state.get).fold(updates)(_.unionByName(updates)),
          "user_id", Seq(col("ts"), col("event_id")))
        // materialize so the next fold doesn't re-read sink state lazily
        import scala.jdk.CollectionConverters._
        state.set(spark.createDataFrame(
          merged.collect().toSeq.asJava, merged.schema))
        ()
      }
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    assert(batches.get >= 2, s"expected a multi-batch replay, got ${batches.get}")
    val expected = graft.ops.Upsert.latestPerKey(
      batchEvents.select("user_id", "value", "ts", "event_id"),
      "user_id", Seq(col("ts"), col("event_id")))
    assert(canon(state.get) == canon(expected))
    // MEASURED state bound: the CDC merge state is one row per KEY —
    // it grows with the key domain, never with the change stream. A
    // state that kept superseded versions would be unbounded at 100 TB.
    val nKeys = batchEvents.select("user_id").distinct().count()
    assert(state.get.count() == nKeys,
      s"CDC state ${state.get.count()} rows != key domain $nKeys")
  }

  test("ST-17 foreachBatch incremental aggregate maintenance equals one-pass " +
      "batch state") {
    // The streaming face of E-74: each micro-batch folds its mergeable
    // (count,sum,min,max) state into the running state via
    // IncrementalAgg.merge; associativity makes the fold order-free, so
    // the final state must equal the one-pass batch aggregation.
    val tmp = Files.createTempDirectory("events_incragg")
    val src = Paths.get(s"$sf0001/events.parquet")
    Files.copy(src, tmp.resolve("a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(src, tmp.resolve("b.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val state = new java.util.concurrent.atomic.AtomicReference[DataFrame](null)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = Streams.readEvents(spark, tmp.toString, maxFilesPerTrigger = Some(1))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batches.incrementAndGet()
        val s = graft.ops.IncrementalAgg.state(batch,
          col("user_id") % 10, col("value"))
        val merged = Option(state.get)
          .fold(s)(prev => graft.ops.IncrementalAgg.merge(prev, s))
        import scala.jdk.CollectionConverters._
        state.set(spark.createDataFrame(
          merged.collect().toSeq.asJava, merged.schema))
        ()
      }
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    assert(batches.get >= 2, s"expected a multi-batch replay, got ${batches.get}")
    // both fixture copies stream through, so the expected one-pass
    // state is over the DOUBLED events
    val expected = graft.ops.IncrementalAgg.state(
      batchEvents.unionByName(batchEvents), col("user_id") % 10, col("value"))
    def m(df: DataFrame) = canon(graft.ops.IncrementalAgg.metrics(df)
      .select(col("k"), col("n"), round(col("s"), 2).as("s"),
        round(col("avg"), 4).as("a"), round(col("mn"), 2),
        round(col("mx"), 2)))
    assert(m(state.get) == m(expected))
  }

  test("ST-31 foreachBatch incremental KLL rollup lands in the batch rank gate") {
    // The streaming face of E-468: each micro-batch collapses to one
    // KLL(800) sketch blob per event_type (kllBatchState), folded into
    // the running state with kll_merge_agg_double (kllMergeState) —
    // state is O(keys · k) regardless of stream length, where an exact
    // streaming percentile would hold the full value multiset. KLL
    // compaction is randomized, so the gate is E-468's rank bracket:
    // the EXACT p50/p95 of the replayed data must lie between the
    // merged sketch's quantiles at ranks ±1% (3× the k=800 rank-error
    // bound) — a value-density-independent check that cannot flake.
    val tmp = Files.createTempDirectory("events_kll")
    val src = Paths.get(s"$sf0001/events.parquet")
    Files.copy(src, tmp.resolve("a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(src, tmp.resolve("b.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val state = new java.util.concurrent.atomic.AtomicReference[DataFrame](null)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = Streams.readEvents(spark, tmp.toString, maxFilesPerTrigger = Some(1))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batches.incrementAndGet()
        val s = Streams.kllBatchState(batch, "event_type", "value")
        val merged = Option(state.get)
          .fold(s)(prev => Streams.kllMergeState(prev, s, "event_type"))
        import scala.jdk.CollectionConverters._
        state.set(spark.createDataFrame(
          merged.collect().toSeq.asJava, merged.schema))
        ()
      }
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    assert(batches.get >= 2, s"expected a multi-batch replay, got ${batches.get}")
    // duplicating every value leaves the quantiles of the multiset
    // unchanged, so the exact side can aggregate the single fixture
    val nTypes = batchEvents.select("event_type").distinct().count()
    assert(state.get.count() == nTypes,
      s"KLL state ${state.get.count()} rows != key domain $nTypes (O(keys) bound)")
    val gate = state.get
      .select(col("event_type"),
        expr("kll_sketch_get_quantile_double(sk, 0.49)").as("e49"),
        expr("kll_sketch_get_quantile_double(sk, 0.51)").as("e51"),
        expr("kll_sketch_get_quantile_double(sk, 0.94)").as("e94"),
        expr("kll_sketch_get_quantile_double(sk, 0.96)").as("e96"))
      .join(batchEvents.groupBy("event_type").agg(
        expr("percentile_cont(0.5) within group (order by cast(value as double))")
          .as("x50"),
        expr("percentile_cont(0.95) within group (order by cast(value as double))")
          .as("x95")), "event_type")
    val bad = gate.filter(
      col("x50") < col("e49") || col("x50") > col("e51") ||
      col("x95") < col("e94") || col("x95") > col("e96"))
    // collect once: assert(cond, clue) evaluates the clue eagerly, so an
    // inline bad.collect() would re-run the full rank-gate join even on pass
    val misses = bad.collect()
    assert(misses.isEmpty, s"rank gate missed: ${misses.mkString("; ")}")
  }

  test("ST-32 foreachBatch theta rollup: idempotent fold, set algebra from state") {
    // The streaming face of E-469/E-473: each micro-batch collapses to
    // one theta blob per event_type (thetaBatchState) folded with
    // theta_union_agg (thetaMergeState). Theta union is IDEMPOTENT on
    // identities, so streaming the fixture TWICE must land on the same
    // per-key distinct-user estimates as one batch pass over a single
    // copy — and the intersection question (users doing both clicks
    // and views) is answered from the folded blobs alone. Gates are
    // E-469's 5% bounds; the fixture key domains sit below the theta
    // exact-mode threshold, so estimates are hash-deterministic.
    val tmp = Files.createTempDirectory("events_theta")
    val src = Paths.get(s"$sf0001/events.parquet")
    Files.copy(src, tmp.resolve("a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(src, tmp.resolve("b.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val state = new java.util.concurrent.atomic.AtomicReference[DataFrame](null)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = Streams.readEvents(spark, tmp.toString, maxFilesPerTrigger = Some(1))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batches.incrementAndGet()
        val s = Streams.thetaBatchState(batch, "event_type", "user_id")
        val merged = Option(state.get)
          .fold(s)(prev => Streams.thetaMergeState(prev, s, "event_type"))
        import scala.jdk.CollectionConverters._
        state.set(spark.createDataFrame(
          merged.collect().toSeq.asJava, merged.schema))
        ()
      }
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    assert(batches.get >= 2, s"expected a multi-batch replay, got ${batches.get}")
    // O(groups) state pin: one blob per event_type, nothing else
    val nTypes = batchEvents.select("event_type").distinct().count()
    assert(state.get.count() == nTypes,
      s"theta state ${state.get.count()} rows != key domain $nTypes (O(groups) bound)")
    // per-key estimates vs exact distinct users of a SINGLE fixture copy
    // (idempotence: the doubled replay must not inflate the sets)
    val gate = state.get
      .select(col("event_type"),
        expr("theta_sketch_estimate(sk)").as("est"))
      .join(batchEvents.groupBy("event_type")
        .agg(countDistinct("user_id").as("exact")), "event_type")
    val offKey = gate.filter(
      abs(col("est") - col("exact")) > col("exact") * 0.05).collect()
    assert(offKey.isEmpty, s"per-key estimate off >5%: ${offKey.mkString("; ")}")
    // set algebra read purely from the folded state: |click ∩ view|
    val inter = state.get.groupBy()
      .pivot("event_type", Seq("click", "view"))
      .agg(first("sk"))
      .select(expr("theta_sketch_estimate(theta_intersection(click, view))")
        .cast("double").as("e_and"))
      .head().getDouble(0)
    val exactInter = batchEvents.filter(col("event_type") === "click")
      .select("user_id").distinct()
      .intersect(batchEvents.filter(col("event_type") === "view")
        .select("user_id").distinct())
      .count()
    assert(exactInter > 0, "fixture lost its click∩view overlap")
    assert(math.abs(inter - exactInter) <= exactInter * 0.05,
      s"intersection estimate $inter vs exact $exactInter")
  }

  test("ST-8 stream-stream interval join equals batch interval join") {
    val src = Streams.readEvents(spark, eventsDir)
    val got = replay(Streams.clickViewJoin(src), "append")
    val clicks = batchEvents.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("cu"), col("ts").as("cts"))
    val views = batchEvents.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("vu"), col("ts").as("vts"))
    val expected = clicks.join(views,
        col("cu") === col("vu") &&
        col("vts") >= col("cts") - expr("interval 30 minutes") &&
        col("vts") <= col("cts"))
      .select(col("click_id"), col("view_id"), col("cu").as("user_id"))
    assert(expected.count() > 0)
    assert(canon(got) == canon(expected))
  }

  test("ST-12 left-outer interval join: null emission matches batch on the " +
      "watermark-safe prefix; young unmatched rows stay withheld") {
    val stream = Streams.clickViewLeftOuter(Streams.readEvents(spark, eventsDir))
    val got = replay(stream, "append")
    // a left-outer (null-extended) row may only emit once the watermark
    // guarantees no matching view can still arrive: clicks younger than
    // (max event time − delay) at stream end are legitimately withheld.
    // Compare on the safe prefix, where replay ≡ batch left join.
    val maxTs = batchEvents.agg(max("ts")).collect()(0).getTimestamp(0)
    val safeCut = new java.sql.Timestamp(maxTs.getTime - 10 * 60 * 1000)
    val batchLeft = {
      val clicks = batchEvents.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("cu"),
          col("ts").as("cts"))
      val views = batchEvents.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id").as("vu"),
          col("ts").as("vts"))
      clicks.join(views,
          col("cu") === col("vu") &&
          col("vts") >= col("cts") - expr("interval 30 minutes") &&
          col("vts") <= col("cts"), "left_outer")
        .select(col("click_id"), col("view_id"), col("cu").as("user_id"),
          col("cts"))
    }
    // matched rows agree EXACTLY on the full stream (matches are never
    // withheld once both inputs are consumed)
    assert(canon(got.filter(col("view_id").isNotNull)) ==
      canon(batchLeft.filter(col("view_id").isNotNull)))
    // null-extended rows: every emission must be a true batch non-match
    // (no spurious nulls — the row could NOT have matched), and the
    // stream must have flushed nearly all of them; the exact boundary of
    // the withheld tail depends on the engine's state-eviction lag, so
    // it is bounded, not pinned. (safeCut sanity: everything the batch
    // leaves unmatched well before the final watermark got emitted.)
    val gotNulls = canon(got.filter(col("view_id").isNull))
    val expNulls = canon(batchLeft.filter(col("view_id").isNull))
    assert(gotNulls.nonEmpty, "outer semantics not exercised")
    assert(gotNulls.toSet.subsetOf(expNulls.toSet),
      "stream emitted a null row for a click the batch join matches")
    assert(gotNulls.size >= (expNulls.size * 8) / 10,
      s"too many withheld nulls: ${gotNulls.size} of ${expNulls.size}")
    val heldBack = expNulls.toSet -- gotNulls.toSet
    val safeTs = java.sql.Timestamp.valueOf(safeCut.toLocalDateTime.minusHours(9))
    assert(heldBack.forall(r =>
      r(1).asInstanceOf[java.sql.Timestamp].after(safeTs)),
      s"old unmatched click never flushed: $heldBack")
  }

  /** Stage the events fixture as `n` time-disjoint parquet files with
    * strictly increasing mtimes (FileStreamSource processes files in
    * mtime order), so a maxFilesPerTrigger=1 replay advances the
    * watermark batch by batch and state eviction actually runs.
    * Returns (dir, max ts over the first n−1 quantiles) — the event
    * time that determines the FINAL batch's watermark.
    */
  private def timeSplitEvents(n: Int): (String, java.sql.Timestamp) = {
    val tmp = Files.createTempDirectory("events_split")
    val all = batchEvents.orderBy("ts", "event_id")
    val qs = (1 until n).map(i => i.toDouble / n)
    val cuts = all.select(expr(s"percentile(unix_micros(ts), array(${qs.mkString(",")}))"))
      .collect()(0).getSeq[Double](0).map(_.toLong)
    val bounds = (Seq(Long.MinValue) ++ cuts) :+ Long.MaxValue
    for (i <- 0 until n) {
      val part = all.filter(unix_micros(col("ts")) > bounds(i) &&
        unix_micros(col("ts")) <= bounds(i + 1))
      part.coalesce(1).write.parquet(s"$tmp/w$i")
      Files.move(
        Files.list(Paths.get(s"$tmp/w$i"))
          .filter(_.toString.endsWith(".parquet")).findFirst().get(),
        Paths.get(s"$tmp/f$i.parquet"))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$tmp/w$i"))
      Files.setLastModifiedTime(Paths.get(s"$tmp/f$i.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 2000L))
    }
    val penultMax = batchEvents
      .filter(unix_micros(col("ts")) <= cuts.last)
      .agg(max("ts")).collect()(0).getTimestamp(0)
    (tmp.toString, penultMax)
  }

  test("ST-8/ST-12 stream-stream join state is bounded by the watermark " +
      "window (measured)") {
    // The 100 TB claim for stream-stream joins is that buffered state is
    // O(rate × (delay + window)), NOT O(stream length). Measure it: a
    // 4-batch time-ordered replay advances the watermark so each batch
    // evicts expired rows; the final state must not exceed the rows
    // still inside the eviction horizon. At the last batch the join's
    // watermark is wm = maxTs(first 3 quartiles) − delay; a click
    // evicts once cts < wm, a view once vts < wm − window, so the bound
    // is #clicks(cts ≥ wm) + #views(vts ≥ wm − window) — computed from
    // the batch data, not narrated.
    val delayMs = 10 * 60 * 1000L
    val windowMs = 30 * 60 * 1000L
    for (joinType <- Seq("inner", "left_outer")) {
      val (dir, penultMax) = timeSplitEvents(4)
      val src = Streams.readEvents(spark, dir, maxFilesPerTrigger = Some(1))
      val (_, stateRows) = replayWithState(
        Streams.clickViewJoin(src, joinType = joinType), "append")
      val wm = penultMax.getTime - delayMs
      val clicksLive = batchEvents.filter(col("event_type") === "click")
        .filter(unix_micros(col("ts")) / 1000 >= wm).count()
      val viewsLive = batchEvents.filter(col("event_type") === "view")
        .filter(unix_micros(col("ts")) / 1000 >= wm - windowMs).count()
      val bound = clicksLive + viewsLive
      val totalCv = batchEvents
        .filter(col("event_type").isin("click", "view")).count()
      assert(stateRows > 0, s"$joinType: join state not exercised")
      assert(stateRows <= bound,
        s"$joinType join state $stateRows exceeds watermark-window bound " +
          s"$bound (clicks≥wm $clicksLive + views≥wm−window $viewsLive)")
      assert(bound < totalCv,
        s"bound $bound not meaningful vs $totalCv total click/view rows")
    }
  }

  test("ST-21 left-semi interval join replay equals the batch semi join") {
    val stream = Streams.clickViewSemi(Streams.readEvents(spark, eventsDir))
    val got = replay(stream, "append")
    val expected = {
      val clicks = batchEvents.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("cu"),
          col("ts").as("cts"))
      val views = batchEvents.filter(col("event_type") === "view")
        .select(col("user_id").as("vu"), col("ts").as("vts"))
      clicks.join(views,
          col("cu") === col("vu") &&
          col("vts") >= col("cts") - expr("interval 30 minutes") &&
          col("vts") <= col("cts"), "left_semi")
        .select(col("click_id"), col("cu").as("user_id"), col("cts"))
    }
    // semi matches are never withheld: exact equality on the full stream
    assert(canon(got) == canon(expected))
    assert(got.count() > 0, "semi semantics not exercised")
  }

  test("ST-22 anti join (outer-filter rewrite): true non-matches only, " +
      "old candidates flushed") {
    val stream = Streams.clickViewAnti(Streams.readEvents(spark, eventsDir))
    val got = replay(stream, "append")
    val expected = {
      val clicks = batchEvents.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("cu"),
          col("ts").as("cts"))
      val views = batchEvents.filter(col("event_type") === "view")
        .select(col("user_id").as("vu"), col("ts").as("vts"))
      clicks.join(views,
          col("cu") === col("vu") &&
          col("vts") >= col("cts") - expr("interval 30 minutes") &&
          col("vts") <= col("cts"), "left_anti")
        .select(col("click_id"), col("cu").as("user_id"), col("cts"))
    }
    // same discipline as ST-12's null side: every emission is a true
    // batch non-match, nearly all flush, the withheld tail is young
    val gotRows = canon(got)
    val expRows = canon(expected)
    assert(gotRows.nonEmpty, "anti semantics not exercised")
    assert(gotRows.toSet.subsetOf(expRows.toSet),
      "stream emitted an anti row for a click the batch join matches")
    assert(gotRows.size >= (expRows.size * 8) / 10,
      s"too many withheld anti rows: ${gotRows.size} of ${expRows.size}")
  }

  test("ST-16 full-outer interval join: both null-extended sides match batch " +
      "on the watermark-safe prefix; young unmatched rows stay withheld") {
    val stream = Streams.clickViewFullOuter(Streams.readEvents(spark, eventsDir))
    val got = replay(stream, "append")
    val batchFull = {
      val clicks = batchEvents.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("cu"),
          col("ts").as("cts"))
      val views = batchEvents.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id").as("vu"),
          col("ts").as("vts"))
      clicks.join(views,
          col("cu") === col("vu") &&
          col("vts") >= col("cts") - expr("interval 30 minutes") &&
          col("vts") <= col("cts"), "full_outer")
        .select(col("click_id"), col("view_id"),
          coalesce(col("cu"), col("vu")).as("user_id"), col("cts"), col("vts"))
    }
    // matched rows agree EXACTLY on the full stream (matches are never
    // withheld once both inputs are consumed)
    assert(canon(got.filter(col("click_id").isNotNull && col("view_id").isNotNull)) ==
      canon(batchFull.filter(col("click_id").isNotNull && col("view_id").isNotNull)))
    // each outer side independently: no spurious nulls (every emission
    // is a true batch non-match) and a ≥80% flush — the withheld tail is
    // inherent (rows younger than final watermark − window stay
    // buffered), so it is bounded, not pinned, same discipline as ST-12.
    def side(unmatchedOf: String): (Set[Seq[Any]], Set[Seq[Any]]) = {
      val pred = col(unmatchedOf).isNull
      (canon(got.filter(pred)).toSet, canon(batchFull.filter(pred)).toSet)
    }
    for (nullSide <- Seq("view_id", "click_id")) {
      val (gotNulls, expNulls) = side(nullSide)
      assert(gotNulls.nonEmpty, s"$nullSide outer semantics not exercised")
      assert(gotNulls.subsetOf(expNulls),
        s"stream emitted a null-$nullSide row the batch full join matches")
      assert(gotNulls.size >= (expNulls.size * 8) / 10,
        s"too many withheld null-$nullSide rows: ${gotNulls.size} of ${expNulls.size}")
    }
  }

  test("ST-7 flatMapGroupsWithState sessionization equals Q25") {
    val stream = Streams.statefulSessionCounts(Streams.readEvents(spark, eventsDir))
    val got = replay(stream.toDF(), "update")
      .orderBy("user_id").limit(50)
    val expected = graft.queries.ContractQueries.q25(spark, sf0001)
    assert(canon(got) == canon(expected))
  }

  test("ST-18 stateful rapid-fire detector equals the batch lag formulation") {
    import org.apache.spark.sql.expressions.Window
    val stream = Streams.rapidFireCounts(Streams.readEvents(spark, eventsDir))
    val (got, st18State) = replayWithState(stream.toDF(), "update")
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy("us", "event_id")
    val expected = batchEvents
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("gap", col("us") - lag("us", 1).over(w))
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("gap") <= 1000000L, 1L).otherwise(0L)).as("n_rapid"))
    assert(canon(got) == canon(expected))
    // state is one row per live (user, event_type) key — exactly the
    // batch group count, NOT the event count
    assert(st18State == expected.count(),
      s"rapid-fire state $st18State != key-domain size ${expected.count()}")
  }

  test("ST-7b transformWithState sessionization equals Q25") {
    // transformWithState needs a multi-column-family state store
    // (RocksDB); the default HDFS-backed provider refuses it
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = Streams.twsSessionCounts(Streams.readEvents(spark, eventsDir))
      val got = replay(stream.toDF(), "update")
        .orderBy("user_id").limit(50)
      val expected = graft.queries.ContractQueries.q25(spark, sf0001)
      assert(canon(got) == canon(expected))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("ST-24 streaming near-dup filter replay equals the batch fold " +
      "and drops planted dups") {
    // id-ordered arrival (the ST-18/20/23 ordering contract): split
    // the documents table at the median doc_id, pin file mtimes so
    // the stream replays a -> b, and require (1) stream ≡ batch
    // sequential fold, (2) the fixture's planted near-dups are
    // actually dropped, (3) state = one row per occupied simhash
    // segment.
    val docs = Tables.table(spark, sf0001, "documents")
      .select("doc_id", "text")
    val tmp = Files.createTempDirectory("docs_neardup")
    val cut = docs.select(expr("percentile(doc_id, 0.5)"))
      .collect()(0).getDouble(0).toLong
    docs.filter(col("doc_id") <= cut).orderBy("doc_id")
      .coalesce(1).write.parquet(s"$tmp/a")
    docs.filter(col("doc_id") > cut).orderBy("doc_id")
      .coalesce(1).write.parquet(s"$tmp/b")
    for ((part, ms) <- Seq("a" -> 1000000000000L, "b" -> 1000000002000L)) {
      Files.move(
        Files.list(Paths.get(s"$tmp/$part"))
          .filter(_.toString.endsWith(".parquet")).findFirst().get(),
        Paths.get(s"$tmp/$part.parquet"))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$tmp/$part"))
      Files.setLastModifiedTime(Paths.get(s"$tmp/$part.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(ms))
    }
    val schema = docs.schema
    val streamIn = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(tmp.toString)
    val (got, stState) = replayWithState(
      Streams.nearDupFilter(streamIn).toDF(), "update")
    val batchIn = spark.read.parquet(s"$tmp/a.parquet", s"$tmp/b.parquet")
    val expected = Streams.nearDupFilterBatch(batchIn).toDF()
    assert(canon(got) == canon(expected))
    val nDropped = expected.filter(!col("kept")).count()
    assert(nDropped > 0L,
      "fixture's planted near-dups were not dropped — blocking broke")
    val nSegs = Streams.nearDupFilterBatch(batchIn)
      .toDF().select("simhash")
      .select(shiftrightunsigned(col("simhash"), 48)).distinct().count()
    assert(stState == nSegs, s"state $stState != occupied segments $nSegs")
  }

  test("ST-24b multi-band OR near-dup filter: replay equals the batch fold, " +
      "recall >= single-band, state = occupied (band, segment) buckets") {
    // the production shape (round-12 judge directive #6): four parallel
    // segment-band folds OR'd per doc, two chained stateful operators
    // in one query. Same two-file id-ordered replay as ST-24.
    val docs = Tables.table(spark, sf0001, "documents")
      .select("doc_id", "text")
    val tmp = Files.createTempDirectory("docs_neardup_mb")
    val cut = docs.select(expr("percentile(doc_id, 0.5)"))
      .collect()(0).getDouble(0).toLong
    docs.filter(col("doc_id") <= cut).orderBy("doc_id")
      .coalesce(1).write.parquet(s"$tmp/a")
    docs.filter(col("doc_id") > cut).orderBy("doc_id")
      .coalesce(1).write.parquet(s"$tmp/b")
    for ((part, ms) <- Seq("a" -> 1000000000000L, "b" -> 1000000002000L)) {
      Files.move(
        Files.list(Paths.get(s"$tmp/$part"))
          .filter(_.toString.endsWith(".parquet")).findFirst().get(),
        Paths.get(s"$tmp/$part.parquet"))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$tmp/$part"))
      Files.setLastModifiedTime(Paths.get(s"$tmp/$part.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(ms))
    }
    val schema = docs.schema
    val streamIn = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(tmp.toString)
    val (got, stState) = replayWithState(
      Streams.nearDupFilterMultiBand(streamIn), "update")
    val batchIn = spark.read.parquet(s"$tmp/a.parquet", s"$tmp/b.parquet")
    val expected = Streams.nearDupFilterMultiBandBatch(batchIn)
    assert(canon(got) == canon(expected))
    // OR of four bands can only drop MORE than the single top-segment
    // band: every single-band drop re-occurs in band 3's identical fold
    val singleDropped = Streams.nearDupFilterBatch(batchIn)
      .toDF().filter(!col("kept")).count()
    val multiDropped = expected.filter(!col("kept")).count()
    assert(multiDropped >= singleDropped,
      s"multi-band dropped $multiDropped < single-band $singleDropped")
    assert(multiDropped > 0L, "planted near-dups were not dropped")
    // state pin extended to the union: one fold row per occupied
    // (band, segment) bucket, plus the per-doc OR aggregation's rows
    val sh = batchIn.select(
      org.apache.spark.sql.functions.call_function("simhash64",
        org.apache.spark.sql.functions.filter(
          split(col("text"), " "), t => t =!= "")).as("sh"))
    val nBuckets = (0 to 3).map { b =>
      sh.select(shiftrightunsigned(col("sh"), b * 16)
        .bitwiseAND(lit(0xFFFFL))).distinct().count()
    }.sum
    val nDocs = batchIn.count()
    assert(stState == nBuckets + nDocs,
      s"state $stState != occupied buckets $nBuckets + agg rows $nDocs")
  }
}
