package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, ListState, MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import org.apache.spark.sql.types._

/** Structured Streaming operators over the `events` table (SURVEY §2.10,
  * ST-1..ST-7). Batch and stream share the same event-time logic, so
  * every stream here converges to a batch oracle on full replay
  * ("replay-equivalence", SURVEY §5.4) — that equivalence is the test
  * contract, enforced in StreamingSpec.
  *
  * Scale notes: all aggregations are keyed on (window/session, type or
  * user) so state partitions across executors; watermarks bound state
  * size; the file source scales by splitting input into many files
  * (maxFilesPerTrigger throttles micro-batch size). Stream-static joins
  * broadcast the dim side per micro-batch when small.
  */
object Streams {

  /** events.parquet logical schema with `ts` parameterized: streaming
    * sources need the schema declared up front, but the fixtures'
    * physical `ts` encoding is generation-dependent (FIXTURES.md quirk
    * 1: ns-long in rounds 1–4, µs timestamp since round 5), so we peek
    * at the batch footer first and declare whatever is actually there.
    */
  def eventsRawSchema(tsType: DataType = LongType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming source over an events parquet directory (replay).
    * Schema-adaptive exactly like the batch reader (`Tables.scala`): a
    * one-footer batch read resolves the physical `ts` type, then the
    * stream declares that type and normalizes to TimestampType — both
    * paths agree by construction, which is what keeps the
    * replay-equivalence contract (SURVEY §5.4) meaningful.
    */
  def readEvents(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val physical = spark.read.parquet(dir).schema("ts").dataType
    val r = spark.readStream.schema(eventsRawSchema(physical))
    val r2 = maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n))
    val raw = r2.parquet(dir)
    physical match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.ts has unsupported physical type $other")
    }
  }

  // ---- ST-1 tumbling window aggregation ----------------------------------
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(round(sum("value"), 2).as("sv"), count(lit(1)).as("cnt"))
      .select(col("w.start").as("h"), col("event_type"), col("sv"), col("cnt"))

  // ---- ST-2 sliding window aggregation -----------------------------------
  def slidingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("ws"), col("event_type"), col("cnt"))

  // ---- ST-3 session windows (30-minute gap) ------------------------------
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("s"), col("sw.end").as("e"),
        col("n_events"))

  /** Per-user session totals from [[sessionCounts]] output (batch agg on
    * the materialized stream result) — directly comparable to Q25.
    */
  def sessionTotals(sessionised: DataFrame): DataFrame =
    sessionised.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))

  // ---- ST-5 streaming dedup ----------------------------------------------
  def dedupByEventId(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicates("event_id", "ts")

  // ---- ST-9 bounded-state dedup ------------------------------------------
  /** Dedup by event_id with state BOUNDED by the watermark: a key's
    * state is evicted once the watermark passes its event time, so
    * duplicates are only guaranteed collapsed while they arrive within
    * the delay — the trade every unbounded stream needs at scale
    * (dropDuplicates state grows forever with key cardinality; this
    * stays O(keys-per-watermark-window)). Eviction + re-emission
    * semantics are replay-pinned in StreamingSpec ST-9.
    */
  def dedupWithinWatermark(events: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  // ---- ST-10 streaming sketch aggregation ----------------------------------
  /** Heavy hitters over the stream via the approx_top_k sketch (global
    * aggregate, complete mode): the sketch state is O(maxItemsTracked)
    * regardless of stream length — the streaming face of q68's batch
    * contract. With maxItemsTracked ≥ the true distinct count the sketch
    * is exact, so the replay must equal q68's oracle-anchored result.
    */
  def topEventTypes(events: DataFrame, k: Int = 3,
      maxTracked: Int = 100): DataFrame =
    events.groupBy()
      .agg(expr(s"approx_top_k(event_type, $k, $maxTracked)").as("t"))

  // ---- ST-31 incremental mergeable-quantile (KLL) rollup --------------------
  /** Per-key KLL(k) quantile state of one micro-batch — the E-468
    * slice→sketch discipline with the micro-batch as the slice: each
    * batch is reduced to one O(k·log n) sketch blob per key BEFORE it
    * touches the running state, so the fold's input is sketch-sized, not
    * data-sized. Completes the streaming sketch family (HLL distinct,
    * approx_top_k frequency ST-10, and now rank/quantile): an exact
    * streaming percentile would need the full value multiset resident —
    * unbounded state at 100 TB — while KLL state is O(keys · k) forever.
    */
  def kllBatchState(batch: DataFrame, key: String, value: String,
      k: Int = 800): DataFrame =
    // resolve `value` via col() (handles dotted/spaced names needing
    // backticks, like the key) and hand the SQL string a fixed alias —
    // only the Int k is ever spliced into the expr text
    batch.withColumn("__graft_kll_v", col(value).cast("double"))
      .groupBy(col(key))
      .agg(expr(s"kll_sketch_agg_double(__graft_kll_v, $k)").as("sk"))

  /** Fold one batch's sketch state into the running state:
    * `kll_merge_agg_double` over the union — associative and
    * commutative (sketch merge), so the micro-batch replay must agree
    * with a one-pass batch sketch within the k=800 RANK-error bound
    * (~0.35% at 99% conf; gated at ±1% rank in StreamingSpec ST-31,
    * the value-density-independent gate E-468 settled on).
    */
  def kllMergeState(prev: DataFrame, cur: DataFrame, key: String,
      k: Int = 800): DataFrame =
    prev.unionByName(cur)
      .groupBy(col(key))
      .agg(expr(s"kll_merge_agg_double(sk, $k)").as("sk"))

  // ---- ST-32 incremental theta-sketch set-algebra rollup ---------------------
  /** Per-key theta sketch of one micro-batch's `value` identities — the
    * ST-31 blob-fold discipline applied to E-469/E-473's SET algebra:
    * each batch collapses to one theta blob per key before touching the
    * running state, so the fold input is sketch-sized and the state is
    * O(keys · sketch) forever. Unlike KLL, theta union is IDEMPOTENT on
    * re-observed identities (a set, not a multiset), so replaying the
    * same rows twice leaves the folded state identical — and every
    * intersection/difference/overlap question is answered from the
    * folded blobs without re-scanning the stream (the 100 TB audience-
    * overlap pattern, now with streaming ingest).
    */
  def thetaBatchState(batch: DataFrame, key: String, value: String): DataFrame =
    batch.withColumn("__graft_theta_v", col(value))
      .groupBy(col(key))
      .agg(expr("theta_sketch_agg(__graft_theta_v)").as("sk"))

  /** Fold one batch's theta state into the running state:
    * `theta_union_agg` over the union — associative, commutative, and
    * idempotent on identities, so the micro-batch replay must agree
    * with a one-pass batch sketch exactly (hash-deterministic blobs;
    * gated within E-469's 5% estimate bounds in StreamingSpec ST-32,
    * exact below the sketch's exact-mode threshold).
    */
  def thetaMergeState(prev: DataFrame, cur: DataFrame, key: String): DataFrame =
    prev.unionByName(cur)
      .groupBy(col(key))
      .agg(expr("theta_union_agg(sk)").as("sk"))

  // ---- ST-6 stream-static join -------------------------------------------
  def enrichWithCustomers(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(broadcast(customers),
      events("user_id") === customers("c_custkey"), "inner")

  // ---- ST-15 point-in-time stream enrichment ---------------------------------
  /** Enrich a stream against an SCD Type-2 dimension (q100's shape):
    * each event joins the dimension VERSION that was valid at the
    * event's own time — `valid_from <= ts < valid_to` (open-ended
    * current version) — never the latest version, which would leak
    * future attribute values into past events. Stream-static inner
    * join: the dimension broadcasts, no streaming state at all.
    */
  def enrichPointInTime(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim),
      events("user_id") === dim("dim_user") &&
        events("ts") >= dim("valid_from") &&
        (dim("valid_to").isNull || events("ts") < dim("valid_to")),
      "inner")

  // ---- ST-14 streaming drift monitor ----------------------------------------
  /** Binned value counts over a stream (complete mode): the live side
    * of the PSI drift monitor (`ops.Drift`) — the sink always holds the
    * current-distribution histogram of everything ingested so far, and
    * PSI against a static reference histogram is a bins-sized
    * computation on top (StreamingSpec derives it from the sink and
    * requires equality with the batch `Drift.psiBins` on identical
    * data). State is O(nBins) regardless of stream length.
    */
  def valueBins(events: DataFrame, binWidth: Double, nBins: Int): DataFrame =
    events
      .select(least(floor(col("value") / binWidth), lit(nBins - 1))
        .cast("int").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("c_cur"))

  // ---- ST-13 streaming corpus scoring --------------------------------------
  /** The CorpusPipeline's per-document text stages as a streaming
    * transform: scrub, language ID and quality scoring are stateless
    * codegen'd projections, so they run identically over a stream
    * (append mode, no watermark, no state) — score-as-you-ingest, with
    * the filter decision available the moment a document lands.
    * StreamingSpec replays this against the identical batch projection.
    */
  def scoreDocs(docs: DataFrame): DataFrame =
    graft.text.TextAnalysis.qualityFeatures(
      docs.withColumn("text", graft.text.TextAnalysis.scrub(col("text")))
        .withColumn("lang_id", graft.text.TextAnalysis.langId(col("text"))),
      "text")

  // ---- ST-8 stream-stream interval join ----------------------------------
  /** clicks ⋈ views: same user, view at or before the click and within
    * `windowBack` of it. Both sides carry watermarks and the join has an
    * event-time range conjunct — together these let Spark expire buffered
    * join state (without them stream-stream join state grows without
    * bound; with them state per side is O(rate × (watermark + window))).
    */
  def clickViewJoin(events: DataFrame, watermark: String = "10 minutes",
      windowBack: String = "30 minutes", joinType: String = "inner"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("cu"),
        col("ts").as("cts"))
      .withWatermark("cts", watermark)
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("vu"),
        col("ts").as("vts"))
      .withWatermark("vts", watermark)
    val joined = clicks.join(views,
        col("cu") === col("vu") &&
        col("vts") >= col("cts") - expr(s"interval $windowBack") &&
        col("vts") <= col("cts"),
        joinType)
    // outer variants keep the event times so callers can reason about
    // the watermark-withheld tail; the inner contract is unchanged.
    // full_outer additionally null-extends the CLICK side, so user_id
    // must coalesce across both key columns.
    joinType match {
      case "inner" =>
        joined.select(col("click_id"), col("view_id"), col("cu").as("user_id"))
      case "left_semi" => // only the probe side's columns exist
        joined.select(col("click_id"), col("cu").as("user_id"), col("cts"))
      case "full_outer" =>
        joined.select(col("click_id"), col("view_id"),
          coalesce(col("cu"), col("vu")).as("user_id"), col("cts"), col("vts"))
      case _ =>
        joined.select(col("click_id"), col("view_id"), col("cu").as("user_id"),
          col("cts"))
    }
  }

  // ---- ST-21 stream-stream LEFT SEMI interval join ------------------------
  /** Clicks that HAVE a qualifying prior view — the existence filter
    * without the view columns. Semi matches emit as soon as the first
    * matching view arrives (no null-extension, so no watermark-withheld
    * tail on the matched set): replay equals the batch left-semi join
    * exactly once both inputs drain. State stays bounded by the same
    * watermark + interval conjunct as ST-8.
    */
  def clickViewSemi(events: DataFrame, watermark: String = "10 minutes",
      windowBack: String = "30 minutes"): DataFrame =
    clickViewJoin(events, watermark, windowBack, "left_semi")

  // ---- ST-22 stream-stream anti join (outer-filter rewrite) ---------------
  /** Clicks with NO qualifying prior view — the abandonment detector.
    * Structured Streaming does not support left_anti stream-stream
    * joins directly; the standard rewrite is the watermarked LEFT OUTER
    * join filtered to the null-extended rows, inheriting its emission
    * discipline: an anti row emits only once the watermark proves no
    * matching view can still arrive, so the youngest candidates stay
    * withheld at stream end (bounded by ST-12's tail, asserted in the
    * replay).
    */
  def clickViewAnti(events: DataFrame, watermark: String = "10 minutes",
      windowBack: String = "30 minutes"): DataFrame =
    clickViewJoin(events, watermark, windowBack, "left_outer")
      .filter(col("view_id").isNull)
      .select(col("click_id"), col("user_id"), col("cts"))

  // ---- ST-12 stream-stream LEFT OUTER interval join ----------------------
  /** Same join, left outer: a click with no qualifying view emits a
    * null-extended row — but only once the watermark has passed far
    * enough that a matching view can no longer arrive (cts + delay).
    * That withheld tail is inherent to streaming outer joins: rows
    * younger than (final watermark − window) stay buffered at stream
    * end, which is exactly what the ST-12 replay asserts against the
    * batch left join.
    */
  def clickViewLeftOuter(events: DataFrame, watermark: String = "10 minutes",
      windowBack: String = "30 minutes"): DataFrame =
    clickViewJoin(events, watermark, windowBack, "left_outer")

  // ---- ST-16 stream-stream FULL OUTER interval join ----------------------
  /** Same join, full outer: completes the ST join family (inner ST-8,
    * left ST-12). A click with no qualifying view AND a view no click
    * ever referenced each emit one null-extended row — each only once
    * its own side's watermark proves no counterpart can still arrive.
    * Both sides therefore carry a withheld tail at stream end (rows
    * younger than final watermark − window stay buffered), which the
    * ST-16 replay bounds against the batch full-outer join.
    */
  def clickViewFullOuter(events: DataFrame, watermark: String = "10 minutes",
      windowBack: String = "30 minutes"): DataFrame =
    clickViewJoin(events, watermark, windowBack, "full_outer")

  // ---- ST-7 arbitrary stateful processing --------------------------------
  case class UserSessState(lastTs: Long, nSessions: Long, nEvents: Long)
  case class UserSessOut(user_id: Long, n_sessions: Long, n_events: Long)

  /** Custom per-user sessionization with explicit state
    * (flatMapGroupsWithState): replicates Q25's strict >30-min-gap rule.
    * Events within one micro-batch are sorted per user; across batches
    * the state carries the last seen timestamp. (With unordered
    * cross-batch arrival the rule degrades like any online sessionizer —
    * the replay spec feeds batches in time order, which is also the
    * production layout for backfills.)
    */
  /** ST-7b: the same sessionization on the Spark 4 `transformWithState`
    * API (StatefulProcessor + typed ValueState) — the successor to
    * (flat)MapGroupsWithState; replay-equivalent to Q25 like the
    * flatMapGroupsWithState variant above.
    */
  class SessionProcessor
      extends StatefulProcessor[Long, (Long, Long, Long), UserSessOut] {
    @transient private var state: ValueState[UserSessState] = _
    private val gapMs = 30L * 60 * 1000

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserSessState](
        "session", Encoders.product[UserSessState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Long)],
        timerValues: TimerValues): Iterator[UserSessOut] = {
      val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
      var st = if (state.exists()) state.get() else UserSessState(Long.MinValue, 0L, 0L)
      sorted.foreach { case (_, tms, _) =>
        val newSession = st.lastTs == Long.MinValue || tms - st.lastTs > gapMs
        st = UserSessState(tms,
          st.nSessions + (if (newSession) 1 else 0), st.nEvents + 1)
      }
      state.update(st)
      Iterator.single(UserSessOut(key, st.nSessions, st.nEvents))
    }
  }

  /** Sessionization via transformWithState (ST-7b). */
  def twsSessionCounts(events: DataFrame): Dataset[UserSessOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), unix_millis(col("ts")).as("tms"), col("event_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new SessionProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  // ---- ST-18 stateful rapid-fire detector --------------------------------
  case class RapidState(lastUs: Long, nEvents: Long, nRapid: Long)
  case class RapidOut(user_id: Long, event_type: String,
      n_events: Long, n_rapid: Long)

  /** Live bot screen: running count of events arriving ≤ 1 s after the
    * previous same-(user, type) event — the streaming form of batch
    * E-185 (`ExtensionQueries18.extRapidfire`), replay-equal to its
    * lag-window formulation. State is one (lastUs, 2 counters) triple
    * per key, partitioned by the (user, type) grouping key; within a
    * micro-batch rows sort per key, across batches the last timestamp
    * carries (same ordering contract as the sessionizers above).
    */
  def rapidFireCounts(events: DataFrame): Dataset[RapidOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .as[(Long, String, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[RapidState, RapidOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case ((uid, typ), rows, state: GroupState[RapidState]) =>
          val sorted = rows.toSeq.sortBy(r => (r._3, r._4))
          var st = state.getOption.getOrElse(RapidState(Long.MinValue, 0L, 0L))
          sorted.foreach { case (_, _, us, _) =>
            val rapid = st.lastUs != Long.MinValue && us - st.lastUs <= 1000000L
            st = RapidState(us, st.nEvents + 1,
              st.nRapid + (if (rapid) 1L else 0L))
          }
          state.update(st)
          Iterator.single(RapidOut(uid, typ, st.nEvents, st.nRapid))
      }
  }

  def statefulSessionCounts(events: DataFrame): Dataset[UserSessOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = 30L * 60 * 1000
    events
      .select(col("user_id"), unix_millis(col("ts")).as("tms"), col("event_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserSessState, UserSessOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (userId, rows, state: GroupState[UserSessState]) =>
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var st = state.getOption.getOrElse(UserSessState(Long.MinValue, 0L, 0L))
          sorted.foreach { case (_, tms, _) =>
            val newSession = st.lastTs == Long.MinValue || tms - st.lastTs > gapMs
            st = UserSessState(tms,
              st.nSessions + (if (newSession) 1 else 0), st.nEvents + 1)
          }
          state.update(st)
          Iterator.single(UserSessOut(userId, st.nSessions, st.nEvents))
      }
  }

  case class BucketState(lastUs: Long, milliTokens: Long,
      nEvents: Long, nThrottled: Long)
  case class ThrottleOut(user_id: Long, n_events: Long, n_throttled: Long)

  /** ST-20: token-bucket rate limiter as keyed streaming state — the
    * live abuse/quota guard. Each user's bucket holds up to `capacity`
    * tokens, refilling one token per `refillUsPerToken` µs (default 12 h); an event
    * consumes one token or is flagged throttled. All bucket arithmetic
    * is INTEGER milli-tokens (refill = Δus·1000/refillUsPerToken,
    * integer division; late/equal timestamps refill 0, never negative)
    * so stream and batch produce bit-identical decisions for
    * identically-ordered input: state (lastUs, milliTokens, counters)
    * carries across micro-batches and rows sort (ts, event_id) within
    * each batch — the ST-18 ordering contract. Emits per-user running
    * (n_events, n_throttled) counters.
    */
  def tokenBucketCounts(events: DataFrame,
      refillUsPerToken: Long = 43200000000L, // one token per 12 h
      capacity: Long = 2L): Dataset[ThrottleOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("event_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[BucketState, ThrottleOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[BucketState]) =>
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var st = state.getOption.getOrElse(
            BucketState(Long.MinValue, capacity * 1000, 0L, 0L))
          sorted.foreach { case (_, us, _) =>
            val refill =
              if (st.lastUs == Long.MinValue) 0L
              else math.max(0L, (us - st.lastUs) * 1000L / refillUsPerToken)
            val filled = math.min(capacity * 1000L, st.milliTokens + refill)
            val (after, throttled) =
              if (filled >= 1000L) (filled - 1000L, 0L) else (filled, 1L)
            st = BucketState(us, after, st.nEvents + 1L,
              st.nThrottled + throttled)
          }
          state.update(st)
          Iterator.single(ThrottleOut(uid, st.nEvents, st.nThrottled))
      }
  }

  /** The batch formulation of the same fold (per-user sorted pass) —
    * ST-20's replay anchor.
    */
  def tokenBucketBatch(events: DataFrame,
      refillUsPerToken: Long = 43200000000L,
      capacity: Long = 2L): Dataset[ThrottleOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("event_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (uid, rows) =>
        val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
        var lastUs = Long.MinValue
        var milli = capacity * 1000L
        var nThrottled = 0L
        sorted.foreach { case (_, us, _) =>
          val refill =
            if (lastUs == Long.MinValue) 0L
            else math.max(0L, (us - lastUs) * 1000L / refillUsPerToken)
          val filled = math.min(capacity * 1000L, milli + refill)
          if (filled >= 1000L) milli = filled - 1000L
          else { milli = filled; nThrottled += 1L }
          lastUs = us
        }
        ThrottleOut(uid, sorted.size.toLong, nThrottled)
      }
  }

  case class EwmaState(ewmaCents: Long, nEvents: Long)
  case class EwmaOut(event_type: String, n_events: Long, ewma_cents: Long)

  /** ST-23: keyed streaming EWMA — the live smoothing level per
    * event type (the stream side of the E-355 batch smoother). The
    * recursion e ← (x + e) DIV 2 (α = ½) runs entirely in INTEGER
    * cents with floor division, so stream and batch are bit-identical
    * for identically-ordered input; rows sort (ts, event_id) within
    * each micro-batch and the (ewma, count) state carries across
    * batches (the ST-18/ST-20 ordering contract). State is one row
    * per event type — O(key domain), never O(stream).
    */
  def ewmaByType(events: DataFrame): Dataset[EwmaOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("event_id"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (tpe, rows, state: GroupState[EwmaState]) =>
          val sorted = rows.toSeq.sortBy(r => (r._3, r._4))
          var st = state.getOption.getOrElse(EwmaState(Long.MinValue, 0L))
          sorted.foreach { case (_, cents, _, _) =>
            val e =
              if (st.nEvents == 0L) cents
              else Math.floorDiv(cents + st.ewmaCents, 2L)
            st = EwmaState(e, st.nEvents + 1L)
          }
          state.update(st)
          Iterator.single(EwmaOut(tpe, st.nEvents, st.ewmaCents))
      }
  }

  /** The batch formulation of the same fold — ST-23's replay anchor. */
  def ewmaByTypeBatch(events: DataFrame): Dataset[EwmaOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("event_id"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (tpe, rows) =>
        val sorted = rows.toSeq.sortBy(r => (r._3, r._4))
        var e = Long.MinValue
        var n = 0L
        sorted.foreach { case (_, cents, _, _) =>
          e = if (n == 0L) cents else Math.floorDiv(cents + e, 2L)
          n += 1L
        }
        EwmaOut(tpe, n, e)
      }
  }

  case class TimedSessState(startMs: Long, lastMs: Long, n: Long)
  case class ClosedSession(user_id: Long, start_ms: Long, end_ms: Long,
    n_events: Long)

  /** ST-26: timer-finalized sessionization — the EVENT-TIME TIMER
    * surface of `transformWithState` (ST-7b used state only). A
    * session closes two ways: a successor event beyond the 30-min gap
    * (closed inline, emitted immediately) or NO successor — then the
    * event-time timer registered at lastTs + gap fires once the
    * watermark passes it and `handleExpiredTimer` emits the session
    * and CLEARS the state. That second path is the one state-only
    * sessionizers can't do: without timers, a user who stops clicking
    * holds state forever and the session never reaches the sink.
    * Timers are re-armed per batch (delete the stale one first —
    * leaked timers re-fire on cleared state). State is one triple per
    * OPEN session; closed sessions leave both state and timer behind.
    */
  class TimerSessionProcessor
      extends StatefulProcessor[Long, (Long, Long, Long), ClosedSession] {
    @transient private var state: ValueState[TimedSessState] = _
    private val gapMs = 30L * 60 * 1000

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TimedSessState](
        "tsess", Encoders.product[TimedSessState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Long)],
        timerValues: TimerValues): Iterator[ClosedSession] = {
      val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
      var closed = Vector.empty[ClosedSession]
      var st = if (state.exists()) state.get() else null
      val prevTimer = if (st != null) st.lastMs + gapMs else -1L
      sorted.foreach { case (_, tms, _) =>
        if (st == null) st = TimedSessState(tms, tms, 1L)
        else if (tms - st.lastMs > gapMs) {
          closed :+= ClosedSession(key, st.startMs, st.lastMs, st.n)
          st = TimedSessState(tms, tms, 1L)
        } else st = TimedSessState(st.startMs, math.max(st.lastMs, tms),
          st.n + 1L)
      }
      state.update(st)
      if (prevTimer >= 0) getHandle.deleteTimer(prevTimer)
      getHandle.registerTimer(st.lastMs + gapMs)
      closed.iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] = {
      if (state.exists()) {
        val st = state.get()
        if (expiredTimerInfo.getExpiryTimeInMs >= st.lastMs + gapMs) {
          state.clear()
          Iterator.single(ClosedSession(key, st.startMs, st.lastMs, st.n))
        } else Iterator.empty
      } else Iterator.empty
    }
  }

  /** Timer-finalized sessions (ST-26): append-mode closed-session
    * stream under a 10-min watermark.
    */
  def timerSessions(events: DataFrame): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", "10 minutes")
      .select(col("user_id"), unix_millis(col("ts")).as("tms"),
        col("event_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new TimerSessionProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Batch gap-sessionization (gaps-and-islands) — ST-26's replay
    * anchor: every (user, start, end, n) session in the data.
    */
  def gapSessionsBatch(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("tms", "event_id")
    events
      .select(col("user_id"), unix_millis(col("ts")).as("tms"),
        col("event_id"))
      .withColumn("new_sess",
        when(col("tms") - lag("tms", 1).over(w) > 30L * 60 * 1000 ||
          lag("tms", 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("sess", sum("new_sess").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess")
      .agg(min("tms").as("start_ms"), max("tms").as("end_ms"),
        count(lit(1)).as("n_events"))
      .drop("sess")
  }

  case class ProfileOut(user_id: Long, n_events: Long, top_type: String,
    top_n: Long, recent: String)

  /** ST-28: live user profile via the composite-state surfaces of
    * transformWithState — MapState (event-type → count, updated in
    * place, never materialized as a whole map per event) and
    * ListState (the last-3 event ids, trimmed with put()). ST-7b used
    * ValueState, ST-26 timers; this completes the typed-state family.
    * Emits the modal event type (count desc, type asc ties) and the
    * recent-ids window per user — the live personalization record.
    * State = one map entry per (user, type) + ≤3 list entries per
    * user: O(key domain × type domain), never O(stream).
    */
  class ProfileProcessor
      extends StatefulProcessor[Long, (Long, String, Long, Long), ProfileOut] {
    @transient private var counts: MapState[String, Long] = _
    @transient private var recent: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      recent = getHandle.getListState[Long]("recent",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, String, Long, Long)],
        timerValues: TimerValues): Iterator[ProfileOut] = {
      val sorted = rows.toSeq.sortBy(r => (r._3, r._4))
      sorted.foreach { case (_, tpe, _, eid) =>
        val c = if (counts.containsKey(tpe)) counts.getValue(tpe) else 0L
        counts.updateValue(tpe, c + 1L)
        recent.appendValue(eid)
      }
      val keep = recent.get().toSeq.takeRight(3)
      recent.put(keep.toArray)
      val all = counts.iterator().toSeq
      val (topType, topN) = all.minBy { case (t, n) => (-n, t) }
      Iterator.single(ProfileOut(key, all.map(_._2).sum, topType, topN,
        keep.mkString(",")))
    }
  }

  /** Live user profiles (ST-28). */
  def userProfiles(events: DataFrame): Dataset[ProfileOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("event_id"))
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new ProfileProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  case class AnomalyState(n: Long, sumCents: Long, sumSqCents: Long,
    nFlagged: Long)
  case class AnomalyOut(event_type: String, n_events: Long, n_flagged: Long)

  /** ST-25: keyed streaming anomaly flagger — the live 3σ screen per
    * event type. Each event is tested against the running moments of
    * everything BEFORE it (prequential, so the outlier never pollutes
    * the statistics that judge it): flag when n ≥ 5 and
    * (x·n − S)² > 9·(n·Q − S²), the cross-multiplied form of
    * |x − mean| > 3σ_pop — state is three exact integer-cent sums
    * (n, S = Σx, Q = Σx²), O(key domain) rows, and the comparison
    * runs in BigInt so no magnitude ever overflows (Q itself holds to
    * ~3.7e9 rows/key at $500 values; beyond that, window-reset the
    * state). Rows sort (ts, event_id) within each micro-batch and the
    * state carries across batches — the ST-18/ST-20/ST-23 ordering
    * contract, so stream and batch folds are bit-identical for
    * identically-ordered input.
    */
  def anomalyByType(events: DataFrame): Dataset[AnomalyOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("event_id"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AnomalyState, AnomalyOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (tpe, rows, state: GroupState[AnomalyState]) =>
          val sorted = rows.toSeq.sortBy(r => (r._3, r._4))
          var st = state.getOption.getOrElse(AnomalyState(0L, 0L, 0L, 0L))
          sorted.foreach { case (_, cents, _, _) =>
            st = anomalyStep(st, cents)
          }
          state.update(st)
          Iterator.single(AnomalyOut(tpe, st.n, st.nFlagged))
      }
  }

  /** The batch formulation of the same prequential fold — ST-25's
    * replay anchor.
    */
  def anomalyByTypeBatch(events: DataFrame): Dataset[AnomalyOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("event_id"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (tpe, rows) =>
        val sorted = rows.toSeq.sortBy(r => (r._3, r._4))
        var st = AnomalyState(0L, 0L, 0L, 0L)
        sorted.foreach { case (_, cents, _, _) => st = anomalyStep(st, cents) }
        AnomalyOut(tpe, st.n, st.nFlagged)
      }
  }

  /** One prequential step: test x against the pre-x moments, then fold
    * x in. BigInt keeps (x·n − S)² exact at any history length.
    */
  private def anomalyStep(st: AnomalyState, cents: Long): AnomalyState = {
    val flagged =
      if (st.n >= 5L) {
        val n = BigInt(st.n); val s = BigInt(st.sumCents)
        val q = BigInt(st.sumSqCents); val x = BigInt(cents)
        val dev = x * n - s
        dev * dev > BigInt(9) * (n * q - s * s)
      } else false
    AnomalyState(st.n + 1L, st.sumCents + cents,
      st.sumSqCents + cents * cents,
      st.nFlagged + (if (flagged) 1L else 0L))
  }

  /** ST-19: idempotent foreachBatch parquet sink — the exactly-once
    * write discipline. Structured Streaming guarantees at-least-once
    * foreachBatch invocation: after a driver failure the LAST batch is
    * re-delivered with the SAME batchId. Writing each micro-batch to
    * `path/batch=<id>` and skipping when that partition's own
    * `_GRAFT_COMMITTED` marker already exists makes re-delivery a
    * no-op, so the sink's contents equal the exactly-once union of
    * distinct batches. The marker is written BY THIS SINK after the
    * parquet write completes — it does not depend on the committer's
    * `_SUCCESS` (which mapreduce.fileoutputcommitter.marksuccessfuljobs
    * can disable). The marker-gated overwrite also heals a
    * HALF-written partition (no marker ⇒ rewrite): crash-safe in both
    * directions. Single-writer assumption: exactly one streaming query
    * (the checkpoint owner) writes a given batchId at a time — the
    * exists-check + overwrite is not atomic, so a zombie driver racing
    * its failover replacement on the SAME batch could interleave;
    * Structured Streaming's checkpoint lock provides that ownership.
    * At 100 TB this is the standard lakehouse append pattern — one
    * directory per batch, visibility via marker, no table-format
    * dependency (the sources.VersionedTable discipline applied to a
    * stream).
    */
  def idempotentBatchWrite(df: DataFrame, batchId: Long, path: String): Unit = {
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(s"$path/batch=$batchId")
    val fs = dir.getFileSystem(conf)
    val marker = new org.apache.hadoop.fs.Path(dir, "_GRAFT_COMMITTED")
    if (!fs.exists(marker)) {
      df.write.mode("overwrite").parquet(dir.toString)
      fs.create(marker, true).close()
    }
  }

  case class NearDupState(kept: Array[Long])
  case class NearDupOut(doc_id: Long, simhash: Long, kept: Boolean)

  /** ST-24: streaming content near-dup filter — ingestion-time dedup
    * by SIMILARITY, not identity (the streaming face of the
    * ext_simhash_neardup batch path; ST-5/ST-9 drop only exact key
    * repeats). Each doc's 64-bit simhash (the native `simhash64`
    * expression over its token array) is blocked on its 16-bit prefix
    * segment; within a segment the state carries the
    * KEPT (canonical) hashes, and an arrival is dropped iff some kept
    * hash is within `maxHamming`. Single-band blocking by design —
    * recall is probabilistic like any one LSH band; production fans
    * out all 4 segment bands as parallel filters and ORs the drops
    * (exactly the batch pigeonhole discipline), which multiplies
    * state by 4, not the semantics.
    *
    * Ordering contract: rows sort (doc_id) within each micro-batch
    * and state carries across batches, so stream ≡ the batch
    * sequential fold for id-ordered arrival (the ST-18/20/23
    * contract). State is one row per OCCUPIED segment holding its
    * kept hashes — O(distinct content), the same asymptote as any
    * dedup index, and 8 bytes per kept doc.
    */
  def nearDupFilter(docs: DataFrame, maxHamming: Int = 12): Dataset[NearDupOut] = {
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    nearDupPrep(docs)
      .groupByKey(_._3)
      .flatMapGroupsWithState[NearDupState, NearDupOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[NearDupState]) =>
          val sorted = rows.toSeq.sortBy(_._1)
          var kept = state.getOption.map(_.kept.toVector).getOrElse(Vector.empty[Long])
          val out = sorted.map { case (id, sh, _) =>
            val dup = kept.exists(k => java.lang.Long.bitCount(k ^ sh) <= maxHamming)
            if (!dup) kept = kept :+ sh
            NearDupOut(id, sh, !dup)
          }
          state.update(NearDupState(kept.toArray))
          out.iterator
      }
  }

  /** ST-24 PRODUCTION shape (round 12): all four 16-bit simhash
    * segments run as PARALLEL band filters and the drops are OR'd —
    * the batch pigeonhole discipline (any pair within Hamming < 4
    * shares some identical segment; wider radii gain recall
    * probabilistically per extra band) applied at ingestion. Each
    * (band, segment-value) bucket runs the ST-24 sequential fold with
    * its own band-local kept set; a doc is globally kept iff NO band
    * found a kept near-dup. Band-local kept sets mean transitive
    * chains collapse like the batch nearDupComponents discipline: if
    * a~b in band 0 and b~c in band 2 (a≁c), b keeps representing its
    * band-2 bucket even though b itself was dropped, so c drops too —
    * one canonical survivor per chain.
    *
    * Two stateful operators chain in one query (Append-mode
    * flatMapGroupsWithState → per-doc aggregation): each doc's four
    * band verdicts derive from the same input row, so they land in the
    * same micro-batch and the OR emits exactly once per doc. State is
    * one row per occupied (band, segment) bucket — 4× the single-band
    * state, same O(distinct content) asymptote.
    *
    * OUTPUT-MODE CONTRACT: the per-doc OR is a watermark-less streaming
    * aggregation downstream of flatMapGroupsWithState, so the query runs
    * in Update (or Complete) output mode ONLY — starting it in Append
    * fails at analysis. NOT a drop-in for the single-band
    * [[nearDupFilter]], which is append-safe; pick by sink mode.
    */
  def nearDupFilterMultiBand(docs: DataFrame,
      maxHamming: Int = 12): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    nearDupPrepBands(docs)
      .groupByKey(_._3)
      .flatMapGroupsWithState[NearDupState, NearDupOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[NearDupState]) =>
          val sorted = rows.toSeq.sortBy(_._1)
          var kept = state.getOption.map(_.kept.toVector).getOrElse(Vector.empty[Long])
          val out = sorted.map { case (id, sh, _) =>
            val dup = kept.exists(k => java.lang.Long.bitCount(k ^ sh) <= maxHamming)
            if (!dup) kept = kept :+ sh
            NearDupOut(id, sh, !dup)
          }
          state.update(NearDupState(kept.toArray))
          out.iterator
      }
      .groupBy("doc_id")
      .agg(min("simhash").as("simhash"), expr("bool_and(kept)").as("kept"))
  }

  /** The batch formulation of the multi-band OR — its replay anchor:
    * the same per-(band, segment) sequential folds, OR'd per doc.
    */
  def nearDupFilterMultiBandBatch(docs: DataFrame,
      maxHamming: Int = 12): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    nearDupPrepBands(docs)
      .groupByKey(_._3)
      .flatMapGroups { (_, rows) =>
        val sorted = rows.toSeq.sortBy(_._1)
        var kept = Vector.empty[Long]
        sorted.map { case (id, sh, _) =>
          val dup = kept.exists(k => java.lang.Long.bitCount(k ^ sh) <= maxHamming)
          if (!dup) kept = kept :+ sh
          NearDupOut(id, sh, !dup)
        }.iterator
      }
      .groupBy("doc_id")
      .agg(min("simhash").as("simhash"), expr("bool_and(kept)").as("kept"))
  }

  /** One row per (doc, band): group key = band << 16 | segment value. */
  private def nearDupPrepBands(docs: DataFrame): Dataset[(Long, Long, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"),
        call_function("simhash64",
          filter(split(col("text"), " "), t => t =!= "")).as("sh"))
      .select(col("doc_id"), col("sh"), explode(transform(
        sequence(lit(0L), lit(3L)), b =>
          shiftleft(b, 16).bitwiseOR(
            call_function("shiftrightunsigned", col("sh"), (b * 16).cast("int"))
              .bitwiseAND(lit(0xFFFFL))))).as("key"))
      .as[(Long, Long, Long)]
  }

  /** The batch formulation of the same fold — ST-24's replay anchor. */
  def nearDupFilterBatch(docs: DataFrame, maxHamming: Int = 12): Dataset[NearDupOut] = {
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    nearDupPrep(docs)
      .groupByKey(_._3)
      .flatMapGroups { (_, rows) =>
        val sorted = rows.toSeq.sortBy(_._1)
        var kept = Vector.empty[Long]
        sorted.map { case (id, sh, _) =>
          val dup = kept.exists(k => java.lang.Long.bitCount(k ^ sh) <= maxHamming)
          if (!dup) kept = kept :+ sh
          NearDupOut(id, sh, !dup)
        }.iterator
      }
  }

  private def nearDupPrep(docs: DataFrame): Dataset[(Long, Long, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"),
        call_function("simhash64",
          filter(split(col("text"), " "), t => t =!= "")).as("sh"))
      .withColumn("seg", shiftrightunsigned(col("sh"), 48))
      .as[(Long, Long, Long)]
  }

  case class TrendOut(hour_ms: Long, rank: Int, event_type: String, cnt: Long)

  /** ST-29: per-window trending top-k — the RANKED leaderboard per
    * closed hour, which the windowed-count rows of ST-1 and the global
    * sketch of ST-10 both stop short of (streaming can't put a rank
    * window over an un-finalized aggregate). Key = epoch hour; state =
    * a MapState (type → count) updated IN PLACE per event plus a 1-row
    * armed flag; an EVENT-TIME TIMER at the hour's end emits the top-k
    * (cnt desc, type asc — full deterministic tiebreak) exactly once
    * when the watermark passes it, then CLEARS the hour's state. The
    * count fold is order-independent, so no per-batch sort is needed
    * (unlike the ST-18/20/23 sequential folds). State = (open hours) ×
    * (type domain + 1) rows — never O(stream); requires the RocksDB
    * provider (timers → multi column families).
    */
  class TrendingProcessor(k: Int)
      extends StatefulProcessor[Long, (Long, String), TrendOut] {
    @transient private var counts: MapState[String, Long] = _
    @transient private var armed: ValueState[Long] = _
    private val hourMs = 3600L * 1000

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long]("trend",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
        timerValues: TimerValues): Iterator[TrendOut] = {
      rows.foreach { case (_, tpe) =>
        val c = if (counts.containsKey(tpe)) counts.getValue(tpe) else 0L
        counts.updateValue(tpe, c + 1L)
      }
      // the fire time is a pure function of the key, so arm it once
      if (!armed.exists()) {
        getHandle.registerTimer(key + hourMs)
        armed.update(1L)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[TrendOut] = {
      val top = counts.iterator().toSeq
        .sortBy { case (t, c) => (-c, t) }.take(k)
      counts.clear()
      armed.clear()
      top.zipWithIndex.map { case ((t, c), i) =>
        TrendOut(key, i + 1, t, c)
      }.iterator
    }
  }

  /** Windowed trending top-k (ST-29): append-mode finalized per-hour
    * leaderboards under a 10-min watermark.
    */
  def trendingTypes(events: DataFrame, k: Int = 3): Dataset[TrendOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", "10 minutes")
      .select((unix_millis(col("ts")) - pmod(unix_millis(col("ts")),
        lit(3600L * 1000))).as("hour_ms"), col("event_type"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .transformWithState(new TrendingProcessor(k),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** The batch formulation — ST-29's replay anchor: per-hour top-k by
    * (count desc, type asc).
    */
  def trendingBatch(events: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = events
      .select((unix_millis(col("ts")) - pmod(unix_millis(col("ts")),
        lit(3600L * 1000))).as("hour_ms"), col("event_type"))
      .groupBy("hour_ms", "event_type")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("hour_ms")
      .orderBy(col("cnt").desc, col("event_type").asc)
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
