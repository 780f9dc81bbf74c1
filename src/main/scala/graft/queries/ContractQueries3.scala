package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-3 contract queries (continued): the remaining storage formats
  * (Avro, XML — both built-in datasources in Spark 4), batch session
  * windows anchored to a gaps-and-islands oracle, deterministic mode(),
  * the VARIANT semi-structured type, map-type higher-order functions,
  * and the regexp completion set.
  *
  * Same determinism discipline as ContractQueries/ContractQueries2
  * (SURVEY §5.2): doubles rounded in-query, BIGINT-aligned ints, total
  * ORDER BY on row-level results.
  */
object ContractQueries3 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- Q71/Q72 source round-trips (S-9 Avro, S-10 XML) -------------------
  // Same gate shape as q62/q63: customer → write → read back → aggregate;
  // hash-matching the direct-parquet oracle proves the writer/reader pair
  // preserves values exactly. Avro is binary (exact doubles); XML writes
  // doubles via Java's round-trip-exact formatting and reads them back
  // under an explicit schema, like CSV.
  // This Spark build ships AvroFileFormat inside spark-sql but without a
  // DataSourceRegister service entry, so the short name "avro" does not
  // resolve — the fully-qualified provider class does.
  private val AvroProvider = "org.apache.spark.sql.avro.AvroFileFormat"

  private def roundTrip(s: SparkSession, dir: String, fmt: String): DataFrame = {
    val tmp = s"/tmp/graft_rt_${math.abs(dir.hashCode)}/$fmt/customer"
    val format = if (fmt == "avro") AvroProvider else fmt
    val c = t(s, dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    val w = c.write.mode("overwrite")
    (if (fmt == "xml") w.option("rowTag", "customer") else w).format(format).save(tmp)
    val r = s.read.format(format)
    val back = (if (format == "xml")
      r.option("rowTag", "customer")
        .schema("c_custkey long, c_mktsegment string, c_acctbal double")
    else r).load(tmp)
    back.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("bal"))
      .orderBy("c_mktsegment")
  }

  def q71AvroRoundtrip(s: SparkSession, dir: String): DataFrame = roundTrip(s, dir, "avro")
  def q72XmlRoundtrip(s: SparkSession, dir: String): DataFrame = roundTrip(s, dir, "xml")

  // S-13: JSON-lines file source/sink, same gate (schema-on-read pins
  // types; doubles survive via Java's round-trip-exact formatting).
  def q82JsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = s"/tmp/graft_rt_${math.abs(dir.hashCode)}/json/customer"
    t(s, dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
      .write.mode("overwrite").json(tmp)
    s.read.schema("c_custkey long, c_mktsegment string, c_acctbal double")
      .json(tmp)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("bal"))
      .orderBy("c_mktsegment")
  }

  // ---- Q73 batch session windows (ST-3's cross-engine anchor) ------------
  // session_window(ts, 30 min) in BATCH mode: Spark merges events into
  // sessions [first, last+gap) where consecutive events merge iff
  // ts < prev_end (strictly — an event at exactly prev_end opens a new
  // session). The DuckDB oracle is the equivalent gaps-and-islands
  // rewrite (new island when the gap is >= 30 min), so StreamingSpec's
  // ST-3 replay is anchored to a cross-engine oracle at session
  // granularity, not to Spark's own session_window.
  def q73SessionWin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("ss"), col("sw.end").as("se"),
        col("n_events"))
      .orderBy("user_id", "ss")
      .limit(200)

  // ---- Q74 deterministic mode() (A-family, Spark 4 native) ---------------
  // mode(col, true) pins tie-breaks to the LOWEST value, making the
  // statistical mode hashable; the oracle replicates it as the
  // count-desc/value-asc argmax.
  def q74Mode(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(expr("mode(o_orderpriority, true)").as("md"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  // ---- Q75 VARIANT semi-structured type (F-10, Spark 4 native) -----------
  // parse_json → VARIANT → typed variant_get extraction, then a plain
  // aggregate over the extracted values. The VARIANT column itself never
  // leaves the plan (it is not a hashable output type); what the oracle
  // pins is extraction semantics ≡ DuckDB's JSON path extraction.
  def q75Variant(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
      .groupBy("event_type")
      .agg(count(col("k")).as("n"), sum("k").as("sum_k"), max("k").as("max_k"))
      .orderBy("event_type")

  // ---- Q76 map-type functions + map lambdas (F-7 oracled) ----------------
  // from_json → MapType, then the map HOF surface: map_keys,
  // element_at, transform_values, map_filter, map_concat. props is a
  // one-key object per fixture row, so every derived value is exactly
  // JSON-reproducible.
  def q76Map(s: SparkSession, dir: String): DataFrame = {
    val m = from_json(col("props"), org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.IntegerType))
    t(s, dir, "events")
      .select(col("event_id"), m.as("m"))
      .select(col("event_id"),
        array_join(map_keys(col("m")), ",").as("ks"),
        element_at(col("m"), "k").cast("long").as("k"),
        element_at(transform_values(col("m"), (_, v) => v * 2), "k")
          .cast("long").as("k2"),
        size(map_filter(col("m"), (_, v) => v > 50)).cast("long").as("n_big"),
        element_at(map_concat(col("m"), map(lit("extra"), lit(7))), "extra")
          .cast("long").as("extra"))
      .orderBy("event_id")
      .limit(100)
  }

  // ---- Q77 regexp completion (F-1d): count / instr / substr --------------
  def q77Regexp2(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        regexp_count(col("text"), lit("ta[a-z]+")).cast("long").as("n_ta"),
        expr("regexp_instr(text, 'spark')").cast("long").as("pos_spark"),
        expr("regexp_substr(text, '[a-z]{5,}')").as("long_tok"))
      .orderBy("doc_id")
      .limit(100)

  // ---- Q78 binary-file ingestion (S-11, the multimodal ingest path) ------
  // Sorted customer keys are written as a single text file, re-ingested
  // through the binaryFile source (path/length/content), and the raw
  // BYTES are hashed. The oracle reconstructs the identical byte stream
  // in SQL (ordered string_agg of "key\n"), so content fidelity of the
  // binary ingest path is pinned end-to-end — the same path opaque
  // image/audio payloads take into the multimodal pipeline.
  def q78Binaryfile(s: SparkSession, dir: String): DataFrame = {
    val tmp = s"/tmp/graft_bin_${math.abs(dir.hashCode)}/keys"
    t(s, dir, "customer")
      .select(col("c_custkey").cast("string"))
      .repartition(1)
      .sortWithinPartitions(col("c_custkey").cast("long"))
      .write.mode("overwrite").text(tmp)
    s.read.format("binaryFile").option("pathGlobFilter", "part-*").load(tmp)
      .select(lit("keys").as("src"), col("length"),
        sha2(col("content"), 256).as("sha"))
  }

  // ---- Q79 robust statistics: median absolute deviation (A-18) ----------
  // Outlier-resistant spread per group: MAD = median(|x − median(x)|).
  // Two exact-percentile passes; the per-group median table broadcasts
  // back onto the scan, so the cost is two aggregates — no sort of the
  // full data (percentile() aggregates, it does not ORDER BY).
  def q79Mad(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val med = o.groupBy("o_orderstatus")
      .agg(expr("percentile(o_totalprice, 0.5)").as("med"))
    o.join(broadcast(med), "o_orderstatus")
      .groupBy("o_orderstatus")
      .agg(round(min("med"), 2).as("med"),
        round(expr("percentile(abs(o_totalprice - med), 0.5)"), 2).as("mad"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }

  // ---- Q80 partitioned sink + dynamic partition overwrite (S-12) ---------
  // The managed-storage write path: orders land partitioned by year,
  // then ONE partition is surgically rewritten (prices doubled) under
  // dynamic partitionOverwriteMode — untouched partitions must survive.
  // The read-back aggregate hash-matches an oracle computing the
  // expected post-overwrite state, so both the partition layout and the
  // overwrite scoping are gated cross-engine. (Static mode — the
  // default — would have dropped every other year on the second write.)
  def q80DynPartition(s: SparkSession, dir: String): DataFrame = {
    val tmp = s"/tmp/graft_dynpart_${math.abs(dir.hashCode)}/orders"
    val o = t(s, dir, "orders")
      .withColumn("yr", year(col("o_orderdate")).cast("int"))
    val prev = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      o.write.mode("overwrite").partitionBy("yr").parquet(tmp)
      o.filter(col("yr") === 1995)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .write.mode("overwrite").partitionBy("yr").parquet(tmp)
    } finally {
      prev.fold(s.conf.unset("spark.sql.sources.partitionOverwriteMode"))(
        s.conf.set("spark.sql.sources.partitionOverwriteMode", _))
    }
    s.read.parquet(tmp)
      .groupBy(col("yr").cast("long").as("yr"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy("yr")
  }

  // ---- Q81 array completion (F-4c): append/prepend/compact/overlap -------
  def q81Arr3(s: SparkSession, dir: String): DataFrame = {
    val toks = filter(split(col("text"), " "), t => t =!= "")
    t(s, dir, "documents")
      .select(col("doc_id"),
        array_join(array_append(slice(toks, 1, 3), lit("zzz")), ",").as("ap"),
        array_join(array_prepend(slice(toks, 1, 3), lit("aaa")), ",").as("pp"),
        size(array_compact(transform(toks,
          tok => when(tok === "the", lit(null)).otherwise(tok))))
          .cast("long").as("nc"),
        arrays_overlap(toks, array(lit("spark"), lit("hash"))).as("ov"))
      .orderBy("doc_id")
      .limit(100)
  }

  // ---- Q84 small-file compaction (S-15) ----------------------------------
  // customer is deliberately fragmented into 64 tiny files, compacted
  // back (sources.Compaction), and the read-back rollup must hash-match
  // the direct-table oracle — values untouched, file count collapsed
  // (the count drop itself is asserted in CompactionSpec).
  def q84Compact(s: SparkSession, dir: String): DataFrame = {
    val tmp = s"/tmp/graft_compact_${math.abs(dir.hashCode)}/customer"
    t(s, dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
      .repartition(64)
      .write.mode("overwrite").parquet(tmp)
    graft.sources.Compaction.compactParquet(s, tmp)
    s.read.parquet(tmp)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("bal"))
      .orderBy("c_mktsegment")
  }

  // ---- Q83 SQL DDL/DML: CTAS + INSERT INTO + catalog read (S-14) ---------
  // The managed-table path: CREATE TABLE ... USING parquet AS SELECT
  // into the session catalog (in-memory catalog + filesystem warehouse,
  // no Hive), append via INSERT INTO, read back through the catalog by
  // name. DROP-first keeps the query rerun-idempotent.
  def q83Ctas(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "nation").createOrReplaceTempView("graft_nation_v")
    s.sql("DROP TABLE IF EXISTS graft_ctas")
    // DROP only removes what THIS session's in-memory catalog knows; a
    // warehouse dir left by a previous session would still fail CTAS
    // with LOCATION_ALREADY_EXISTS — remove the location itself.
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), "graft_ctas")
    loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
    s.sql("""CREATE TABLE graft_ctas USING parquet AS
             SELECT n_regionkey, count(*) AS n
             FROM graft_nation_v GROUP BY n_regionkey""")
    s.sql("INSERT INTO graft_ctas VALUES (99, 0)")
    s.sql("SELECT n_regionkey, n FROM graft_ctas ORDER BY n_regionkey")
  }

  /** Round-3 contract queries keyed by id. */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q71_avro_roundtrip" -> (q71AvroRoundtrip _),
    "q72_xml_roundtrip" -> (q72XmlRoundtrip _),
    "q73_sessionwin" -> (q73SessionWin _),
    "q74_mode" -> (q74Mode _),
    "q75_variant" -> (q75Variant _),
    "q76_map" -> (q76Map _),
    "q77_regexp2" -> (q77Regexp2 _),
    "q78_binaryfile" -> (q78Binaryfile _),
    "q79_mad" -> (q79Mad _),
    "q80_dynpart" -> (q80DynPartition _),
    "q81_arr3" -> (q81Arr3 _),
    "q82_json_roundtrip" -> (q82JsonRoundtrip _),
    "q83_ctas" -> (q83Ctas _),
    "q84_compact" -> (q84Compact _))
}
