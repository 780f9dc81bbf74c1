package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic-fixture generator for SCALING measurements
  * (SURVEY §7 / round-7 judge directive: one sf1 datapoint).
  *
  * Generates the same table shapes and value domains as the driver's
  * `/root/testdata` fixtures (schemas pinned by FixtureSchemaSpec's
  * documentation, domains re-profiled from sf0.1) at an arbitrary row
  * multiplier, entirely with distributed DataFrame jobs — `spark.range`
  * plus xxhash64-derived columns, no driver-side data, no RNG. Running
  * the SAME generator at mult=1 (sf0.1-equivalent row counts) and
  * mult=10 (sf1) gives two distribution-identical datasets whose
  * bench-time RATIO is the scaling curve; absolute numbers stay
  * comparable to BASELINE.md because row counts and domains match the
  * driver fixtures.
  *
  * Usage: runMain graft.tools.GenScale <outDir> <mult>
  */
object GenScale {

  private def h(seed: String, c: org.apache.spark.sql.Column) =
    abs(xxhash64(lit(seed), c))

  /** The documents table alone, as a DataFrame (no write) — reused by
    * GloveScaleSpec to train on a 50k-doc corpus without materializing
    * the full fixture set. Semantics identical to the `generate` output:
    * 8–96 words, word choice seeded per (doc, position). Duplication is
    * PLANTED at a known linear rate so the dedup probes have a
    * ground-truth answer: docs with id % 20 == 13 are EXACT copies of
    * id-5, docs with id % 20 == 7 are NEAR copies of id-3 (one appended
    * token); everything else is unique. Expected: exact-dup keepers =
    * 19/20 of rows, near-dup candidates ~ rows/20 — both linear in
    * corpus size.
    *
    * @param vocabSize 0 (default) keeps the fixture-compatible 30-word
    *   vocabulary. A positive value draws words uniformly from a
    *   synthetic vocabulary `w0..w<vocabSize-1>` instead — the round-10
    *   judge's realism knob: the 30-word vocab saturates 3-gram space
    *   (27k possible shingles) and degenerates unigram shingles (every
    *   doc's token SET is near-identical), so LSH/dupspan curves on it
    *   measure corpus degeneracy as much as banding; a mult-scaled
    *   vocab (e.g. 10k words at m100) gives shingle/token-set
    *   distributions where only the PLANTED dups collide, and makes the
    *   GloVe battery exercise the large-V cooc path. The planted dup
    *   structure (baseId) is vocab-independent, so ground truth is
    *   unchanged.
    * @param sharedSpanRate 0 (default) = off — every pre-round-13
    *   measured row is byte-identical. k > 0 (multiple of 10) plants
    *   SPAN-level ground truth (round-12 judge directive #4) in blocks
    *   of M = 2k docs: docs at block residues 3 and 5 both get the same
    *   24-token span `s<block>_0..23` appended (a shared verbatim span
    *   between exactly that pair — SpanDedup must remove exactly those
    *   24 tokens from the LARGER id, residue 5); the doc at residue 9
    *   gets a 12-token block `r<id>_0..11` appended TWICE in a row (an
    *   intra-doc loop — SelfRepeatTrim must remove exactly the later
    *   12-token copy). M is a multiple of 20 so the planted residues
    *   (3, 5, 9 mod 20) never collide with the doc-level dup residues
    *   (7, 13 mod 20), and span/loop tokens live in namespaces (`s*_*`,
    *   `r*_*`) disjoint from both vocabularies — truth composes:
    *   span-pair count = nDocs/2k, loop-doc count = nDocs/2k, each with
    *   an exact tokens_removed.
    */
  def documentsDf(spark: SparkSession, nDocs: Long,
      vocabSize: Int = 0, sharedSpanRate: Int = 0): DataFrame = {
    val langs = array(Seq("en", "en", "en", "de", "es", "fr", "zh").map(lit): _*)
    val vocab = array(Seq("spark", "sort", "column", "line", "part",
      "batch", "scan", "hash", "query", "table", "order", "value",
      "group", "fast", "slow", "small", "agg", "vector", "a", "g",
      "join", "shuffle", "plan", "stage", "row", "page", "disk",
      "cache", "merge", "limit").map(lit): _*)
    def pick(arr: org.apache.spark.sql.Column, seed: String,
        c: org.apache.spark.sql.Column) =
      element_at(arr, (pmod(h(seed, c), size(arr).cast("long")) + 1).cast("int"))
    val baseId = when(pmod(col("id"), lit(20)) === 7, col("id") - 3)
      .when(pmod(col("id"), lit(20)) === 13, col("id") - 5)
      .otherwise(col("id"))
    val words = transform(
      sequence(lit(1), (pmod(h("dl", baseId), lit(89)) + 8).cast("int")),
      i =>
        if (vocabSize > 0)
          concat(lit("w"),
            pmod(abs(xxhash64(lit("dw"), baseId, i)), lit(vocabSize.toLong)))
        else element_at(vocab,
          (pmod(abs(xxhash64(lit("dw"), baseId, i)), size(vocab).cast("long")) + 1)
            .cast("int")))
    val planted = if (sharedSpanRate == 0) lit("") else {
      require(sharedSpanRate % 10 == 0,
        s"sharedSpanRate must be a multiple of 10 (block = 2k docs must " +
          s"align with the mod-20 dup planting), got $sharedSpanRate")
      val m2 = 2L * sharedSpanRate
      val grp = floor(col("id") / m2).cast("long")
      val res = pmod(col("id"), lit(m2))
      // digit→letter transliteration: planted tokens must survive
      // TextAnalysis.scrub (which rewrites [0-9]+ to <NUM> — digit ids
      // would collapse every span/loop token to ONE string corpus-wide
      // and the df-cap would drop them all), so ids encode as letters
      def alpha(c: org.apache.spark.sql.Column) =
        translate(c.cast("string"), "0123456789", "abcdefghij")
      val span = concat_ws(" ", transform(sequence(lit(0), lit(23)),
        i => concat(lit("s"), alpha(grp), lit("x"), alpha(i))))
      val block = concat_ws(" ", transform(sequence(lit(0), lit(11)),
        i => concat(lit("r"), alpha(col("id")), lit("x"), alpha(i))))
      // doc-UNIQUE separator before the span: without it, a pair whose
      // two bases happen to END in the same vocab word (1/V per pair)
      // truly shares a 25-token span and the exact-24 expectation
      // breaks — the separator pins the shared run to the planted span
      when(res === 3 || res === 5,
          concat(lit(" q"), alpha(col("id")), lit(" "), span))
        .when(res === 9, concat(lit(" "), block, lit(" "), block))
        .otherwise(lit(""))
    }
    spark.range(nDocs).select(col("id").as("doc_id"),
        concat(concat_ws(" ", words),
          when(pmod(col("id"), lit(20)) === 7, lit(" xdup")).otherwise(lit("")),
          planted)
          .as("text"),
        pick(langs, "dlg", col("id")).as("lang"),
        concat(lit("src"), pmod(h("dsv", col("id")), lit(20))).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  def generate(spark: SparkSession, out: String, mult: Int,
      vocabSize: Int = 0): Unit = {
    val nCustomer = 15000L * mult
    val nOrders = 150000L * mult
    val nLineitem = 600000L * mult
    val nSupplier = 1000L * mult
    val nPart = 20000L * mult
    val nEvents = 100000L * mult
    val nDocs = 5000L * mult
    val nEmb = 2000L * mult

    val segments = array(Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
      "HOUSEHOLD", "MACHINERY").map(lit): _*)
    val priorities = array(Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
      "4-NOT SPECIFIED", "5-LOW").map(lit): _*)
    val eventTypes = array(Seq("click", "error", "purchase", "signup",
      "view").map(lit): _*)
    val langs = array(Seq("en", "en", "en", "de", "es", "fr", "zh").map(lit): _*)
    val vocab = array(Seq("spark", "sort", "column", "line", "part",
      "batch", "scan", "hash", "query", "table", "order", "value",
      "group", "fast", "slow", "small", "agg", "vector", "a", "g",
      "join", "shuffle", "plan", "stage", "row", "page", "disk",
      "cache", "merge", "limit").map(lit): _*)

    def pick(arr: org.apache.spark.sql.Column, seed: String,
        c: org.apache.spark.sql.Column) =
      element_at(arr, (pmod(h(seed, c), size(arr).cast("long")) + 1).cast("int"))

    // region / nation: scale-invariant dims, same keys as the fixtures
    val regionNames = array(Seq("AFRICA", "AMERICA", "ASIA", "EUROPE",
      "MIDDLE EAST").map(lit): _*)
    spark.range(5).select(col("id").cast("int").as("r_regionkey"),
        element_at(regionNames, (col("id") + 1).cast("int")).as("r_name"))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/region.parquet")
    spark.range(25).select(col("id").cast("int").as("n_nationkey"),
        concat(lit("NATION_"), col("id")).as("n_name"),
        pmod(col("id"), lit(5)).cast("int").as("n_regionkey"))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/nation.parquet")

    spark.range(nCustomer).select(col("id").as("c_custkey"),
        concat(lit("Customer#"), col("id")).as("c_name"),
        pmod(h("cn", col("id")), lit(25)).cast("int").as("c_nationkey"),
        round(pmod(h("cb", col("id")), lit(1099999L)) / 100.0 - 999.99, 2)
          .as("c_acctbal"),
        pick(segments, "cs", col("id")).as("c_mktsegment"))
      .write.mode("overwrite").parquet(s"$out/customer.parquet")

    spark.range(nSupplier).select(col("id").as("s_suppkey"),
        concat(lit("Supplier#"), col("id")).as("s_name"),
        pmod(h("sn", col("id")), lit(25)).cast("int").as("s_nationkey"),
        round(pmod(h("sb", col("id")), lit(1099999L)) / 100.0 - 999.99, 2)
          .as("s_acctbal"))
      .write.mode("overwrite").parquet(s"$out/supplier.parquet")

    spark.range(nPart).select(col("id").as("p_partkey"),
        concat(lit("part "), pick(vocab, "pw", col("id")), lit(" "),
          pick(vocab, "pw2", col("id"))).as("p_name"),
        concat(lit("Brand#"), pmod(h("pb", col("id")), lit(25))).as("p_brand"),
        concat(pick(vocab, "pt", col("id")), lit(" "),
          pick(vocab, "pt2", col("id"))).as("p_type"),
        (pmod(h("ps", col("id")), lit(50)) + 1).cast("int").as("p_size"),
        round(pmod(h("pr", col("id")), lit(200000L)) / 100.0 + 900, 2)
          .as("p_retailprice"))
      .write.mode("overwrite").parquet(s"$out/part.parquet")

    // orders: dates span 1995-01-01 .. 2001-08-01 (~2400 days)
    val day = 86400L
    spark.range(nOrders).select(col("id").as("o_orderkey"),
        pmod(h("oc", col("id")), lit(nCustomer)).as("o_custkey"),
        pick(array(lit("F"), lit("O"), lit("P")), "os", col("id"))
          .as("o_orderstatus"),
        round(pmod(h("op", col("id")), lit(45000000L)) / 100.0 + 900, 2)
          .as("o_totalprice"),
        to_timestamp(from_unixtime(
          lit(788918400L) + pmod(h("od", col("id")), lit(2400L)) * day))
          .as("o_orderdate"),
        pick(priorities, "opr", col("id")).as("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$out/orders.parquet")

    spark.range(nLineitem).select(
        pmod(col("id"), lit(nOrders)).as("l_orderkey"),
        pmod(h("lp", col("id")), lit(nPart)).as("l_partkey"),
        pmod(h("ls", col("id")), lit(nSupplier)).as("l_suppkey"),
        (pmod(h("ln", col("id")), lit(7)) + 1).cast("int").as("l_linenumber"),
        (pmod(h("lq", col("id")), lit(50)) + 1).cast("double").as("l_quantity"),
        round(pmod(h("le", col("id")), lit(9500000L)) / 100.0 + 900, 2)
          .as("l_extendedprice"),
        (pmod(h("ld", col("id")), lit(11)) / lit(100.0)).as("l_discount"),
        (pmod(h("lt", col("id")), lit(9)) / lit(100.0)).as("l_tax"),
        pick(array(lit("A"), lit("N"), lit("R")), "lr", col("id"))
          .as("l_returnflag"),
        pick(array(lit("F"), lit("O")), "ll", col("id")).as("l_linestatus"),
        to_timestamp(from_unixtime(
          lit(788918400L) + pmod(h("lsd", col("id")), lit(2500L)) * day))
          .as("l_shipdate"))
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // events: 30 days of microsecond timestamps, 1.5k users per sf0.1
    val nUsers = 1500L * mult
    spark.range(nEvents).select(col("id").as("event_id"),
        to_timestamp((lit(1704067200000000L) +
          pmod(h("ets", col("id")), lit(30L * day * 1000000L)))
          .cast("double") / 1000000.0).as("ts"),
        pmod(h("eu", col("id")), lit(nUsers)).as("user_id"),
        pick(eventTypes, "ee", col("id")).as("event_type"),
        round(pmod(h("ev", col("id")), lit(56021L)) / 100.0, 2).as("value"),
        concat(lit("{\"k\": "), pmod(h("ek", col("id")), lit(100)), lit("}"))
          .as("props"))
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    documentsDf(spark, nDocs, vocabSize)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    embeddingsDf(spark, nEmb)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  /** The embeddings table alone (no write): 64-dim, 10 LABELED
    * clusters (label-seeded center ± per-vector noise) — unlike the
    * driver fixtures' uniform unit vectors, these have real geometry
    * (within-cluster distance ≈ 2, between ≈ 7), which is what the
    * clustering/ANN quality specs need.
    */
  def embeddingsDf(spark: SparkSession, nEmb: Long): DataFrame = {
    val emb = transform(sequence(lit(0), lit(63)), i =>
      ((pmod(abs(xxhash64(lit("ec"), pmod(col("id"), lit(10)), i)), lit(2001L)) - 1000L)
        .cast("double") / 1000.0 +
        (pmod(abs(xxhash64(lit("en"), col("id"), i)), lit(601L)) - 300L)
          .cast("double") / 1000.0).cast("float"))
    spark.range(nEmb).select(col("id").as("vec_id"), emb.as("embedding"),
      pmod(col("id"), lit(10)).cast("int").as("label"))
  }

  /** Usage: runMain graft.tools.GenScale <outDir> <mult> [vocabSize] —
    * vocabSize > 0 switches documents to the synthetic w0..w<V-1>
    * vocabulary (see [[documentsDf]]); omitted/0 keeps fixture compat.
    */
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val mult = args(1).toInt
    val vocabSize = if (args.length > 2) args(2).toInt else 0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-genscale").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val t0 = System.nanoTime()
    generate(spark, out, mult, vocabSize)
    println(f"GENSCALE done mult=$mult vocab=$vocabSize out=$out " +
      f"in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
