package graft.ops

import graft.Tables
import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-data-pipeline extension queries (dedup, similarity search, text
  * analysis, multimodal plumbing), registered alongside the SURVEY
  * Appendix-A contract with DuckDB oracles wherever the semantics are
  * SQL-expressible.
  *
  * The MinHash and SimHash near-dup queries deliberately share Q24's
  * oracle: the approximate candidate generators plus an exact-Jaccard
  * recheck must reproduce the exact all-pairs result (recall is also
  * property-tested in DedupSpec) — that's the contract that makes them
  * safe to use as the production path at scale.
  */
object ExtensionQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- exact dedup: keeper assignment ------------------------------------
  def extDedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactAssignKeepers(t(s, dir, "documents"))
      .select("doc_id", "keeper", "is_dup", "group_size")
      .orderBy("doc_id")
      .limit(50)

  // ---- Q24-equivalent output from approximate candidates + recheck -------
  // Recheck Jaccard runs on hashed sorted sets via the native merge-walk
  // sorted_long_jaccard (≡ string-set Jaccard, property-tested).
  private def rechecked(docs: DataFrame, cands: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val sets = docs.select(
      col("doc_id"),
      sort_array(transform(array_distinct(split(col("text"), " ")),
        e => xxhash64(e))).as("s"),
      size(split(col("text"), " ")).as("n"))
    val jac = call_function("sorted_long_jaccard", col("sa"), col("sb"))
    cands
      .join(sets.select(col("doc_id").as("id_a"), col("s").as("sa"), col("n").as("na")), "id_a")
      .join(sets.select(col("doc_id").as("id_b"), col("s").as("sb"), col("n").as("nb")), "id_b")
      .filter(abs(col("na") - col("nb")) <= 1 &&
        (col("na") >= 30 || col("nb") >= 30) && jac >= 0.5)
      .select(col("id_a").as("da"), col("id_b").as("db"), round(jac, 4).as("jac"))
      .orderBy(desc("jac"), asc("da"), asc("db"))
      .limit(50)
  }

  // Band geometry: 64 bands x 2 rows puts the LSH s-curve threshold at
  // (1/64)^(1/2) ~= 0.125, so recall at the query's tau=0.5 is
  // 1-(1-0.5^2)^64 ~= 1-1e-8 — effectively exact, which is what lets
  // this query share Q24's oracle. (16x4 would miss ~35% of tau=0.5
  // pairs.) Runs through the full distinct-set pipeline
  // (Dedup.minhashNearDupPairsFromSets): exact-duplicate sets collapse
  // before banding, jac is computed once per SET pair, then expanded.
  def extMinhashNearDup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = Dedup.minhashNearDupPairsFromSets(docs, "doc_id",
      array_distinct(split(col("text"), " ")), threshold = 0.5,
      bands = 64, rowsPerBand = 2)
    val lens = docs.select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    pairs
      .join(lens.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
      .join(lens.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
      .filter(abs(col("na") - col("nb")) <= 1 && (col("na") >= 30 || col("nb") >= 30))
      .select(col("id_a").as("da"), col("id_b").as("db"), round(col("jac"), 4).as("jac"))
      .orderBy(desc("jac"), asc("da"), asc("db"))
      .limit(50)
  }

  // Contract variant runs on PORTABLE fingerprints (sha256-derived
  // 60-bit token hashes, identical in DuckDB), so the oracle recomputes
  // the WHOLE pipeline — fingerprint, pigeonhole segment candidates,
  // exact-Jaccard recheck — instead of the old rows-only check. SimHash
  // candidate recall is genuinely approximate (a jac=1.0 pair with
  // different term counts can sit at Hamming>12), so an all-pairs
  // Jaccard oracle can NOT gate it; recomputing the fingerprints is the
  // only exact contract. Production keeps the xxhash64 native path
  // (simhashNative, property-pinned bit-equal to the relational spec).
  def extSimhashNearDup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val cands = Dedup.simhashCandidatesSegmented(
        Dedup.simhashPortable(docs), maxHamming = 12)
      .select(col("id_a"), col("id_b"))
    rechecked(docs, cands)
  }

  // ---- n-gram (3-gram shingle) Jaccard near-dup --------------------------
  // Production path: MinHash-LSH over the SHINGLE sets (not an all-pairs
  // join) + exact recheck, so the same operator scales to 100 TB while
  // hash-matching the all-pairs oracle. 96x2 bands put the s-curve
  // threshold at ~0.10 — recall at tau=0.4 is 1-(1-0.16)^96 ~ 1-6e-8.
  def extNgramNearDup(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val d = t(s, dir, "documents").select(
      col("doc_id"),
      array_distinct(Dedup.shingles(col("text"), 3)).as("g"),
      size(split(col("text"), " ")).as("n"))
    val cands = Dedup.minhashCandidatesFromSets(d, "doc_id", col("g"),
      bands = 96, rowsPerBand = 2)
    // hashed-sorted shingle sets + native merge-walk Jaccard for the
    // recheck (≡ the string-set formulation the oracle runs)
    val hd = d.select(col("doc_id"), col("n"),
      sort_array(transform(col("g"), e => xxhash64(e))).as("hg"))
    val jac = call_function("sorted_long_jaccard", col("ga"), col("gb"))
    cands
      .join(hd.select(col("doc_id").as("id_a"), col("hg").as("ga"), col("n").as("na")), "id_a")
      .join(hd.select(col("doc_id").as("id_b"), col("hg").as("gb"), col("n").as("nb")), "id_b")
      .filter(abs(col("na") - col("nb")) <= 1 &&
        size(col("ga")) > 0 && size(col("gb")) > 0 && jac >= 0.4)
      .select(col("id_a").as("da"), col("id_b").as("db"), round(jac, 4).as("jac3"))
      .orderBy(desc("jac3"), asc("da"), asc("db"))
      .limit(50)
  }

  // ---- near-dup clustering: pairs -> connected components ----------------
  // The full dedup-grouping path: MinHash-LSH near-dup PAIRS at tau=0.5
  // (64x2 banding — effectively exact recall, see extMinhashNearDup's
  // geometry note) become edges; ConnectedComponents turns them into
  // duplicate clusters labeled by their minimum doc_id. The DuckDB
  // oracle recomputes the same clusters from the exact all-pairs
  // Jaccard graph with a recursive transitive-closure CTE, so this
  // entry hash-gates candidate generation, recheck, AND the iterative
  // component algorithm in one go.
  // The contract slice is bounded to doc_id < 1000 (the full sf0.01
  // table; a fixed slice above that): at sf0.1 the corpus holds ~9M
  // tau>=0.5 pairs, which the ENGINE clusters fine but the all-pairs
  // DuckDB oracle cannot rebuild in bounded time. Full-corpus clustering
  // runs un-sliced inside CorpusPipeline and ConnectedComponentsSpec.
  def extComponents(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").filter(col("doc_id") < 1000)
    Dedup.nearDupComponents(docs, "doc_id", Dedup.tokenSet(col("text")),
        threshold = 0.5, bands = 64, rowsPerBand = 2)
      .orderBy("doc_id")
  }

  // ---- similarity search --------------------------------------------------
  def extEmbedTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5).limit(5), k = 5)
      .orderBy("probe_id", "rank")
  }

  // Production path: blocked exact top-pairs (shuffle O(n·B), bounded
  // task memory, candidate-only final top-k — see Similarity.scaladoc
  // for why LSH cannot serve an exact no-floor top-k on this sim
  // regime). The all-pairs theta-join stays pinned as
  // ext_sim_pairs_allpairs; both hash-match the same DuckDB oracle.
  def extSimPairs(s: SparkSession, dir: String): DataFrame =
    Similarity.blockTopPairs(t(s, dir, "embeddings"), limit = 50, nBlocks = 8)

  def extSimPairsAllPairs(s: SparkSession, dir: String): DataFrame =
    Similarity.topSimilarPairs(t(s, dir, "embeddings"), limit = 50)

  // IVF with nProbe = kCentroids is exhaustive, so this declared query
  // must equal brute force exactly (shares ext_embed_topk's oracle);
  // the approximate nProbe << kCentroids regime is recall-gated in
  // IvfSpec.
  def extIvfTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Ivf.topK(emb, emb.filter(col("vec_id") < 5).limit(5), k = 5,
        kCentroids = 16, nProbe = 16, iters = 2)
      .orderBy("probe_id", "rank")
  }

  // ---- ANN via hyperplane LSH (E-7) --------------------------------------
  // Approximate by construction (multi-probe segment join, Hamming
  // radius 3 over 16-bit sign codes), so no exact DuckDB oracle exists.
  // Not in the driver contract map — E-7's driver gate is the hash-green
  // ext_ann_recall below; recall vs brute force is additionally
  // spec-gated in SimilaritySpec on planted clusters.
  def extAnnTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5), dim = 64, k = 5)
      .orderBy("probe_id", "rank")
  }

  // Measured recall of BOTH approximate ANN paths against the exact
  // brute-force result, as a hashable oracle entry: probes are exact
  // copies of vectors 0..9 planted under an offset id namespace, so the
  // exact top-1 of each probe is its original (cos = 1.0) and any
  // correct ANN index must retrieve it — an identical vector always
  // shares its original's LSH code (every segment collides) and its
  // nearest centroid cell (nProbe = 1, the maximally approximate IVF
  // regime). Recall is computed by joining the approximate top-1 to the
  // exact top-1, not assumed, and is deterministically 1.0 at every
  // scale factor. Unplanted recall (data-dependent, not pinnable) stays
  // property-gated in SimilaritySpec / IvfSpec.
  def extAnnRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val probes = emb.filter(col("vec_id") < 10).limit(10) // key-range: =10 rows; structural cap for the plan gate
      .select((col("vec_id") + lit(1000000L)).as("vec_id"), col("embedding"))
    val exact1 = Similarity.bruteForceTopK(emb, probes, k = 1)
      .select("probe_id", "vec_id")
    def recallOf(path: String, approx: DataFrame): DataFrame = {
      val hits = exact1.join(approx.select("probe_id", "vec_id"),
        Seq("probe_id", "vec_id"), "left_semi")
      exact1.agg(count(lit(1)).as("n_probes"))
        .crossJoin(hits.agg(count(lit(1)).as("hits")))
        .select(lit(path).as("path"), col("n_probes"), col("hits"),
          round(col("hits").cast("double") / col("n_probes"), 4).as("recall"))
    }
    recallOf("ivf_nprobe1",
        Ivf.topK(emb, probes, k = 1, kCentroids = 16, nProbe = 1, iters = 2))
      .unionAll(recallOf("lsh_16bit_r3",
        Similarity.lshTopK(emb, probes, dim = 64, k = 1)))
      .orderBy("path")
  }

  // ---- skew mitigation (E-13) --------------------------------------------
  // Salted equi-join (orders replicated over 8 salt buckets so a hot
  // orderkey spreads across reducers) feeding a two-level salted
  // aggregation. Both rewrites are semantics-preserving, so the result
  // hash-matches the plain join+groupBy oracle — that equivalence IS the
  // contract that makes the salted path safe at 100 TB Zipfian skew.
  def extSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_extendedprice"))
    val ord = t(s, dir, "orders").select("o_orderkey", "o_orderstatus")
    val joined = Skew.saltedJoin(li, ord, "o_orderkey", factor = 8)
    Skew.saltedSum(joined, "o_orderstatus", "l_extendedprice", factor = 8)
      .select(col("o_orderstatus"),
        round(col("sum_l_extendedprice"), 2).as("rev"))
      .orderBy("o_orderstatus")
  }

  // ---- text analysis ------------------------------------------------------
  def extLangId(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_guess"), col("lang"))
      .orderBy("doc_id")
      .limit(100)

  def extQuality(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityFeatures(t(s, dir, "documents"))
      .select("doc_id", "n_tokens", "mean_tok_len", "stop_ratio",
        "distinct_ratio", "alnum_ratio", "quality")
      .orderBy("doc_id")
      .limit(100)

  def extTokCount(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenCounts(t(s, dir, "documents"))
      .select(col("doc_id"), col("ws_tokens"),
        col("bpeish_tokens").cast("long").as("bpeish_tokens"), col("n_chars_m"))
      .orderBy("doc_id")
      .limit(100)

  // ---- chunking (E-23): overlapping token windows ------------------------
  // Pure projection (no shuffle); the oracle rebuilds the same windows
  // with DuckDB list slicing. Bounded to doc_id < 100 to keep the
  // oracle's output stable in size across SFs.
  def extChunk(s: SparkSession, dir: String): DataFrame =
    graft.text.Chunking.chunkDocs(
        t(s, dir, "documents").filter(col("doc_id") < 100),
        chunkSize = 40, overlap = 8)
      .orderBy("doc_id", "chunk_id")

  // ---- sequence packing (E-24): token-capacity bins ----------------------
  // Production path is the scalable two-phase prefix sum (no
  // single-partition stage); it is property-tested byte-identical to
  // the window form, and the DuckDB oracle runs the window formulation.
  def extPack(s: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokenCounts(t(s, dir, "documents"))
      .select(col("doc_id"), col("ws_tokens").as("n_tokens"))
    Packing.binSummary(Packing.packScalable(toks, capacity = 2048))
  }

  // ---- z-order clustering (E-26) -----------------------------------------
  // The Morton code both engines compute from the same rendered
  // arithmetic; the layout win (per-partition bounds tight in BOTH
  // dimensions) is measured in ZOrderSpec.
  def extZOrder(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_partkey"), col("l_suppkey"),
        ZOrder.zValue(col("l_partkey"), col("l_suppkey")).as("z"))
      .orderBy("z", "l_orderkey", "l_linenumber")
      .limit(100)

  // ---- deterministic sampling suite (E-20) -------------------------------
  // Exact-k uniform sample: order by sha256(key) — plans as
  // TakeOrderedAndProject, no global sort, reproducible on any engine.
  def extSampleK(s: SparkSession, dir: String): DataFrame =
    Sampling.exactK(t(s, dir, "customer"), col("c_custkey"), 20)
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")

  // Stratified cap: ≤3 customers per market segment, uniform within each
  // (the "cap documents per language/domain" pipeline op).
  def extStratified(s: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedK(t(s, dir, "customer"),
        col("c_mktsegment"), col("c_custkey"), 3)
      .select("c_mktsegment", "c_custkey")
      .orderBy("c_mktsegment", "c_custkey")

  // ---- winsorization (E-21): clip to the in-group [p05, p95] band --------
  def extWinsorize(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val q = o.groupBy(col("o_orderstatus").as("st"))
      .agg(expr("percentile(o_totalprice, 0.05)").as("p05"),
        expr("percentile(o_totalprice, 0.95)").as("p95"))
    o.join(broadcast(q), col("o_orderstatus") === col("st"))
      .filter(col("o_orderkey") < 2000)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(least(greatest(col("o_totalprice"), col("p05")), col("p95")), 2).as("w"))
      .orderBy("o_orderkey")
  }

  // ---- time-series resample + forward fill (E-19) ------------------------
  // Per-user hourly grid over each user's event span; the value at each
  // hour is the latest observation in that hour (deterministic pick by
  // ts desc, event_id desc), carried forward through empty hours.
  def extResample(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .filter(col("user_id") < 5)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("h"),
        col("value"), col("ts"), col("event_id"))
    val picked = Upsert.latestPerKey(
        ev.withColumn("__k", concat_ws("|", col("user_id"), col("h"))),
        "__k", Seq(col("ts"), col("event_id")))
      .select(col("user_id"), col("h"), col("value"))
    Resample.gridForwardFill(picked, "user_id", "h", "value",
        expr("interval 1 hour"))
      .select(col("user_id"), col("h"), round(col("value"), 2).as("v"))
      .orderBy("user_id", "h")
      .limit(200)
  }

  // ---- E-46 robust outlier detection (MAD z-score) -----------------------
  // Orders whose price deviates from the group median by more than
  // 3 robust standard deviations (1.4826·MAD ≈ σ under normality) —
  // the outlier flag that survives the outliers themselves, unlike
  // mean/stddev. Three aggregates; the per-group stats broadcast back.
  // Integer counts out, so float noise never reaches the hash.
  def extAnomaly(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val med = o.groupBy("o_orderstatus")
      .agg(expr("percentile(o_totalprice, 0.5)").as("med"))
    val mad = o.join(broadcast(med), "o_orderstatus")
      .groupBy("o_orderstatus")
      .agg(min("med").as("med"),
        expr("percentile(abs(o_totalprice - med), 0.5)").as("mad"))
    o.join(broadcast(mad), "o_orderstatus")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(when(abs(col("o_totalprice") - col("med")) >
          lit(3 * 1.4826) * col("mad"), 1L).otherwise(0L)).as("n_outliers"))
      .orderBy("o_orderstatus")
  }

  // ---- E-45 per-group distinctive terms (c-TF-IDF) -----------------------
  // Top-3 characteristic words per source group: tf within the group
  // weighted by ln(1 + n_groups/df_groups) — the class-based TF-IDF
  // corpus-exploration op. Rank runs on the ROUNDED score (both
  // engines), so float ulps never reorder; exact ties break by word.
  def extCtfidf(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val toks = docs.select(col("source"),
      explode(filter(split(col("text"), " "), t => t =!= "")).as("w"))
    val tf = toks.groupBy("source", "w").agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy("w").agg(count(lit(1)).as("dfs"))
    val ns = docs.agg(countDistinct("source").cast("double").as("n"))
    tf.join(broadcast(dfs), "w")
      .crossJoin(broadcast(ns))
      .withColumn("score", round(col("tf") * log(lit(1.0) + col("n") / col("dfs")), 4))
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy(desc("score"), asc("w"))))
      .filter(col("rk") <= 3)
      .select("source", "w", "score")
      .orderBy(asc("source"), desc("score"), asc("w"))
      .limit(60)
  }

  // ---- E-44 nearest-centroid classification eval -------------------------
  // The standard embedding-quality check: per-label mean vectors, assign
  // every vector to its nearest centroid (squared L2), emit the
  // confusion matrix. Distances are relational (dim explode + join on
  // dim + sum), so nothing materializes dense matrices; the centroid
  // table is labels×dims rows — broadcastable at any corpus size. Only
  // the integer counts are output, so float summation-order noise
  // (~1e-15, far below any real centroid gap) never reaches the hash.
  def extCentroidEval(s: SparkSession, dir: String): DataFrame = {
    val dims = t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("i", "x")))
      .withColumn("x", col("x").cast("double"))
    val cent = dims.groupBy(col("label").as("clabel"), col("i"))
      .agg(avg("x").as("cx"))
    val dist = dims.join(broadcast(cent), "i")
      .groupBy("vec_id", "label", "clabel")
      .agg(sum((col("x") - col("cx")) * (col("x") - col("cx"))).as("d2"))
    dist.groupBy("vec_id", "label")
      .agg(expr("min_by(clabel, d2)").as("assigned"))
      .groupBy("label", "assigned")
      .agg(count(lit(1)).as("n"))
      .orderBy("label", "assigned")
  }

  // ---- E-42 retention cohorts --------------------------------------------
  // Users cohorted by first-event day; per (cohort, day offset) distinct
  // active users — the standard retention triangle. Two aggregates and
  // one join of a per-user 1-row table back onto the scan.
  def extRetention(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select("user_id", "ts")
    val first = e.groupBy("user_id").agg(to_date(min("ts")).as("cohort"))
    e.join(first, "user_id")
      .select(col("cohort"),
        datediff(to_date(col("ts")), col("cohort")).cast("long").as("offs"),
        col("user_id"))
      .distinct()
      .groupBy("cohort", "offs")
      .agg(count(lit(1)).as("n"))
      .orderBy("cohort", "offs")
      .limit(100)
  }

  // ---- E-43 data-quality audit -------------------------------------------
  // Declarative expectations over orders, all folded into one aggregate
  // pass (ops.Expectations): key uniqueness, value ranges, domain
  // membership. The price_above_400k rule fires (~20% of rows) so the
  // report hash is non-trivial; the structural rules hold at zero.
  def extExpectations(s: SparkSession, dir: String): DataFrame = {
    import Expectations._
    Expectations.audit(t(s, dir, "orders"), Seq(
        UniqueRule("dup_orderkey", col("o_orderkey")),
        RowRule("nonpos_price", col("o_totalprice") <= 0),
        RowRule("null_date", col("o_orderdate").isNull),
        RowRule("bad_status", !col("o_orderstatus").isin("F", "O", "P")),
        RowRule("price_above_400k", col("o_totalprice") > 400000)))
      .orderBy("rule")
  }

  // ---- E-41 sequential conversion funnel ---------------------------------
  // view → click → purchase in strict event-time order, each step within
  // 6 hours of the previous: per user, the first view, the first
  // qualifying click AFTER it, the first qualifying purchase after THAT.
  // Three keyed aggregates, each joining one tiny (per-user, 1-row)
  // table back onto the events scan — broadcastable at any scale; nulls
  // mark funnel drop-off (left joins).
  def extFunnel(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select("user_id", "event_type", "ts")
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("tv"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("ts") > col("tv") &&
        col("ts") <= col("tv") + expr("interval 6 hours"))
      .groupBy("user_id").agg(min("ts").as("tc"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ts") > col("tc") &&
        col("ts") <= col("tc") + expr("interval 6 hours"))
      .groupBy("user_id").agg(min("ts").as("tp"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .orderBy("user_id")
      .limit(100)
  }

  // ---- E-40 text normalization -------------------------------------------
  // Casefold + accent fold + punctuation strip + whitespace collapse as
  // one codegen'd chain. The fixture corpus is plain ASCII, so the query
  // synthesizes a messy prefix (accents, case, punctuation, space runs)
  // around each doc's text — both engines build the identical dirty
  // input, then must normalize it identically.
  def extNormalize(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        TextAnalysis.normalize(
          concat(lit("  Héllo,,  Wörld! Ça và?  "),
            upper(substring(col("text"), 1, 60)))).as("norm"))
      .orderBy("doc_id")
      .limit(100)

  // ---- E-39 deterministic train/val/test split ---------------------------
  // Hash-range assignment (~80/10/10 on the first sha256 byte): stable
  // under reruns, partitioning and engine — the split a reproducible
  // training pipeline needs. Membership is provable per key; the oracle
  // recomputes the identical assignment.
  def extSplit(s: SparkSession, dir: String): DataFrame = {
    val b = conv(substring(sha2(col("c_custkey").cast("string"), 256), 1, 2),
      16, 10).cast("int")
    t(s, dir, "customer")
      .withColumn("split",
        when(b < 205, "train").when(b < 230, "val").otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n"), sum("c_custkey").as("key_sum"))
      .orderBy("split")
  }

  // ---- E-38 triangle counting --------------------------------------------
  // Cohesion over the part co-purchase graph: parts are adjacent when
  // they appear in the same order. Degree-oriented triple join counts
  // each triangle once and credits its 3 corners; top-20 by count.
  def extTriangles(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
    val edges = li.select(col("l_orderkey").as("o"), col("l_partkey").as("u"))
      .join(li.select(col("l_orderkey").as("o"), col("l_partkey").as("v")), "o")
      .filter(col("u") < col("v"))
      .select("u", "v")
      .distinct()
    // wedge-BOUNDED per-node counts (round 9): shuffle-hash streamed
    // wedges, ⌈W/256M⌉ eager slices — identical values to perNode, no
    // sort/spill cliff when W outgrows one pass (Triangles Scaladoc)
    Triangles.perNodeBounded(edges)
      .orderBy(desc("n_triangles"), asc("id"))
      .limit(20)
  }

  // ---- E-37 fuzzy string join (entity resolution) ------------------------
  // Distinct part names within edit distance 2 of each other (typo/
  // variant detection: 'cold anvil' ~ 'old anvil'). lev ≤ 2 implies
  // |len Δ| ≤ 2, so BandJoin's length blocking has exact recall and the
  // Levenshtein recheck runs only inside length bands — never the
  // quadratic all-pairs loop (the umbrella plan gate enforces it).
  def extFuzzyJoin(s: SparkSession, dir: String): DataFrame = {
    val names = t(s, dir, "part").select("p_name").distinct()
    BandJoin.joinWithin(
        names.select(col("p_name").as("na")), length(col("na")),
        names.select(col("p_name").as("nb")), length(col("nb")),
        width = 2,
        extra = col("na") < col("nb") &&
          levenshtein(col("na"), col("nb")).between(1, 2))
      .select(col("na"), col("nb"),
        levenshtein(col("na"), col("nb")).cast("long").as("d"))
      .orderBy("d", "na", "nb")
      .limit(50)
  }

  // ---- E-36 resample with linear interpolation ---------------------------
  // Same per-user hourly grid as ext_resample, but gap slots take the
  // time-weighted blend of the bracketing observations instead of the
  // carried-forward value; one-sided edges clamp to the neighbor.
  def extInterpolate(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .filter(col("user_id") < 5)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("h"),
        col("value"), col("ts"), col("event_id"))
    val picked = Upsert.latestPerKey(
        ev.withColumn("__k", concat_ws("|", col("user_id"), col("h"))),
        "__k", Seq(col("ts"), col("event_id")))
      .select(col("user_id"), col("h"), col("value"))
    Resample.gridInterpolate(picked, "user_id", "h", "value",
        expr("interval 1 hour"))
      .select(col("user_id"), col("h"), round(col("value"), 4).as("v"))
      .orderBy("user_id", "h")
      .limit(200)
  }

  // ---- unigram LM quality scoring (E-18) ---------------------------------
  def extLmScore(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramLogScore(t(s, dir, "documents"))
      .select(col("doc_id"), round(col("lm_score"), 4).as("lm_score"))
      .orderBy("doc_id")
      .limit(100)

  def extFingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.tokenSetFingerprint(col("text")).as("fp"))
      .orderBy("doc_id")
      .limit(50)

  // ---- generalized numeric band join (E-16) ------------------------------
  // Orders of the same customer priced within 1000 of each other, via
  // the bucket-expansion band join (equi-join on price bucket + exact
  // recheck — never a nested-loop). Counts pairs per customer.
  def extBandJoin(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val a = o.select(col("o_custkey").as("ck_a"), col("o_orderkey").as("ok_a"),
      col("o_totalprice").as("tp_a"))
    val b = o.select(col("o_custkey").as("ck_b"), col("o_orderkey").as("ok_b"),
      col("o_totalprice").as("tp_b"))
    BandJoin.joinWithin(a, col("tp_a"), b, col("tp_b"), 1000.0,
        col("ck_a") === col("ck_b") && col("ok_a") < col("ok_b"))
      .groupBy(col("ck_a"))
      .agg(count(lit(1)).as("np"))
      .select(col("ck_a").as("o_custkey"), col("np"))
      .orderBy("o_custkey")
      .limit(100)
  }

  // ---- equi-width histogram (E-17) ---------------------------------------
  def extHistogram(s: SparkSession, dir: String): DataFrame =
    Histogram.histogram(t(s, dir, "orders"), "o_totalprice",
      min = 0.0, max = 600000.0, nBuckets = 12)

  // ---- PII / boilerplate scrubbing (E-14) --------------------------------
  // The fixture corpus carries no URLs/e-mails, so the query injects a
  // deterministic synthetic prefix (doc_id-derived URL + e-mail + digits)
  // ahead of the real text — the scrub operator then has real work to do
  // and the oracle replays the identical construction in DuckDB.
  def extScrub(s: SparkSession, dir: String): DataFrame = {
    val noisy = concat(
      lit("contact user"), col("doc_id"), lit("@mail.example or "),
      lit("https://host.example/d/"), col("doc_id"), lit("?x=1 ref 42 "),
      substring(col("text"), 1, 60))
    t(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.scrub(noisy).as("scrubbed"))
      .orderBy("doc_id")
      .limit(100)
  }

  // ---- CDC upsert apply (E-15) -------------------------------------------
  // Latest event value per user (ordered by ts, tie-broken by the unique
  // event_id) applied onto the customer snapshot; unmatched customers
  // pass through. Window + left join — the engine-native MERGE.
  def extUpsert(s: SparkSession, dir: String): DataFrame =
    Upsert.applyLatest(
        t(s, dir, "customer"), "c_custkey", "c_acctbal",
        t(s, dir, "events").select("user_id", "ts", "event_id", "value"),
        "user_id", "value",
        ordering = Seq(col("ts"), col("event_id")),
        newValueName = "new_bal")
      .select(col("c_custkey"), round(col("c_acctbal"), 2).as("old_bal"),
        round(col("new_bal"), 2).as("new_bal"), col("updated"))
      .orderBy("c_custkey")
      .limit(100)

  // ---- multimodal plumbing (stub codec; schema/batching real) ------------
  def extMultimodal(s: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.Multimodal
    Multimodal.extractFeatures(
        Multimodal.syntheticFromText(t(s, dir, "documents")))
      .toDF()
      .select(col("media_id"), col("modality"), col("n_bytes"),
        col("frames_sampled").cast("long").as("frames_sampled"))
      .orderBy("media_id")
      .limit(100)
  }

  // ---- E-27 Bloom-filter pre-filtered join -------------------------------
  // The explicit semi-join reduction (ops.BloomJoin): lineitem is
  // filtered by a Bloom filter over the 1-URGENT order keys BEFORE its
  // shuffle, then the exact join removes false positives — result ≡ the
  // plain join, which is what the oracle pins. At 100 TB this shrinks
  // the fact shuffle to ~the 20% matching fraction (+ the false-positive
  // rate) for the cost of broadcasting a few MB of filter bits.
  def extBloomJoin(s: SparkSession, dir: String): DataFrame = {
    val urgent = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderdate")
    BloomJoin.join(
        t(s, dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount"),
        "l_orderkey", urgent, "o_orderkey", expectedItems = 1L << 20)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("rev"))
      .orderBy("yr")
  }

  // ---- E-28 BM25 relevance scoring ---------------------------------------
  // Both sides order by the ROUNDED score (then doc_id), so rank is
  // insensitive to sub-1e-4 float noise.
  private val bm25Terms = Seq("spark", "table", "hash")
  def extBm25(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bm25(t(s, dir, "documents"), bm25Terms)
      .select(col("doc_id"), round(col("bm25"), 4).as("bm25"))
      .orderBy(desc("bm25"), asc("doc_id"))
      .limit(50)

  // ---- E-29 int8 embedding quantization ----------------------------------
  // Codes are rendered as a comma-joined string (not an ARRAY column):
  // the driver's pandas canonicalizer cannot sort/hash numpy arrays, and a
  // scalar contract column is engine-portable. The typed Array[Byte]-shaped
  // API stays available via Quantize.quantize directly.
  def extQuantize(s: SparkSession, dir: String): DataFrame =
    Quantize.quantize(t(s, dir, "embeddings"))
      .select(col("vec_id"), round(col("scale"), 6).as("scale_r"),
        concat_ws(",", col("codes")).as("codes"))
      .orderBy("vec_id")
      .limit(50)

  // ---- E-30 bigram LM scoring --------------------------------------------
  def extLm2Score(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramLogScore(t(s, dir, "documents"))
      .select(col("doc_id"), round(col("lm2_score"), 4).as("lm2_score"))
      .orderBy("doc_id")
      .limit(100)

  // ---- E-31 corpus n-gram statistics -------------------------------------
  def extNgrams(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramCounts(t(s, dir, "documents"))
      .orderBy(desc("cnt"), asc("bg"))
      .limit(20)

  // ---- E-35 weighted sampling (A-Res, RNG-free) --------------------------
  // Price-weighted order sample: inclusion probability ∝ o_totalprice,
  // deterministic across engines because the uniform comes from
  // sha256(key) rather than an RNG. Output re-sorted by key so the hash
  // compare pins membership, not float rank order.
  def extWeightedSample(s: SparkSession, dir: String): DataFrame =
    Sampling.weightedK(t(s, dir, "orders"),
        col("o_orderkey"), col("o_totalprice"), k = 20)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("w"))
      .orderBy("o_orderkey")

  // ---- E-34 chunk-level (sub-document) dedup -----------------------------
  // Boilerplate detection: chunk every doc into non-overlapping 32-token
  // windows (text.Chunking, zero-shuffle projection), count how many of
  // each doc's chunks also appear elsewhere in the corpus. One chunk-hash
  // count shuffle + a broadcast-able join back — the same shape exact
  // dedup uses, one level below the document.
  def extChunkDedup(s: SparkSession, dir: String): DataFrame = {
    val chunks = graft.text.Chunking.chunkDocs(t(s, dir, "documents"), 32, 0)
      .select(col("doc_id"), col("chunk"))
    val counts = chunks.groupBy("chunk").agg(count(lit(1)).as("m"))
    chunks.join(counts, "chunk")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("m") > 1, 1).otherwise(0)).cast("long").as("n_dup_chunks"))
      .orderBy("doc_id")
      .limit(100)
  }

  // ---- E-33 containment near-dup (asymmetric) ----------------------------
  // Subset/quote duplication: pairs where ≥90% of the smaller doc's
  // token set appears in the larger one, within a 1.5× set-size band.
  // Production path = the canonical-set LSH pipeline at the implied
  // Jaccard lower bound; the oracle is the all-pairs formulation of the
  // same predicate.
  def extContainment(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentNearDups(t(s, dir, "documents"), "doc_id",
        Dedup.tokenSet(col("text")), tau = 0.9, sizeRatio = 1.5)
      .select(col("contained"), col("container"), round(col("cont"), 4).as("cont"))
      .orderBy(desc("cont"), asc("contained"), asc("container"))
      .limit(50)

  // ---- E-32 PageRank (fixed 3 iterations) --------------------------------
  // Authority scoring over the bidirected supplier–part shipment graph
  // (node ids prefixed — the S/P key ranges overlap). The oracle unrolls
  // the same 3 power iterations as chained CTEs; both sides order by the
  // ROUNDED score so rank ignores sub-1e-4 summation noise.
  def extPagerank(s: SparkSession, dir: String): DataFrame = {
    // long-encoded node ids (SpIds): the per-iteration contribution join
    // + sum shuffle key on longs; decode at the output boundary only
    val pairs = t(s, dir, "lineitem")
      .select(SpIds.s(col("l_suppkey")).as("sn"),
        SpIds.p(col("l_partkey")).as("pn"))
      .distinct()
    val edges = pairs.select(col("sn").as("src"), col("pn").as("dst"))
      .unionAll(pairs.select(col("pn").as("src"), col("sn").as("dst")))
    PageRank.run(edges, iterations = 3)
      .select(SpIds.decode(col("id")).as("id"), round(col("pr"), 4).as("pr"))
      .orderBy(desc("pr"), asc("id"))
      .limit(20)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_bloom_join" -> (extBloomJoin _),
    "ext_bm25" -> (extBm25 _),
    "ext_quantize" -> (extQuantize _),
    "ext_lm2_score" -> (extLm2Score _),
    "ext_ngrams" -> (extNgrams _),
    "ext_pagerank" -> (extPagerank _),
    "ext_containment" -> (extContainment _),
    "ext_chunk_dedup" -> (extChunkDedup _),
    "ext_weighted_sample" -> (extWeightedSample _),
    "ext_interpolate" -> (extInterpolate _),
    "ext_fuzzy_join" -> (extFuzzyJoin _),
    "ext_triangles" -> (extTriangles _),
    "ext_split" -> (extSplit _),
    "ext_normalize" -> (extNormalize _),
    "ext_funnel" -> (extFunnel _),
    "ext_retention" -> (extRetention _),
    "ext_expectations" -> (extExpectations _),
    "ext_centroid_eval" -> (extCentroidEval _),
    "ext_ctfidf" -> (extCtfidf _),
    "ext_anomaly" -> (extAnomaly _),
    "ext_dedup_exact" -> (extDedupExact _),
    "ext_minhash_neardup" -> (extMinhashNearDup _),
    "ext_simhash_neardup" -> (extSimhashNearDup _),
    "ext_ngram_neardup" -> (extNgramNearDup _),
    "ext_components" -> (extComponents _),
    "ext_chunk" -> (extChunk _),
    "ext_pack" -> (extPack _),
    "ext_zorder" -> (extZOrder _),
    "ext_embed_topk" -> (extEmbedTopK _),
    "ext_sim_pairs" -> (extSimPairs _),
    "ext_sim_pairs_allpairs" -> (extSimPairsAllPairs _),
    "ext_ivf_topk" -> (extIvfTopK _),
    // ext_ann_topk (multi-probe LSH) is intentionally NOT a driver row:
    // its candidate set is approximate by construction (r03 recorded 24
    // rows vs brute force's 25), so no exact oracle exists. Its driver
    // gate is ext_ann_recall (hash-green planted-probe recall = 1.0);
    // data-dependent recall stays property-gated in SimilaritySpec.
    "ext_ann_recall" -> (extAnnRecall _),
    "ext_salted_join" -> (extSaltedJoin _),
    "ext_langid" -> (extLangId _),
    "ext_quality" -> (extQuality _),
    "ext_tokcount" -> (extTokCount _),
    "ext_fingerprint" -> (extFingerprint _),
    "ext_lm_score" -> (extLmScore _),
    "ext_resample" -> (extResample _),
    "ext_sample_k" -> (extSampleK _),
    "ext_stratified" -> (extStratified _),
    "ext_winsorize" -> (extWinsorize _),
    "ext_scrub" -> (extScrub _),
    "ext_upsert" -> (extUpsert _),
    "ext_band_join" -> (extBandJoin _),
    "ext_histogram" -> (extHistogram _),
    "ext_multimodal" -> (extMultimodal _))

  // ---------------------------------------------------------------- oracle

  private val q24Sql = graft.queries.OracleSql.all("q24")

  private val embedTopKSql: String =
    """with e as (select vec_id, cast(embedding as double[]) v from embeddings),
      |p as (select vec_id probe_id, v pv from e where vec_id < 5),
      |sims as (select p.probe_id, e.vec_id,
      |  round(list_dot_product(e.v,p.pv)
      |    /(sqrt(list_dot_product(e.v,e.v))*sqrt(list_dot_product(p.pv,p.pv))),4) sim
      |  from e cross join p where e.vec_id <> p.probe_id),
      |ranked as (select probe_id, vec_id, sim,
      |  row_number() over (partition by probe_id order by sim desc, vec_id) rank from sims)
      |select probe_id, vec_id, sim, rank from ranked
      |where rank <= 5 order by probe_id, rank""".stripMargin

  private val simPairsSql: String =
    """with e as (select vec_id, cast(embedding as double[]) v from embeddings)
      |select a.vec_id id_a, b.vec_id id_b,
      |  round(list_dot_product(a.v,b.v)
      |    /(sqrt(list_dot_product(a.v,a.v))*sqrt(list_dot_product(b.v,b.v))),4) sim
      |from e a join e b on a.vec_id < b.vec_id
      |order by sim desc, id_a, id_b limit 50""".stripMargin

  private def langScoreSql(markers: Seq[String]): String =
    markers.map { m =>
      val escaped = m.replace("'", "''")
      s"(length(text)-length(replace(text,'$escaped','')))/${m.length}"
    }.mkString(" + ")

  private val langIdSql: String = {
    val scores = TextAnalysis.langMarkers.map { case (lang, ms) =>
      lang -> s"(${langScoreSql(ms)})"
    }
    val best = s"greatest(${scores.map(_._2).mkString(", ")})"
    val cases = scores.map { case (lang, s) =>
      s"when $s = best then '$lang'"
    }.mkString(" ")
    s"""with scored as (select doc_id, lang, text, $best best from documents)
       |select doc_id, case $cases end lang_guess, lang
       |from scored order by doc_id limit 100""".stripMargin
  }

  // Shared CTE prefix: clean token list + exploded bigram rows (the
  // zip-against-own-tail pairing, mirroring TextAnalysis.bigrams).
  private val bigramCte =
    """l as (select doc_id, list_filter(string_split(text,' '), w -> w <> '') tl
      |  from documents),
      |bg as (select doc_id, unnest(list_filter(list_transform(
      |    list_zip(tl, tl[2:]),
      |    p -> case when p[2] is null then null else p[1] || ' ' || p[2] end),
      |  v -> v is not null)) bg from l)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "ext_bloom_join" ->
      """select cast(year(o_orderdate) as bigint) yr, count(*) n,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) rev
        |from lineitem join orders on l_orderkey = o_orderkey
        |where o_orderpriority = '1-URGENT'
        |group by 1 order by 1""".stripMargin,

    "ext_bm25" ->
      """with toks as (select doc_id,
        |  unnest(list_filter(string_split(text,' '), w -> w <> '')) w from documents),
        |dl as (select doc_id, count(*) dl from toks group by doc_id),
        |corpus as (select count(*) n_docs, avg(dl) avgdl from dl),
        |tf as (select doc_id, w, count(*) tf from toks
        |  where w in ('spark','table','hash') group by doc_id, w),
        |dfreq as (select w, count(*) df from tf group by w)
        |select doc_id, round(sum(
        |  ln(1 + (n_docs - df + cast(0.5 as double)) / (df + cast(0.5 as double)))
        |  * (tf * (cast(1.2 as double) + 1))
        |  / (tf + cast(1.2 as double)
        |     * (cast(0.25 as double) + cast(0.75 as double) * dl / avgdl))), 4) bm25
        |from tf join dfreq using(w) join dl using(doc_id) cross join corpus
        |group by doc_id order by bm25 desc, doc_id limit 50""".stripMargin,

    "ext_quantize" ->
      """with e as (select vec_id, cast(embedding as double[]) v from embeddings),
        |s as (select vec_id, list_max(list_transform(v, x -> abs(x))) sc, v from e)
        |select vec_id, round(sc, 6) scale_r,
        |  coalesce(array_to_string(list_transform(v, x -> case when sc = 0 then 0
        |    else cast(greatest(-127.0, least(127.0, floor(x * 127 / sc + 0.5))) as int) end), ','), '') codes
        |from s order by vec_id limit 50""".stripMargin,

    "ext_lm2_score" ->
      s"""with $bigramCte,
        |c2 as (select bg, count(*) c2 from bg group by bg),
        |c1 as (select string_split(bg,' ')[1] w1, cast(sum(c2) as double) c1 from c2 group by 1)
        |select doc_id, round(avg(-ln(cast(c2 as double)/c1)), 4) lm2_score
        |from bg join c2 using(bg) join c1 on string_split(bg,' ')[1] = w1
        |group by doc_id order by doc_id limit 100""".stripMargin,

    "ext_ngrams" ->
      s"""with $bigramCte
        |select bg, count(*) cnt from bg
        |group by bg order by cnt desc, bg limit 20""".stripMargin,

    "ext_anomaly" ->
      """with m as (select o_orderstatus, quantile_cont(o_totalprice, 0.5) med
        |  from orders group by o_orderstatus),
        |md as (select o.o_orderstatus, min(med) med,
        |    quantile_cont(abs(o_totalprice - med), 0.5) mad
        |  from orders o join m using(o_orderstatus) group by o.o_orderstatus)
        |select o.o_orderstatus, count(*) n,
        |  cast(sum(case when abs(o_totalprice - med)
        |    > (cast(3 as double) * cast(1.4826 as double)) * mad
        |    then 1 else 0 end) as bigint) n_outliers
        |from orders o join md using(o_orderstatus)
        |group by o.o_orderstatus order by o.o_orderstatus""".stripMargin,

    "ext_ctfidf" ->
      """with toks as (select source,
        |  unnest(list_filter(string_split(text,' '), w -> w <> '')) w from documents),
        |tf as (select source, w, count(*) tf from toks group by 1, 2),
        |df as (select w, count(*) dfs from tf group by w),
        |ns as (select cast(count(distinct source) as double) n from documents),
        |scored as (select source, w, round(tf * ln(1 + n / dfs), 4) score
        |  from tf join df using(w) cross join ns),
        |r as (select source, w, score,
        |  row_number() over (partition by source order by score desc, w) rk
        |  from scored)
        |select source, w, score from r where rk <= 3
        |order by source, score desc, w limit 60""".stripMargin,

    "ext_centroid_eval" ->
      """with dims as (select vec_id, label, cast(unnest(embedding) as double) x,
        |    generate_subscripts(embedding, 1) i from embeddings),
        |cent as (select label clabel, i, avg(x) cx from dims group by 1, 2),
        |dist as (select d.vec_id, d.label, c.clabel,
        |    sum((d.x - c.cx)*(d.x - c.cx)) d2
        |  from dims d join cent c using(i) group by 1, 2, 3),
        |assigned as (select vec_id, label, arg_min(clabel, d2) assigned
        |  from dist group by 1, 2)
        |select label, assigned, count(*) n from assigned
        |group by 1, 2 order by 1, 2""".stripMargin,

    "ext_retention" ->
      """with f as (select user_id, date_trunc('day', min(ts)) cohort
        |  from events group by 1),
        |a as (select distinct f.cohort,
        |    date_diff('day', f.cohort, date_trunc('day', e.ts)) offs, e.user_id
        |  from events e join f using(user_id))
        |select cast(cohort as date) cohort, cast(offs as bigint) offs, count(*) n
        |from a group by 1, 2 order by 1, 2 limit 100""".stripMargin,

    "ext_expectations" ->
      """with m as (select count(*) n,
        |  count(o_orderkey) - count(distinct o_orderkey) dup_orderkey,
        |  sum(case when o_totalprice <= 0 then 1 else 0 end) nonpos_price,
        |  sum(case when o_orderdate is null then 1 else 0 end) null_date,
        |  sum(case when o_orderstatus not in ('F','O','P') then 1 else 0 end) bad_status,
        |  sum(case when o_totalprice > 400000 then 1 else 0 end) price_above_400k
        |  from orders)
        |select "rule", cast(violations as bigint) violations, cast(n as bigint) n_rows from (
        |  select 'dup_orderkey' "rule", dup_orderkey violations, n from m
        |  union all select 'nonpos_price', nonpos_price, n from m
        |  union all select 'null_date', null_date, n from m
        |  union all select 'bad_status', bad_status, n from m
        |  union all select 'price_above_400k', price_above_400k, n from m)
        |order by "rule"""".stripMargin,

    "ext_funnel" ->
      """with v as (select user_id, min(ts) tv from events
        |  where event_type = 'view' group by 1),
        |c as (select e.user_id, min(e.ts) tc from events e join v using(user_id)
        |      where e.event_type = 'click' and e.ts > v.tv
        |        and e.ts <= v.tv + interval 6 hours group by 1),
        |p as (select e.user_id, min(e.ts) tp from events e join c using(user_id)
        |      where e.event_type = 'purchase' and e.ts > c.tc
        |        and e.ts <= c.tc + interval 6 hours group by 1)
        |select user_id, tv, tc, tp
        |from v left join c using(user_id) left join p using(user_id)
        |order by user_id limit 100""".stripMargin,

    "ext_normalize" ->
      """select doc_id, trim(regexp_replace(regexp_replace(
        |  translate(lower('  Héllo,,  Wörld! Ça và?  ' || upper(substr(text, 1, 60))),
        |    'àáâãäåèéêëìíîïòóôõöùúûüçñýÿ', 'aaaaaaeeeeiiiiooooouuuucnyy'),
        |  '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) norm
        |from documents order by doc_id limit 100""".stripMargin,

    "ext_split" ->
      """select split, count(*) n, cast(sum(c_custkey) as bigint) key_sum from (
        |  select c_custkey,
        |    case when ('0x' || substr(sha256(cast(c_custkey as varchar)), 1, 2))::int < 205
        |           then 'train'
        |         when ('0x' || substr(sha256(cast(c_custkey as varchar)), 1, 2))::int < 230
        |           then 'val'
        |         else 'test' end split
        |  from customer)
        |group by split order by split""".stripMargin,

    "ext_triangles" ->
      """with e0 as (select distinct a.l_partkey u, b.l_partkey v
        |  from lineitem a join lineitem b
        |  on a.l_orderkey = b.l_orderkey and a.l_partkey < b.l_partkey),
        |deg as (select k, count(*) d from
        |  (select u k from e0 union all select v from e0) group by k),
        |e as (select
        |    case when da.d < db.d or (da.d = db.d and u < v) then u else v end s,
        |    case when da.d < db.d or (da.d = db.d and u < v) then v else u end t
        |  from e0 join deg da on da.k = u join deg db on db.k = v),
        |tri as (select e1.s a, e1.t b, e2.t c
        |  from e e1 join e e2 on e1.t = e2.s
        |  join e e3 on e3.s = e1.s and e3.t = e2.t),
        |corners as (select unnest([a, b, c]) id from tri)
        |select id, count(*) n_triangles from corners
        |group by id order by n_triangles desc, id limit 20""".stripMargin,

    "ext_fuzzy_join" ->
      """with p as (select distinct p_name from part)
        |select a.p_name na, b.p_name nb,
        |  cast(levenshtein(a.p_name, b.p_name) as bigint) d
        |from p a join p b on a.p_name < b.p_name
        |  and abs(length(a.p_name) - length(b.p_name)) <= 2
        |where levenshtein(a.p_name, b.p_name) between 1 and 2
        |order by d, na, nb limit 50""".stripMargin,

    "ext_interpolate" ->
      """with ev as (select user_id, date_trunc('hour', ts) h, value, ts, event_id
        |  from events where user_id < 5),
        |obs as (select user_id, h, value from (
        |  select user_id, h, value,
        |    row_number() over (partition by user_id, h order by ts desc, event_id desc) rn
        |  from ev) where rn = 1),
        |bounds as (select user_id, min(h) lo, max(h) hi from ev group by user_id),
        |grid as (select user_id, unnest(generate_series(lo, hi, interval 1 hour)) h from bounds),
        |j as (select g.user_id, g.h, o.value v, epoch(g.h) t from grid g
        |      left join obs o on o.user_id = g.user_id and o.h = g.h),
        |w as (select user_id, h, t, v,
        |  last_value(v ignore nulls) over (partition by user_id order by h
        |    rows between unbounded preceding and current row) pv,
        |  last_value(case when v is not null then t end ignore nulls)
        |    over (partition by user_id order by h
        |    rows between unbounded preceding and current row) pt,
        |  first_value(v ignore nulls) over (partition by user_id order by h
        |    rows between current row and unbounded following) nv,
        |  first_value(case when v is not null then t end ignore nulls)
        |    over (partition by user_id order by h
        |    rows between current row and unbounded following) nt
        |  from j)
        |select user_id, h, round(case when pv is null then nv
        |  when nv is null then pv
        |  when nt = pt then pv
        |  else pv + (nv - pv) * (t - pt) / (nt - pt) end, 4) v
        |from w order by user_id, h limit 200""".stripMargin,

    "ext_weighted_sample" ->
      """select o_orderkey, round(o_totalprice, 2) w from (
        |  select o_orderkey, o_totalprice,
        |    ln(((('0x' || substr(sha256(cast(o_orderkey as varchar)), 1, 15))::bigint)
        |        + cast(0.5 as double)) / 1152921504606846976.0) / o_totalprice wk
        |  from orders order by wk desc limit 20)
        |order by o_orderkey""".stripMargin,

    "ext_chunk_dedup" ->
      """with d as (select doc_id, string_split(text,' ') toks from documents),
        |c as (select doc_id, len(toks) n,
        |  case when len(toks) <= 32 then 1
        |       else cast(floor((len(toks) - 32 + 31)::double / 32) as int) + 1 end nc,
        |  toks from d),
        |x as (select doc_id, unnest(generate_series(0, nc-1)) cid, toks from c),
        |ch as (select doc_id,
        |  array_to_string(list_slice(toks, cid*32+1, cid*32+32), ' ') chunk from x),
        |cnt as (select chunk, count(*) m from ch group by chunk)
        |select doc_id, count(*) n_chunks,
        |  cast(sum(case when m > 1 then 1 else 0 end) as bigint) n_dup_chunks
        |from ch join cnt using(chunk)
        |group by doc_id order by doc_id limit 100""".stripMargin,

    "ext_containment" ->
      """with t as (select doc_id,
        |    list_distinct(list_filter(string_split(text,' '), w -> w <> '')) s
        |  from documents),
        |p as (select a.doc_id ia, b.doc_id ib, a.s sa, b.s sb, len(a.s) na, len(b.s) nb
        |      from t a join t b on a.doc_id <> b.doc_id
        |      where len(a.s) <= len(b.s)
        |        and (len(a.s) < len(b.s) or a.doc_id < b.doc_id)
        |        and len(b.s) <= 1.5 * len(a.s))
        |select ia contained, ib container,
        |  round(cast(len(list_intersect(sa,sb)) as double)/na, 4) cont
        |from p
        |where cast(len(list_intersect(sa,sb)) as double)/na >= cast(0.9 as double)
        |order by cont desc, contained, container limit 50""".stripMargin,

    "ext_pagerank" ->
      """with pairs as (select distinct 'S' || l_suppkey sn, 'P' || l_partkey pn
        |  from lineitem),
        |edges as (select sn src, pn dst from pairs
        |          union all select pn, sn from pairs),
        |nodes as (select distinct src id from edges),
        |outdeg as (select src, count(*) d from edges group by src),
        |p0 as (select id, cast(1.0 as double) pr from nodes),
        |p1 as (select n.id, cast(0.15 as double) + cast(0.85 as double)
        |         * coalesce(sum(p.pr / o.d), 0) pr
        |       from nodes n left join edges e on e.dst = n.id
        |       left join p0 p on p.id = e.src left join outdeg o on o.src = e.src
        |       group by n.id),
        |p2 as (select n.id, cast(0.15 as double) + cast(0.85 as double)
        |         * coalesce(sum(p.pr / o.d), 0) pr
        |       from nodes n left join edges e on e.dst = n.id
        |       left join p1 p on p.id = e.src left join outdeg o on o.src = e.src
        |       group by n.id),
        |p3 as (select n.id, cast(0.15 as double) + cast(0.85 as double)
        |         * coalesce(sum(p.pr / o.d), 0) pr
        |       from nodes n left join edges e on e.dst = n.id
        |       left join p2 p on p.id = e.src left join outdeg o on o.src = e.src
        |       group by n.id)
        |select id, round(pr, 4) pr from p3
        |order by pr desc, id limit 20""".stripMargin,

    "ext_dedup_exact" ->
      """with h as (select doc_id, sha256(text) h from documents),
        |k as (select h, min(doc_id) keeper, count(*) group_size from h group by h)
        |select doc_id, keeper, doc_id<>keeper is_dup, group_size
        |from h join k using(h) order by doc_id limit 50""".stripMargin,

    "ext_minhash_neardup" -> q24Sql,

    // SimHash candidate recall is genuinely approximate, so the exact
    // all-pairs Jaccard graph cannot gate it; instead the oracle
    // RECOMPUTES the portable fingerprints (sha256-derived 60-bit token
    // hashes, same bit-vote spec) and replays the identical pipeline:
    // Hamming<=12 candidates -> exact-Jaccard recheck -> ranked pairs.
    "ext_simhash_neardup" ->
      """with tok as (select doc_id, t, count(*) tf from (
        |    select doc_id, unnest(list_filter(string_split(text,' '), x -> x <> '')) t
        |    from documents) group by doc_id, t),
        |th as (select doc_id, tf, ('0x' || substr(sha256(t),1,15))::bigint h from tok),
        |bits as (select doc_id, k, sum(tf * (((h >> k) & 1) * 2 - 1)) v
        |  from th cross join (select unnest(generate_series(0,59)) k) ks
        |  group by doc_id, k),
        |fp as (select doc_id, cast(sum(case when v > 0 then 1::bigint << k else 0 end) as bigint) f
        |  from bits group by doc_id),
        |t as (select doc_id, list_distinct(string_split(text,' ')) s,
        |  len(string_split(text,' ')) n from documents),
        |cand as (select a.doc_id da, b.doc_id db, a.s sa, b.s sb
        |  from t a join t b on a.doc_id < b.doc_id and abs(a.n - b.n) <= 1
        |    and (a.n >= 30 or b.n >= 30)
        |  join fp fa on fa.doc_id = a.doc_id
        |  join fp fb on fb.doc_id = b.doc_id
        |  where bit_count(xor(fa.f, fb.f)) <= 12)
        |select da, db, round(cast(len(list_intersect(sa,sb)) as double)
        |    /len(list_distinct(list_concat(sa,sb))),4) jac
        |from cand
        |where cast(len(list_intersect(sa,sb)) as double)
        |    /len(list_distinct(list_concat(sa,sb))) >= 0.5
        |order by jac desc, da, db limit 50""".stripMargin,

    "ext_ngram_neardup" ->
      """with d as (select doc_id,
        |  list_distinct(case when len(string_split(text,' ')) >= 3
        |    then list_transform(generate_series(1, len(string_split(text,' '))-2),
        |      i -> string_split(text,' ')[i]||' '||string_split(text,' ')[i+1]||' '||string_split(text,' ')[i+2])
        |    else [] end) g,
        |  len(string_split(text,' ')) n from documents)
        |select a.doc_id da, b.doc_id db,
        |  round(cast(len(list_intersect(a.g,b.g)) as double)/len(list_distinct(list_concat(a.g,b.g))),4) jac3
        |from d a join d b on a.doc_id < b.doc_id and abs(a.n-b.n)<=1
        |where len(a.g)>0 and len(b.g)>0
        |  and cast(len(list_intersect(a.g,b.g)) as double)/len(list_distinct(list_concat(a.g,b.g))) >= 0.4
        |order by jac3 desc, da, db limit 50""".stripMargin,

    // Exact clusters from the all-pairs tau=0.5 Jaccard graph: the
    // recursive CTE is the transitive closure, component = min reachable
    // id (including self via the symmetric edge set).
    "ext_components" ->
      """with recursive d as (select doc_id, list_distinct(string_split(text,' ')) s
        |  from documents where doc_id < 1000),
        |pairs as (select a.doc_id u, b.doc_id v from d a join d b on a.doc_id < b.doc_id
        |  where len(a.s) > 0 and len(b.s) > 0
        |    and cast(len(list_intersect(a.s,b.s)) as double)
        |        / len(list_distinct(list_concat(a.s,b.s))) >= 0.5),
        |edges as (select u, v from pairs union select v, u from pairs),
        |r(a, b) as (select u, v from edges
        |  union
        |  select r.a, e.v from r join edges e on r.b = e.u)
        |select a doc_id, least(a, min(b)) component
        |from r group by a order by doc_id""".stripMargin,

    // Same overlapping windows (chunkSize=40, overlap=8 -> stride=32)
    // rebuilt with DuckDB list slicing.
    "ext_chunk" ->
      """with d as (select doc_id, string_split(text,' ') toks from documents
        |  where doc_id < 100),
        |c as (select doc_id, toks, len(toks) n,
        |  case when len(toks) <= 40 then 1
        |       else cast(floor((len(toks) - 40 + 31)::double / 32) as int) + 1 end nc
        |  from d),
        |x as (select doc_id, toks, n, unnest(generate_series(0, nc - 1)) chunk_id from c)
        |select doc_id, cast(chunk_id as bigint) chunk_id,
        |  cast(least(n - chunk_id*32, 40) as bigint) chunk_tokens,
        |  array_to_string(list_slice(toks, chunk_id*32 + 1, chunk_id*32 + 40), ' ') chunk
        |from x order by doc_id, chunk_id""".stripMargin,

    // Window-cumsum formulation of linear packing at capacity 2048.
    "ext_pack" ->
      """with d as (select doc_id,
        |  cast(len(list_filter(string_split(text,' '), t -> t <> '')) as bigint) n
        |  from documents),
        |c as (select doc_id, n, coalesce(sum(n) over (order by doc_id
        |  rows between unbounded preceding and 1 preceding), 0) cb from d)
        |select cast(cb // 2048 as bigint) bin, count(*) n_docs,
        |  cast(sum(n) as bigint) bin_tokens,
        |  min(doc_id) first_doc, max(doc_id) last_doc
        |from c group by 1 order by 1""".stripMargin,

    "ext_zorder" ->
      s"""select l_orderkey, cast(l_linenumber as bigint) l_linenumber,
         |  l_partkey, l_suppkey,
         |  ${ZOrder.zValueSql("l_partkey", "l_suppkey")} z
         |from lineitem order by z, l_orderkey, l_linenumber limit 100""".stripMargin,

    "ext_embed_topk" -> embedTopKSql,

    "ext_sim_pairs" -> simPairsSql,
    "ext_sim_pairs_allpairs" -> simPairsSql,

    "ext_ivf_topk" -> embedTopKSql,
    // ext_ann_topk is not a driver row (approximate; its gate is
    // ext_ann_recall — see the query's comment).

    // Pinned planted-probe recall contract: both ANN paths must achieve
    // measured recall 1.0 on exact-copy probes (see extAnnRecall's
    // scaladoc for why this is deterministic at every scale factor).
    "ext_ann_recall" ->
      """select * from (values
        |  ('ivf_nprobe1',  cast(10 as bigint), cast(10 as bigint), cast(1.0 as double)),
        |  ('lsh_16bit_r3', cast(10 as bigint), cast(10 as bigint), cast(1.0 as double)))
        |  t(path, n_probes, hits, recall)
        |order by path""".stripMargin,

    "ext_salted_join" ->
      """select o_orderstatus, round(sum(l_extendedprice),2) rev
        |from lineitem join orders on l_orderkey=o_orderkey
        |group by o_orderstatus order by o_orderstatus""".stripMargin,

    "ext_langid" -> langIdSql,

    "ext_quality" ->
      """with f as (select doc_id,
        |  cast(len(list_filter(string_split(text,' '), t -> t <> '')) as double) nt,
        |  cast(len(list_filter(string_split(text,' '),
        |    t -> t in ('the','a','of','and','to','in','is','on','for','with'))) as double) nstop,
        |  cast(len(list_distinct(list_filter(string_split(text,' '), t -> t <> ''))) as double) nd,
        |  cast(length(text) as double) nc,
        |  cast(length(regexp_replace(text, '[^a-z0-9]', '', 'g')) as double) nalnum
        |  from documents)
        |select doc_id, cast(nt as bigint) n_tokens,
        |  round(case when nt > 0 then (nc - (nt - 1)) / nt else 0 end, 4) mean_tok_len,
        |  round(case when nt > 0 then nstop / nt else 0 end, 4) stop_ratio,
        |  round(case when nt > 0 then nd / nt else 0 end, 4) distinct_ratio,
        |  round(case when nc > 0 then nalnum / nc else 0 end, 4) alnum_ratio,
        |  round(case when nt > 0 then
        |    least(cast(1.0 as double), nt / cast(100.0 as double)) * cast(0.4 as double)
        |    + (nd / nt) * cast(0.3 as double)
        |    + (cast(1.0 as double) - nstop / nt) * cast(0.2 as double)
        |    + (case when nc > 0 then nalnum / nc else 0 end) * cast(0.1 as double)
        |  else 0 end, 4) quality
        |from f order by doc_id limit 100""".stripMargin,

    "ext_tokcount" ->
      """select doc_id,
        |  len(list_filter(string_split(text,' '), t -> t <> '')) ws_tokens,
        |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) bpeish_tokens,
        |  length(text) n_chars_m
        |from documents order by doc_id limit 100""".stripMargin,

    "ext_fingerprint" ->
      """select doc_id,
        |  sha256(array_to_string(list_sort(list_distinct(
        |    list_filter(string_split(text,' '), t -> t <> ''))),' ')) fp
        |from documents order by doc_id limit 50""".stripMargin,

    "ext_scrub" ->
      """select doc_id, regexp_replace(regexp_replace(regexp_replace(
        |  'contact user'||doc_id||'@mail.example or https://host.example/d/'||doc_id||'?x=1 ref 42 '||substr(text,1,60),
        |  'https?://\S+', '<URL>', 'g'),
        |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
        |  '[0-9]+', '<NUM>', 'g') scrubbed
        |from documents order by doc_id limit 100""".stripMargin,

    "ext_sample_k" ->
      """select c_custkey, c_mktsegment from (
        |  select c_custkey, c_mktsegment from customer
        |  order by sha256(cast(c_custkey as varchar)), c_custkey limit 20)
        |order by c_custkey""".stripMargin,

    "ext_stratified" ->
      """select c_mktsegment, c_custkey from (
        |  select c_mktsegment, c_custkey,
        |    row_number() over (partition by c_mktsegment
        |      order by sha256(cast(c_custkey as varchar)), c_custkey) rn
        |  from customer) where rn <= 3
        |order by c_mktsegment, c_custkey""".stripMargin,

    "ext_winsorize" ->
      """with q as (select o_orderstatus st, quantile_cont(o_totalprice, 0.05) p05,
        |  quantile_cont(o_totalprice, 0.95) p95 from orders group by o_orderstatus)
        |select o_orderkey, o_orderstatus,
        |  round(least(greatest(o_totalprice, p05), p95), 2) w
        |from orders join q on o_orderstatus = st
        |where o_orderkey < 2000 order by o_orderkey""".stripMargin,

    "ext_resample" ->
      """with ev as (select user_id, date_trunc('hour', ts) h, value, ts, event_id
        |  from events where user_id < 5),
        |obs as (select user_id, h, value from (
        |  select user_id, h, value,
        |    row_number() over (partition by user_id, h order by ts desc, event_id desc) rn
        |  from ev) where rn = 1),
        |bounds as (select user_id, min(h) lo, max(h) hi from ev group by user_id),
        |grid as (select user_id, unnest(generate_series(lo, hi, interval 1 hour)) h from bounds),
        |filled as (select g.user_id, g.h,
        |  last_value(o.value ignore nulls) over (
        |    partition by g.user_id order by g.h rows between unbounded preceding and current row) v
        |  from grid g left join obs o on o.user_id = g.user_id and o.h = g.h)
        |select user_id, h, round(v, 2) v from filled
        |order by user_id, h limit 200""".stripMargin,

    "ext_lm_score" ->
      """with toks as (select doc_id, unnest(string_split(text,' ')) w from documents),
        |tk as (select doc_id, w from toks where w <> ''),
        |cnt as (select w, count(*) c from tk group by w),
        |tot as (select cast(sum(c) as double) n from cnt)
        |select doc_id, round(avg(-ln(cast(c as double)/n)), 4) lm_score
        |from tk join cnt using(w) cross join tot
        |group by doc_id order by doc_id limit 100""".stripMargin,

    "ext_band_join" ->
      """select a.o_custkey, count(*) np
        |from orders a join orders b on a.o_custkey=b.o_custkey
        | and a.o_orderkey < b.o_orderkey
        | and abs(a.o_totalprice - b.o_totalprice) <= 1000
        |group by a.o_custkey order by a.o_custkey limit 100""".stripMargin,

    "ext_histogram" ->
      """with b as (select least(12, greatest(1,
        |  cast(floor(o_totalprice / cast(50000.0 as double)) + 1 as bigint))) bucket
        |  from orders)
        |select bucket, round(cast((bucket-1)*50000 as double),4) lo,
        |  round(cast(bucket*50000 as double),4) hi, count(*) cnt
        |from b group by bucket order by bucket""".stripMargin,

    "ext_upsert" ->
      """with latest as (
        |  select user_id, value from (
        |    select user_id, value,
        |      row_number() over (partition by user_id order by ts desc, event_id desc) rn
        |    from events) where rn = 1)
        |select c_custkey, round(c_acctbal,2) old_bal,
        |  round(coalesce(value, c_acctbal),2) new_bal,
        |  value is not null updated
        |from customer left join latest on c_custkey = user_id
        |order by c_custkey limit 100""".stripMargin,

    "ext_multimodal" ->
      """select doc_id media_id,
        |  case when doc_id%3=0 then 'image' when doc_id%3=1 then 'audio'
        |       else 'video' end modality,
        |  strlen(text) n_bytes,
        |  least(8, greatest(1, strlen(text) // greatest(1, strlen(text)//8))) frames_sampled
        |from documents order by media_id limit 100""".stripMargin)
}
