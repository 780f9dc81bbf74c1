package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-training-data pipelines: exact
  * (content-hash), MinHash+LSH, SimHash, and n-gram Jaccard — all built
  * from codegen'd Spark built-ins (no UDFs in any hot path).
  *
  * Scale design (100 TB): exact dedup is a single hash-groupBy (one
  * shuffle, map-side combine). MinHash/SimHash signatures are computed
  * per-document in a single projection (no shuffle at all); LSH banding
  * turns the quadratic candidate-pair problem into a groupBy on
  * (band, band_hash) buckets, so shuffle volume is O(docs·bands) and the
  * only pairwise work happens inside buckets. The exact-Jaccard recheck
  * touches only candidate pairs. Nothing here ever materializes the full
  * doc×doc cross product — the band-join oracle formulations (Q24) are
  * the *spec*, not the production path.
  */
object Dedup {

  /** Distinct whitespace tokens of `textCol` (empties dropped). */
  def tokenSet(text: Column): Column =
    array_distinct(filter(split(text, " "), t => t =!= ""))

  // ---------------------------------------------------------------- exact

  /** Exact dedup by sha256 content hash: every doc gets the keeper
    * (minimum doc_id with identical text) and an is_dup flag.
    * One groupBy + one broadcast-able join back; at scale the join is a
    * shuffle on the hash — both sides pre-partitioned identically, so AQE
    * plans a co-located join.
    */
  def exactAssignKeepers(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val hashed = docs.select(col(idCol), sha2(col(textCol), 256).as("h"))
    val keepers = hashed.groupBy("h")
      .agg(min(idCol).as("keeper"), count(lit(1)).as("group_size"))
    hashed.join(keepers, "h")
      .select(col(idCol), col("keeper"),
        (col(idCol) =!= col("keeper")).as("is_dup"),
        col("group_size"))
  }

  // -------------------------------------------------------------- n-gram

  /** Token n-gram shingles (as space-joined strings); empty array when
    * the doc has fewer than n tokens.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k))): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  // ------------------------------------------------------------- MinHash

  /** k-function MinHash signature over a token array: element i is
    * min over tokens of xxhash64(i, token). Deterministic (seeded by the
    * function index), one projection, no shuffle.
    */
  def minhashSignature(tokens: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(tokens, t => xxhash64(i, t))))

  /** LSH candidate pairs from banded MinHash signatures.
    *
    * Signature of length bands·rowsPerBand is cut into bands; docs
    * sharing any (band_id, hash-of-band) bucket become a candidate pair.
    * Returns distinct (id_a < id_b) pairs. The self-join is on the
    * bucket key, so work is quadratic only within buckets (which are
    * small for any sane band geometry).
    */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
      bands: Int, rowsPerBand: Int): DataFrame =
    minhashCandidatesFromSets(docs, idCol, tokenSet(col(textCol)), bands, rowsPerBand)

  /** Same banding over an arbitrary element-set column (token sets,
    * shingle sets, …).
    *
    * Performance shape (each rule earned by a measured blowup at sf0.1):
    *  - each element is pre-hashed to a LONG once, so the numHashes
    *    minhash functions mix an 8-byte value instead of re-hashing the
    *    (possibly long) string numHashes times per element;
    *  - the full signature is computed by the native codegen'd
    *    minhash_signature expression (bit-equal to the composed
    *    transform/array_min form — property-tested), not numHashes
    *    interpreted HOF lambdas per document;
    *  - the (id, signature) projection is persisted before banding —
    *    the barrier stops CollapseProject from inlining the signature
    *    expression into every band (and once more per join side);
    *  - empty sets are dropped pre-banding: they can never pass any
    *    Jaccard >= tau > 0 recheck, and all-empty buckets would
    *    otherwise pair every empty doc with every other.
    */
  def minhashCandidatesFromSets(docs: DataFrame, idCol: String, setCol: Column,
      bands: Int, rowsPerBand: Int): DataFrame =
    minhashCandidatesFromHashedSets(docs, idCol,
      transform(setCol, e => xxhash64(e)), bands, rowsPerBand)

  /** Banded-row threshold past which the LSH self-join is materialized
    * EAGERLY with partitions scaled to the banded volume (rows/250k,
    * AQE coalescing off for those jobs). At m100 (500k distinct sets ×
    * 64 bands = 32M banded rows) the session's 32 partitions put ~1M
    * rows in every sort-merge partition on BOTH sides and the sorts
    * spill — measured 126–192 s; at 128 partitions (250k rows each)
    * the sorts stay in memory — measured 108 s. This is the
    * partitions-per-data knob a cluster turns automatically; one box
    * has to turn it here. Fixture-scale inputs stay on the lazy
    * single-plan path, unchanged.
    */
  private val PartitionScaleRows = 8000000L

  /** Live banded-row budget per join GROUP — the beyond-memory degrade:
    * past this, bands are processed in ⌈rows/target⌉ contiguous groups
    * (the Triangles wedge-slice discipline applied to signatures), each
    * eagerly materialized so only one group's shuffle is live; the
    * union of per-group candidates is set-equal to the single-join
    * result (a pair qualifies iff SOME band bucket matches — band
    * partitioning is exact). Groups re-scan the persisted signatures,
    * so they cost redundancy: measured at m100 via the env override,
    * G=4 ran 202 s vs the partition-scaled single join's 108 s — which
    * is why the default engages only PAST the partition-scaling fix's
    * reach (≈64M live rows ≈ 16 GiB of sort buffers at 256 partitions),
    * where a single join would thrash regardless of partition count.
    * `SPARK_GRAFT_LSH_TARGET` overrides (the cluster knob surface).
    */
  private val TargetBandedRows: Long = sys.env.get("SPARK_GRAFT_LSH_TARGET") match {
    case Some(s) =>
      // parse defensively: a malformed or non-positive override must fall
      // back with a warning, never throw ExceptionInInitializerError out
      // of this object (obscuring the cause) or divide-by-zero later
      scala.util.Try(s.trim.toLong).toOption.filter(_ > 0L).getOrElse {
        System.err.println(
          s"[graft] SPARK_GRAFT_LSH_TARGET='$s' invalid (want a positive long); using default 64000000")
        64000000L
      }
    case None => 64000000L
  }

  /** [[minhashCandidatesFromSets]] over a set whose elements are ALREADY
    * xxhash64-hashed to longs. Signatures are bit-identical to the
    * string-set form (the minhash is a min over the same multiset of
    * hashed values — element order never matters), so callers that
    * have a pre-hashed set (the canonical-group pipeline keeps one for
    * the recheck) skip re-hashing every element per document.
    */
  def minhashCandidatesFromHashedSets(docs: DataFrame, idCol: String,
      hsetCol: Column, bands: Int, rowsPerBand: Int,
      targetBandedRows: Long = TargetBandedRows): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val withSig = docs.select(col(idCol).as("id"), hsetCol.as("set_"))
      .filter(size(col("set_")) > 0)
      .select(col("id"), call_function("minhash_signature",
        col("set_"), lit(bands * rowsPerBand)).as("sig"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // band b hashes its own rowsPerBand signature slots — cheap
    // element_at reads against the cached signature
    def pairsForBands(lo: Int, hi: Int): DataFrame = {
      val bandedExpr = transform(sequence(lit(lo), lit(hi - 1)), b =>
        struct(b.as("band"),
          xxhash64((0 until rowsPerBand).map(r0 =>
            element_at(col("sig"), b * rowsPerBand + lit(r0) + 1)): _*).as("bh")))
      val banded = withSig
        .select(col("id"), explode(bandedExpr).as("bucket"))
        .select(col("id"), col("bucket.band"), col("bucket.bh"))
      val a = banded.as("a"); val b = banded.as("b")
      a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
    }
    val spark = docs.sparkSession
    val nSets = withSig.count()
    val bandedRows = nSets * bands
    // overflow-safe ceiling division: the additive form
    // (bandedRows + target - 1) / target wraps when target is near
    // Long.MaxValue (DedupSpec's single-join arm passes exactly that)
    val groups = math.min(bands.toLong,
      if (bandedRows <= targetBandedRows) 1L
      else 1L + (bandedRows - 1) / targetBandedRows).toInt
    val minParts = spark.conf.getOption("spark.sql.shuffle.partitions")
      .fold(32)(_.toInt)
    val liveRows = bandedRows / groups
    val scaleConfs: Seq[(String, String)] =
      if (liveRows <= PartitionScaleRows) Seq.empty
      else Seq(
        "spark.sql.shuffle.partitions" ->
          math.max(minParts, (liveRows / 250000L).toInt).toString,
        "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    // Both paths materialize eagerly (localCheckpoint: RDD blocks, cleaned
    // by the ContextCleaner once unreachable — unlike a CacheManager entry)
    // so withSig can be unpersisted symmetrically; without this the lazy
    // path leaked one cached signature frame per call and re-ran the
    // banded join per downstream consumer.
    val out =
      if (groups == 1 && scaleConfs.isEmpty) pairsForBands(0, bands).localCheckpoint()
      else Plans.withConf(spark, scaleConfs: _*) {
        // contiguous band ranges, processed EAGERLY one at a time so only
        // one group's banded shuffle is live; per-group pairs are ≤ the
        // true candidate set, so the partials are output-sized
        val cuts = (0 to groups).map(g => (g.toLong * bands / groups).toInt)
        val parts = (0 until groups).map { g =>
          val p = pairsForBands(cuts(g), cuts(g + 1))
            .persist(StorageLevel.MEMORY_AND_DISK)
          p.count()
          p
        }
        val merged = (if (groups == 1) parts.head
          else parts.reduce(_ unionAll _).distinct())
          .localCheckpoint()
        parts.foreach(_.unpersist(blocking = false))
        merged
      }
    withSig.unpersist(blocking = false)
    out
  }

  /** MinHash-LSH near-dup pairs with exact-Jaccard recheck: candidates
    * from [[minhashCandidates]], verified against the true token-set
    * Jaccard ≥ `threshold`. With sane band geometry this equals the
    * exact all-pairs result (recall property-tested), at a fraction of
    * the cost: O(docs·bands) shuffle instead of O(docs²) join.
    */
  def minhashNearDups(docs: DataFrame, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text",
      bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val cands = minhashCandidates(docs, idCol, textCol, bands, rowsPerBand)
    val sets = docs.select(col(idCol).as("id"), tokenSet(col(textCol)).as("s"))
    cands
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("s", "sa"), "id_a")
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("s", "sb"), "id_b")
      .withColumn("jac", jaccard(col("sa"), col("sb")))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), col("jac"))
  }

  /** Near-dup pairs (id_a < id_b, jac) at `threshold` over an arbitrary
    * set column — the full production pipeline:
    *
    *  1. canonicalize: group ids by their (sorted) set — identical sets
    *     collapse to ONE representative, so LSH never joins a clique of
    *     exact duplicates (with a small vocabulary thousands of docs
    *     share a set; banding them directly is quadratic in the clique);
    *  2. MinHash-LSH banding over DISTINCT sets only;
    *  3. exact Jaccard computed once per candidate SET pair;
    *  4. expansion back to element pairs: qualifying cross-set pairs get
    *     the set-pair's jac; intra-group pairs are exact duplicates
    *     (jac = 1.0 by construction).
    *
    * Work is O(distinct_sets · bands) shuffle + output size — the
    * expansion is bounded by the true result, which no exact-recall
    * implementation can avoid.
    */
  def minhashNearDupPairsFromSets(docs: DataFrame, idCol: String, setCol: Column,
      threshold: Double, bands: Int, rowsPerBand: Int): DataFrame = {
    val (groups, setPairs) =
      setGroupsAndPairs(docs, idCol, setCol, threshold, bands, rowsPerBand)

    val cross = setPairs
      .join(groups.select(col("gid").as("ga"), col("ids").as("ids_a")), "ga")
      .join(groups.select(col("gid").as("gb"), col("ids").as("ids_b")), "gb")
      .select(explode(col("ids_a")).as("ia"), col("ids_b"), col("jac"))
      .select(col("ia"), explode(col("ids_b")).as("ib"), col("jac"))
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"), col("jac"))

    val intra = groups.filter(size(col("ids")) > 1)
      .select(explode(col("ids")).as("ia"), col("ids"))
      .select(col("ia"), explode(col("ids")).as("ib"))
      .filter(col("ia") < col("ib"))
      .select(col("ia").as("id_a"), col("ib").as("id_b"), lit(1.0).as("jac"))

    cross.unionAll(intra)
  }

  /** Containment near-dup pairs (E-33): ordered pairs (contained,
    * container) where |A∩B|/|A| ≥ `tau` for the smaller set A, within a
    * size band max(|A|,|B|) ≤ sizeRatio·min(|A|,|B|) — the asymmetric
    * metric that catches quote/subset duplication the symmetric Jaccard
    * paths miss (a short doc fully contained in a long one has LOW
    * Jaccard but containment 1.0).
    *
    * Rides the same canonical-set MinHash-LSH pipeline as
    * [[minhashNearDupPairsFromSets]]: within the size band, containment
    * ≥ τ implies jac ≥ τ/(1+r−τ) (worst case |B| = r·|A|, A∩B = τ|A|),
    * so banding at that lower Jaccard finds every qualifying pair; a
    * 0.999 margin on the prefilter keeps float noise at the exact
    * boundary from dropping a pair the exact recheck would keep. The
    * intersection SIZE is recovered exactly from the rechecked Jaccard
    * (|A∩B| = jac·(|A|+|B|)/(1+jac) is an integer; rounding removes the
    * float error), so the final containment is the same two-integer
    * division the oracle computes — no boundary disagreement.
    */
  def containmentNearDups(docs: DataFrame, idCol: String, setCol: Column,
      tau: Double, sizeRatio: Double = 1.5,
      bands: Int = 64, rowsPerBand: Int = 2): DataFrame = {
    val jacLower = tau / (1 + sizeRatio - tau) * 0.999
    val (groups, setPairs) =
      setGroupsAndPairs(docs, idCol, setCol, jacLower, bands, rowsPerBand)
    val sizes = groups.select(col("gid"), size(col("hset")).as("sz"), col("ids"))
    val cross = setPairs
      .join(sizes.select(col("gid").as("ga"), col("sz").as("na"),
        col("ids").as("ids_a")), "ga")
      .join(sizes.select(col("gid").as("gb"), col("sz").as("nb"),
        col("ids").as("ids_b")), "gb")
      .withColumn("inter", round(col("jac") * (col("na") + col("nb"))
        / (col("jac") + lit(1.0))).cast("long"))
      .withColumn("cont",
        col("inter").cast("double") / least(col("na"), col("nb")))
      .filter(col("cont") >= tau &&
        greatest(col("na"), col("nb")) <=
          lit(sizeRatio) * least(col("na"), col("nb")))
      // orient: ids of the SMALLER set are the contained side; equal
      // sizes orient per id pair (lower id = contained, matching the
      // all-pairs spec's tie rule)
      .select(
        explode(when(col("na") <= col("nb"), col("ids_a"))
          .otherwise(col("ids_b"))).as("ismall"),
        when(col("na") <= col("nb"), col("ids_b"))
          .otherwise(col("ids_a")).as("big_ids"),
        col("cont"), (col("na") === col("nb")).as("eq"))
      .select(col("ismall"), explode(col("big_ids")).as("ibig"),
        col("cont"), col("eq"))
      .select(
        when(col("eq"), least(col("ismall"), col("ibig")))
          .otherwise(col("ismall")).as("contained"),
        when(col("eq"), greatest(col("ismall"), col("ibig")))
          .otherwise(col("ibig")).as("container"),
        col("cont"))
    // identical sets: containment 1.0 both ways → one row, lower id first
    val intra = groups.filter(size(col("ids")) > 1)
      .select(explode(col("ids")).as("ia"), col("ids"))
      .select(col("ia"), explode(col("ids")).as("ib"))
      .filter(col("ia") < col("ib"))
      .select(col("ia").as("contained"), col("ib").as("container"),
        lit(1.0).as("cont"))
    cross.unionAll(intra)
  }

  /** Shared stages 1-3 of the set-canonical near-dup pipeline: the
    * persisted (hset, ids, gid) group table and the qualifying
    * SET-level pairs (ga, gb, jac).
    *
    * hset: the set's elements hashed to longs and sorted — the group
    * KEY, the signature input, and the recheck input. Grouping on the
    * hashed-long array instead of the raw string array was measured
    * ~30% of the whole kernel's wall at mult=100 (500k docs): the
    * canonicalize shuffle carries 8-byte elements instead of shingle
    * strings and compares long arrays in the aggregation hash map.
    * Semantics are unchanged — signature minhashes mix element HASHES
    * either way (bit-identical output), and the recheck has always been
    * the native merge-walk sorted_long_jaccard over these hashes (equal
    * to string-set Jaccard, property-tested; string
    * array_intersect/array_union over millions of candidate pairs was
    * the measured recheck bottleneck at sf0.1) — so elementwise-hash
    * equality was already the pipeline's identity basis before the key
    * change.
    */
  private def setGroupsAndPairs(docs: DataFrame, idCol: String, setCol: Column,
      threshold: Double, bands: Int, rowsPerBand: Int): (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val groups = docs
      .select(col(idCol).as("id"),
        sort_array(transform(setCol, e => xxhash64(e))).as("hset"))
      .groupBy("hset")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .withColumn("gid", element_at(col("ids"), 1))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val setPairs = minhashCandidatesFromHashedSets(
        groups.select(col("gid"), col("hset")), "gid", col("hset"),
        bands, rowsPerBand)
      .join(groups.select(col("gid").as("id_a"), col("hset").as("sa")), "id_a")
      .join(groups.select(col("gid").as("id_b"), col("hset").as("sb")), "id_b")
      .withColumn("jac", call_function("sorted_long_jaccard", col("sa"), col("sb")))
      .filter(col("jac") >= threshold)
      .select(col("id_a").as("ga"), col("id_b").as("gb"), col("jac"))
    (groups, setPairs)
  }

  /** Near-dup CLUSTER assignment at `threshold`: (idCol, component) for
    * every document in a duplicate cluster of size >= 2, where component
    * = the minimum member id. Clustering runs on the SET-representative
    * graph — nodes are distinct token sets, never expanded member
    * pairs — and the member expansion happens exactly once at the end.
    *
    * Label equivalence to member-level clustering: gid is the minimum
    * member of its set, the set-graph component label is the minimum gid
    * in the component, and intra-set members are trivially mutual
    * near-dups (jac = 1.0), so min-gid = min member id of the whole
    * member-level cluster. With heavy duplication |set graph| <<
    * |member graph| (measured 7x funnel wall-time at sf0.1 when CC ran
    * on the ~9M expanded pairs; the set graph is thousands of nodes).
    */
  def nearDupComponents(docs: DataFrame, idCol: String, setCol: Column,
      threshold: Double, bands: Int = 64, rowsPerBand: Int = 2): DataFrame = {
    val (groups, setPairs) =
      setGroupsAndPairs(docs, idCol, setCol, threshold, bands, rowsPerBand)
    val edged = ConnectedComponents.components(
        setPairs.select(col("ga").as("src"), col("gb").as("dst")))
      .select(col("node").as("gid"), col("component"))
    // multi-member sets with no cross-set edge are a cluster on their own
    val lone = groups.filter(size(col("ids")) > 1)
      .select(col("gid"))
      .join(edged.select("gid"), Seq("gid"), "left_anti")
      .select(col("gid"), col("gid").as("component"))
    edged.unionAll(lone)
      .join(groups.select(col("gid"), col("ids")), "gid")
      .select(explode(col("ids")).as(idCol), col("component"))
  }

  // ------------------------------------------------------------- SimHash

  /** 64-bit SimHash over term frequencies: bit k of the fingerprint is
    * set iff Σ_tokens tf·(2·bit_k(xxhash64(token))−1) > 0.
    *
    * Implemented relationally: tokenize → per-doc term counts → explode
    * 64 bit positions → weighted vote sum per (doc, bit) → OR the bits.
    * Two shuffles on doc_id, both with map-side partial aggregation.
    */
  def simhash(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    simhashFrom(docs, idCol, textCol, xxhash64(col("t")), nBits = 64)

  /** Engine-portable SimHash (contract variant): the token hash is the
    * first 15 hex chars (60 bits, always positive) of sha256 — which
    * DuckDB computes identically (`('0x'||substr(sha256(t),1,15))::bigint`)
    * — fed through the same bit-vote formulation. Production
    * fingerprints use xxhash64 ([[simhash]]/[[simhashNative]]); this
    * variant exists so the driver's DuckDB oracle can recompute the
    * END-TO-END near-dup pipeline (fingerprint → Hamming candidates →
    * exact recheck) bit-for-bit, which no opaque-hash fingerprint allows.
    */
  def simhashPortable(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    simhashFrom(docs, idCol, textCol,
      conv(substring(sha2(col("t"), 256), 1, 15), 16, 10).cast("long"), nBits = 60)

  private def simhashFrom(docs: DataFrame, idCol: String, textCol: String,
      tokenHash: Column, nBits: Int): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(filter(split(col(textCol), " "), t => t =!= "")).as("t"))
      .groupBy(idCol, "t")
      .agg(count(lit(1)).as("tf"))
      .withColumn("th", tokenHash)
    // the nBits per-bit votes ride ONE grouped pass as nBits scalar sums
    // (map-side combinable), replacing the explode×nBits + two doc-keyed
    // shuffles of the first formulation: the shuffle now carries one
    // partial row of nBits longs per (doc, map partition) instead of
    // docs×tokens×nBits vote rows. Votes are the same exact integer
    // sums (order-independent), so fingerprints are bit-identical.
    val votes = (0 until nBits).map { k =>
      sum(col("tf") *
        (call_function("shiftright", col("th"), lit(k)).bitwiseAND(lit(1L))
          * 2 - 1)).as(s"graft_sh_v$k")
    }
    tf.groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol),
        (0 until nBits).map(k =>
          when(col(s"graft_sh_v$k") > 0, lit(1L << k)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Production SimHash: same fingerprints as [[simhash]] (bit-equality
    * property-tested), computed by the native codegen'd simhash64
    * expression as a pure per-row projection — NO shuffle, where the
    * relational spec formulation above shuffles docs×terms×64 rows
    * twice. Docs with no tokens are dropped, matching the relational
    * form (they produce no tf rows).
    */
  def simhashNative(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .select(col(idCol),
        filter(split(col(textCol), " "), t => t =!= "").as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col(idCol), call_function("simhash64", col("toks")).as("simhash"))
  }

  /** Pairs whose SimHash Hamming distance ≤ `maxHamming`, with exact
    * Jaccard attached for rechecking. The pair join here is all-pairs for
    * spec clarity; the scale path splits the 64-bit key into
    * (maxHamming+1) segments — by pigeonhole, any pair within the
    * distance shares at least one exact segment — and joins on segments
    * (same banding trick as MinHash-LSH).
    */
  def simhashNearDups(docs: DataFrame, maxHamming: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = simhash(docs, idCol, textCol)
    val sets = docs.select(col(idCol).as("id"), tokenSet(col(textCol)).as("s"))
    val withSets = sh.join(sets, sh(idCol) === sets("id")).drop("id")
    val a = withSets.as("a"); val b = withSets.as("b")
    a.join(b, col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("ham", bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))))
      .filter(col("ham") <= maxHamming)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        col("ham"), jaccard(col("a.s"), col("b.s")).as("jac"))
  }

  /** Scale formulation of SimHash candidate generation: segment join.
    * Any two keys within Hamming distance d share at least one of d+1
    * equal segments, so candidates come from a groupBy-sized equi-join
    * instead of an all-pairs cross product.
    */
  def simhashCandidatesSegmented(sh: DataFrame, maxHamming: Int,
      idCol: String = "doc_id"): DataFrame = {
    val nSeg = maxHamming + 1
    val segBits = 64 / nSeg
    val segs = sh.select(col(idCol).as("id"), col("simhash"),
      explode(transform(sequence(lit(0), lit(nSeg - 1)),
        s => struct(s.as("seg"),
          call_function("shiftright", col("simhash"), (s * segBits).cast("int"))
            .bitwiseAND(lit((1L << segBits) - 1)).as("sv")))).as("x"))
      .select(col("id"), col("simhash"), col("x.seg"), col("x.sv"))
    val a = segs.as("a"); val b = segs.as("b")
    a.join(b, col("a.seg") === col("b.seg") && col("a.sv") === col("b.sv") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("ham"))
      .distinct()
      .filter(col("ham") <= maxHamming)
  }
}
