package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting (E-38) — the third graph primitive
  * beside connected components and PageRank, and the standard
  * cohesion/spam signal over co-occurrence graphs.
  *
  * Algorithm: the classic degree orientation. Each undirected edge is
  * directed from its lower-(degree, id) endpoint to the higher, making
  * the graph a DAG in which every triangle appears as EXACTLY one
  * (e1: a→b, e2: b→c, e3: a→c) path-plus-closure — no post-dedup, no
  * 6× overcount. Orientation also bounds each node's out-degree by
  * O(√m) on any graph, which is what keeps the wedge join (e1 ⋈ e2)
  * from exploding on hubs — the reason this exact plan is the textbook
  * distributed formulation.
  *
  * Cost: one degree aggregate, then two equi-joins keyed on node ids
  * (wedge build + closure check) — all shuffle-partitionable, AQE
  * handles residual skew. Output is per-node triangle counts (each
  * triangle credits its 3 corners).
  */
object Triangles {

  /** Degree orientation: each undirected edge directed from its
    * lower-(degree, id) endpoint `s` to the higher `t`. Exposed so
    * scaling probes can measure the wedge count Σ_s d_out·(d_out−1)/2 —
    * the exact size of the e1 ⋈ e2 join below, the quantity that must
    * stay sub-quadratic for triangle work to survive a 100× scale-up.
    *
    * @param edges undirected edge list as (u, v) with u < v, distinct.
    */
  def orient(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("u").as("k"))
      .unionAll(edges.select(col("v").as("k")))
      .groupBy("k").agg(count(lit(1)).as("d"))
    edges
      .join(deg.select(col("k").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("k").as("v"), col("d").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("s"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("t"))
  }

  /** Every triangle exactly once as (a, b, c) in orientation order.
    *
    * @param edges undirected edge list as (u, v) with u < v, distinct.
    */
  def triangleList(edges: DataFrame): DataFrame = {
    val oriented = orient(edges)
    val e1 = oriented.select(col("s").as("a"), col("t").as("b"))
    val e2 = oriented.select(col("s").as("b"), col("t").as("c"))
    val e3 = oriented.select(col("s").as("a"), col("t").as("c"))
    e1.join(e2, "b").join(e3, Seq("a", "c"))
  }

  /** @param edges undirected edge list as (u, v) with u < v, distinct.
    * @return (id, n_triangles) for every node in ≥1 triangle.
    */
  def perNode(edges: DataFrame): DataFrame =
    triangleList(edges)
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))

  /** The 3-per-triangle edge credits as one explode — NOT a 3-branch
    * union of selects over the triangle list: DataFrame unions don't
    * reuse common subplans, so the union form physically re-runs the
    * W-row wedge join once per branch (measured 3.3× the census cost at
    * sf3). One explode = one triangle enumeration.
    */
  private[ops] def creditEdges(tri: DataFrame): DataFrame =
    tri.select(explode(array(
      struct(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v")),
      struct(least(col("b"), col("c")).as("u"),
        greatest(col("b"), col("c")).as("v")),
      struct(least(col("a"), col("c")).as("u"),
        greatest(col("a"), col("c")).as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))

  /** Per-edge triangle support — the k-truss building block: an edge's
    * support is the number of triangles it closes, and the (k)-truss is
    * the maximal subgraph where every edge has support ≥ k−2. Each
    * triangle from [[triangleList]] credits its three edges
    * (canonicalized back to u < v); edges in no triangle surface with
    * support 0 via the left join.
    *
    * @param edges undirected edge list as (u, v) with u < v, distinct.
    * @return (u, v, support) for EVERY input edge.
    */
  def edgeSupport(edges: DataFrame): DataFrame = {
    val tedges = creditEdges(triangleList(edges))
      .groupBy("u", "v").agg(count(lit(1)).as("sup"))
    edges.join(tedges, Seq("u", "v"), "left")
      .select(col("u"), col("v"), coalesce(col("sup"), lit(0L)).as("support"))
  }

  /** Build-map row budget per shuffle-hash task. The m100 wall (90M-edge
    * build side, 8 GiB heap): AQE's parallelism-first partition
    * coalescing re-fattens the per-task hash maps to m/32 rows ≈ 120 MB
    * × 32 concurrent tasks and the execution pool OOMs — raising
    * `spark.sql.shuffle.partitions` alone doesn't help because
    * coalescing re-targets the thread count (measured to fail at 256
    * partitions too). The fix is the pair scoped via [[joinConfs]]:
    * enough partitions that a build map holds ≤ this many rows, AND
    * coalescing OFF for those jobs so AQE cannot merge the maps fat
    * again (a small size-first advisory was tried first and measured
    * NONDETERMINISTIC at m100: the advisory meters serialized shuffle
    * bytes, ~4× smaller than the in-memory maps, so 8 MB targets still
    * produced ~1M-row builds that sat at the execution-pool edge).
    * 256k edge rows ≈ 10–20 MB hashed; × 32 tasks ≈ 0.5 GiB of
    * concurrent build memory at any heap.
    */
  private val BuildRowsPerTask = 256000L

  /** The scoped conf set for the wedge-slice jobs. EMPTY at fixture
    * scale (m ≤ budget × session partitions) so small graphs keep their
    * session plans — and their measured budgets — unchanged; past that,
    * partitions sized to the BUILD side and coalescing disabled.
    */
  private def joinConfs(m: Long, minParts: Int): Seq[(String, String)] =
    if (m <= BuildRowsPerTask * minParts) Seq.empty
    else Seq(
      "spark.sql.shuffle.partitions" ->
        ((m + BuildRowsPerTask - 1) / BuildRowsPerTask).toString,
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")

  /** [[edgeSupport]] with the wedge volume BOUNDED — same rows, same
    * values, engineered for the measured mult=30 cliff where the W-row
    * wedge stream (W ≈ 26·m on the co-order graph) outgrows one box.
    * Three disciplines compose:
    *
    *  1. '''Never sort the wedges.''' Both triangle joins are
    *     shuffle-hash: the W-row wedge stream is probe-side only — it
    *     is written to shuffle files and streamed back exactly once,
    *     while the hash maps are built from bounded edge sets (the
    *     m/slices-row slice for the wedge join, the m-row edge list for
    *     the closure join). The default sort-merge plan instead
    *     externally SORTS all W rows on (a,c); at 704M wedges that sort
    *     is a multi-pass disk merge — the 4.9×-for-3× segment in the
    *     round-8 baseline.
    *  1b. '''Bound the build maps''' (the m100 wall): partitions scale
    *     with the build side and AQE coalescing is disabled for the
    *     slice jobs — see [[BuildRowsPerTask]] for the measured failure
    *     mode this closes.
    *  2. '''Slice the wedge shuffle.''' When the oriented wedge count
    *     W = Σ_s d_out(d_out−1)/2 (computed exactly from one degree
    *     aggregate over the persisted oriented edges) exceeds
    *     `targetWedges`, the wedge-source nodes are hash-split into
    *     ⌈W/target⌉ slices processed EAGERLY one at a time, each
    *     pre-combined to per-edge partial supports (≤ m rows) before the
    *     next slice starts — live shuffle footprint is W/slices rows, so
    *     the operator degrades to more passes, never to thrash. Slicing
    *     by wedge-source `a` partitions the triangle list exactly (every
    *     oriented triangle has ONE source), so partial sums add up to
    *     [[edgeSupport]] bit-for-bit.
    *
    * On a cluster the same knob is wedges-per-executor; the default
    * (256M) keeps a 32-thread / 8 GiB box single-pass up to ~sf1 and
    * 3-pass at sf3.
    *
    * @param edges undirected edge list as (u, v) with u < v, distinct.
    */
  def edgeSupportBounded(edges: DataFrame,
      targetWedges: Long = 256000000L): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val spark = edges.sparkSession
    // SER, not deserialized: at m100 the 90M-row oriented cache's VALUES
    // unroll (32 concurrent tasks each UnsafeRow.copy-ing its partition
    // into the storage pool) transiently blows the 8 GiB heap — the
    // serialized columnar path reserves incrementally and spills clean
    val oriented = orient(edges).persist(StorageLevel.MEMORY_AND_DISK_SER)
    // exact wedge count from the oriented out-degrees — d(d−1) is even,
    // so summing before the halving keeps everything in long arithmetic;
    // the same pass yields m = Σd, the build-side row count
    val deg = oriented.groupBy("s").agg(count(lit(1)).as("d"))
      .agg(coalesce(sum(col("d") * (col("d") - 1)), lit(0L)).cast("long"),
        coalesce(sum("d"), lit(0L)).cast("long"))
      .head()
    val w = deg.getLong(0) / 2
    val m = deg.getLong(1)
    val slices = math.max(1L, (w + targetWedges - 1) / targetWedges).toInt
    val minParts = spark.conf.getOption("spark.sql.shuffle.partitions")
      .fold(32)(_.toInt)
    val e2 = oriented.select(col("s").as("b"), col("t").as("c"))
    val e3 = oriented.select(col("s").as("a"), col("t").as("c"))
    val out = Plans.withConf(spark, joinConfs(m, minParts): _*) {
      val parts = (0 until slices).map { i =>
        // hint the SLICE as the wedge join's build side — m/slices rows
        // beats e2's m; the closure join's build side must stay e3 (the
        // probe there is the W/slices-row wedge stream)
        val e1 = (if (slices == 1) oriented
          else oriented.filter(pmod(xxhash64(col("s")), lit(slices)) === i))
          .select(col("s").as("a"), col("t").as("b"))
        val tri = e1.hint("shuffle_hash").join(e2, "b")
          .join(e3.hint("shuffle_hash"), Seq("a", "c"))
        val p = creditEdges(tri)
          .groupBy("u", "v").agg(count(lit(1)).as("sup"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        p.count() // materialize NOW — one slice's wedge shuffle live at a time
        p
      }
      val sup = parts.reduce(_ unionAll _)
        .groupBy("u", "v").agg(sum("sup").as("sup"))
      // the per-edge join output is O(m) — detach it from the cache so the
      // slice partials and the oriented edges can be dropped immediately
      val res = edges.join(sup, Seq("u", "v"), "left")
        .select(col("u"), col("v"), coalesce(col("sup"), lit(0L)).as("support"))
        .localCheckpoint()
      parts.foreach(_.unpersist(blocking = false))
      res
    }
    oriented.unpersist(blocking = false)
    out
  }

  /** [[triangleList]] MATERIALIZED under the same wedge disciplines as
    * [[edgeSupportBounded]] (shuffle-hash streamed wedges, eager
    * ⌈W/target⌉ hash-slices of the wedge source): returns the exact
    * once-per-triangle (a, b, c) list as an eagerly-persisted frame the
    * caller must unpersist. Unlike the support pass, the output here is
    * inherently O(T) — callers that only need per-edge aggregates should
    * use [[edgeSupportBounded]]; this exists for consumers that maintain
    * triangle state INCREMENTALLY across peel rounds (k-truss), where
    * re-enumerating W wedges per round is the measured bottleneck.
    *
    * @param edges undirected edge list as (u, v) with u < v, distinct.
    */
  def triangleListBounded(edges: DataFrame,
      targetWedges: Long = 256000000L): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val spark = edges.sparkSession
    val oriented = orient(edges).persist(StorageLevel.MEMORY_AND_DISK_SER)
    val deg = oriented.groupBy("s").agg(count(lit(1)).as("d"))
      .agg(coalesce(sum(col("d") * (col("d") - 1)), lit(0L)).cast("long"),
        coalesce(sum("d"), lit(0L)).cast("long"))
      .head()
    val w = deg.getLong(0) / 2
    val m = deg.getLong(1)
    val slices = math.max(1L, (w + targetWedges - 1) / targetWedges).toInt
    val minParts = spark.conf.getOption("spark.sql.shuffle.partitions")
      .fold(32)(_.toInt)
    val e2 = oriented.select(col("s").as("b"), col("t").as("c"))
    val e3 = oriented.select(col("s").as("a"), col("t").as("c"))
    val out = Plans.withConf(spark, joinConfs(m, minParts): _*) {
      val parts = (0 until slices).map { i =>
        val e1 = (if (slices == 1) oriented
          else oriented.filter(pmod(xxhash64(col("s")), lit(slices)) === i))
          .select(col("s").as("a"), col("t").as("b"))
        val p = e1.hint("shuffle_hash").join(e2, "b")
          .join(e3.hint("shuffle_hash"), Seq("a", "c"))
          .select("a", "b", "c")
          .persist(StorageLevel.MEMORY_AND_DISK_SER)
        p.count() // materialize NOW — one slice's wedge shuffle live at a time
        p
      }
      val res = (if (slices == 1) parts.head
        else {
          val u = parts.reduce(_ unionAll _)
            .persist(StorageLevel.MEMORY_AND_DISK_SER)
          u.count()
          parts.foreach(_.unpersist(blocking = false))
          u
        })
      res
    }
    oriented.unpersist(blocking = false)
    out
  }

  /** Exact global triangle COUNT under the full wedge disciplines
    * (shuffle-hash streamed wedges, bounded build maps, eager wedge
    * slices) — for consumers that need only the scalar (global
    * transitivity, closure ratios): no credit explode, no output
    * materialization, each slice counts its closure rows directly.
    *
    * @param edges undirected edge list as (u, v) with u < v, distinct.
    */
  def triangleCountBounded(edges: DataFrame,
      targetWedges: Long = 256000000L): Long = {
    import org.apache.spark.storage.StorageLevel
    val spark = edges.sparkSession
    val oriented = orient(edges).persist(StorageLevel.MEMORY_AND_DISK_SER)
    val deg = oriented.groupBy("s").agg(count(lit(1)).as("d"))
      .agg(coalesce(sum(col("d") * (col("d") - 1)), lit(0L)).cast("long"),
        coalesce(sum("d"), lit(0L)).cast("long"))
      .head()
    val w = deg.getLong(0) / 2
    val m = deg.getLong(1)
    val slices = math.max(1L, (w + targetWedges - 1) / targetWedges).toInt
    val minParts = spark.conf.getOption("spark.sql.shuffle.partitions")
      .fold(32)(_.toInt)
    val e2 = oriented.select(col("s").as("b"), col("t").as("c"))
    val e3 = oriented.select(col("s").as("a"), col("t").as("c"))
    val total = Plans.withConf(spark, joinConfs(m, minParts): _*) {
      (0 until slices).map { i =>
        val e1 = (if (slices == 1) oriented
          else oriented.filter(pmod(xxhash64(col("s")), lit(slices)) === i))
          .select(col("s").as("a"), col("t").as("b"))
        e1.hint("shuffle_hash").join(e2, "b")
          .join(e3.hint("shuffle_hash"), Seq("a", "c"))
          .count()
      }.sum
    }
    oriented.unpersist(blocking = false)
    total
  }

  /** (wedges, edges) of the oriented graph — the exact size of the
    * enumeration join and the store-form decision input for the
    * incremental k-truss (one cheap aggregate over the edge list).
    *
    * @param edges undirected edge list as (u, v) with u < v, distinct.
    */
  def wedgeStats(edges: DataFrame): (Long, Long) = {
    val deg = orient(edges).groupBy("s").agg(count(lit(1)).as("d"))
      .agg(coalesce(sum(col("d") * (col("d") - 1)), lit(0L)).cast("long"),
        coalesce(sum("d"), lit(0L)).cast("long"))
      .head()
    (deg.getLong(0) / 2, deg.getLong(1))
  }

  /** [[creditListBounded]] streamed STRAIGHT into a hash-bucketed
    * parquet store: each slice's credit rows (explode fused, as below)
    * append to `dir` partitioned by bucket = pmod(hash(u,v), B), so the
    * incremental peel's delta probes prune to their own bucket
    * directories. Returns B.
    *
    * Why not localCheckpoint-then-rewrite: the checkpoint blocks of an
    * O(T) credit list are resident through the rewrite (the write READS
    * them) and the default heap at m100 has no room for both the blocks
    * and 32 concurrent parquet writers — measured OOM in
    * ParquetWriteSupport with either ordering of the frees. Streaming
    * slice-by-slice keeps peak memory at ONE slice's wedge join plus
    * writers sized by slice/B rows, and peak disk at one slice's
    * shuffle plus the growing store; the GC hint after each slice lets
    * the ContextCleaner drop the completed slice's shuffle files while
    * the next runs (the E-471 disk discipline). At cluster scale this
    * IS the production shape: enumeration streams to partitioned
    * shared storage, never through executor memory twice.
    *
    * @param edges undirected edge list as (u, v) with u < v, distinct.
    */
  def creditListBucketed(edges: DataFrame, dir: String,
      targetWedges: Long = 256000000L,
      stats: Option[(Long, Long)] = None): Int = {
    import org.apache.spark.storage.StorageLevel
    val spark = edges.sparkSession
    val oriented = orient(edges).persist(StorageLevel.MEMORY_AND_DISK_SER)
    // (wedges, m) threaded in when the caller already ran wedgeStats —
    // otherwise the O(m) degree pass here would run twice per k-truss
    // call (once in wedgeStats for the store-form choice, once here)
    val (w, m) = stats.getOrElse {
      val deg = oriented.groupBy("s").agg(count(lit(1)).as("d"))
        .agg(coalesce(sum(col("d") * (col("d") - 1)), lit(0L)).cast("long"),
          coalesce(sum("d"), lit(0L)).cast("long"))
        .head()
      (deg.getLong(0) / 2, deg.getLong(1))
    }
    val slices = math.max(1L, (w + targetWedges - 1) / targetWedges).toInt
    val minParts = spark.conf.getOption("spark.sql.shuffle.partitions")
      .fold(32)(_.toInt)
    // ~128k edges per bucket: B ≈ 690 at m100's 90M edges — granular
    // enough that a small peel delta reads a few percent of the store
    val numBuckets = math.max(32L, math.min(4096L, m / 131072L)).toInt
    val e2 = oriented.select(col("s").as("b"), col("t").as("c"))
    val e3 = oriented.select(col("s").as("a"), col("t").as("c"))
    Plans.withConf(spark, joinConfs(m, minParts): _*) {
      (0 until slices).foreach { i =>
        val e1 = (if (slices == 1) oriented
          else oriented.filter(pmod(xxhash64(col("s")), lit(slices)) === i))
          .select(col("s").as("a"), col("t").as("b"))
        e1.hint("shuffle_hash").join(e2, "b")
          .join(e3.hint("shuffle_hash"), Seq("a", "c"))
          .select(col("a"), col("b"), col("c"), explode(array(
            struct(least(col("a"), col("b")).as("u"),
              greatest(col("a"), col("b")).as("v")),
            struct(least(col("b"), col("c")).as("u"),
              greatest(col("b"), col("c")).as("v")),
            struct(least(col("a"), col("c")).as("u"),
              greatest(col("a"), col("c")).as("v")))).as("e"))
          .select(col("a"), col("b"), col("c"),
            col("e.u").as("u"), col("e.v").as("v"))
          .withColumn("bucket",
            pmod(hash(col("u"), col("v")), lit(numBuckets)).cast("int"))
          .repartition(numBuckets, col("bucket"))
          .write.mode("append")
          .partitionBy("bucket").parquet(dir)
        if (slices > 1) System.gc()
      }
    }
    oriented.unpersist(blocking = false)
    numBuckets
  }

  /** The 3-per-triangle credit list — (a, b, c, u, v): triangle identity
    * plus each credited edge canonicalized to u < v — materialized under
    * the same wedge disciplines, with the explode FUSED into the slice
    * pass (never a separate O(T) triangle-list cache). This is the
    * immutable probe structure incremental k-truss peeling runs on.
    *
    * @param edges undirected edge list as (u, v) with u < v, distinct.
    */
  def creditListBounded(edges: DataFrame,
      targetWedges: Long = 256000000L,
      stats: Option[(Long, Long)] = None): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val spark = edges.sparkSession
    val oriented = orient(edges).persist(StorageLevel.MEMORY_AND_DISK_SER)
    // (wedges, m) threaded in when the caller already ran wedgeStats
    // (see creditListBucketed)
    val (w, m) = stats.getOrElse {
      val deg = oriented.groupBy("s").agg(count(lit(1)).as("d"))
        .agg(coalesce(sum(col("d") * (col("d") - 1)), lit(0L)).cast("long"),
          coalesce(sum("d"), lit(0L)).cast("long"))
        .head()
      (deg.getLong(0) / 2, deg.getLong(1))
    }
    val slices = math.max(1L, (w + targetWedges - 1) / targetWedges).toInt
    val minParts = spark.conf.getOption("spark.sql.shuffle.partitions")
      .fold(32)(_.toInt)
    val e2 = oriented.select(col("s").as("b"), col("t").as("c"))
    val e3 = oriented.select(col("s").as("a"), col("t").as("c"))
    val out = Plans.withConf(spark, joinConfs(m, minParts): _*) {
      val parts = (0 until slices).map { i =>
        val e1 = (if (slices == 1) oriented
          else oriented.filter(pmod(xxhash64(col("s")), lit(slices)) === i))
          .select(col("s").as("a"), col("t").as("b"))
        // localCheckpoint, not persist: a cached slice RETAINS its
        // lineage, so every slice's W/slices-row wedge shuffle files
        // stay on disk until the app exits — the total is ~W rows of
        // shuffle (measured 75+ GB at W = 2.35B) and the box dies on
        // DISK, not memory. Checkpointing truncates the lineage, so
        // after the GC hint the ContextCleaner deletes the completed
        // slice's shuffle files while the next slice runs — peak disk
        // is one live slice plus the checkpointed credit blocks.
        val p = e1.hint("shuffle_hash").join(e2, "b")
          .join(e3.hint("shuffle_hash"), Seq("a", "c"))
          .select(col("a"), col("b"), col("c"), explode(array(
            struct(least(col("a"), col("b")).as("u"),
              greatest(col("a"), col("b")).as("v")),
            struct(least(col("b"), col("c")).as("u"),
              greatest(col("b"), col("c")).as("v")),
            struct(least(col("a"), col("c")).as("u"),
              greatest(col("a"), col("c")).as("v")))).as("e"))
          .select(col("a"), col("b"), col("c"),
            col("e.u").as("u"), col("e.v").as("v"))
          .localCheckpoint()
        if (slices > 1) System.gc()
        p
      }
      if (slices == 1) parts.head
      else parts.reduce(_ unionAll _)
    }
    oriented.unpersist(blocking = false)
    out
  }

  /** [[perNode]] under the same wedge disciplines as
    * [[edgeSupportBounded]] (shuffle-hash streamed wedges, eager
    * ⌈W/target⌉ hash-slices of the wedge source) — identical counts:
    * slicing by source partitions the triangle list exactly, and the
    * per-slice per-node partials sum to the single-pass result.
    *
    * @param edges undirected edge list as (u, v) with u < v, distinct.
    */
  def perNodeBounded(edges: DataFrame,
      targetWedges: Long = 256000000L): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val spark = edges.sparkSession
    // SER, not deserialized: at m100 the 90M-row oriented cache's VALUES
    // unroll (32 concurrent tasks each UnsafeRow.copy-ing its partition
    // into the storage pool) transiently blows the 8 GiB heap — the
    // serialized columnar path reserves incrementally and spills clean
    val oriented = orient(edges).persist(StorageLevel.MEMORY_AND_DISK_SER)
    val deg = oriented.groupBy("s").agg(count(lit(1)).as("d"))
      .agg(coalesce(sum(col("d") * (col("d") - 1)), lit(0L)).cast("long"),
        coalesce(sum("d"), lit(0L)).cast("long"))
      .head()
    val w = deg.getLong(0) / 2
    val m = deg.getLong(1)
    val slices = math.max(1L, (w + targetWedges - 1) / targetWedges).toInt
    val minParts = spark.conf.getOption("spark.sql.shuffle.partitions")
      .fold(32)(_.toInt)
    val e2 = oriented.select(col("s").as("b"), col("t").as("c"))
    val e3 = oriented.select(col("s").as("a"), col("t").as("c"))
    val out = Plans.withConf(spark, joinConfs(m, minParts): _*) {
      val parts = (0 until slices).map { i =>
        val e1 = (if (slices == 1) oriented
          else oriented.filter(pmod(xxhash64(col("s")), lit(slices)) === i))
          .select(col("s").as("a"), col("t").as("b"))
        val p = e1.hint("shuffle_hash").join(e2, "b")
          .join(e3.hint("shuffle_hash"), Seq("a", "c"))
          .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
          .groupBy("id").agg(count(lit(1)).as("n_triangles"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        p.count() // materialize NOW — one slice's wedge shuffle live at a time
        p
      }
      val res = parts.reduce(_ unionAll _)
        .groupBy("id").agg(sum("n_triangles").as("n_triangles"))
        .localCheckpoint()
      parts.foreach(_.unpersist(blocking = false))
      res
    }
    oriented.unpersist(blocking = false)
    out
  }
}
