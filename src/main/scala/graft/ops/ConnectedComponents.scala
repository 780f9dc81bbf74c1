package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the clustering
  * step that turns pairwise near-duplicate hits (MinHash/SimHash/cosine
  * pairs) into duplicate GROUPS, so a corpus pipeline can keep one
  * representative per cluster instead of reasoning about pairs.
  *
  * Algorithm: star contraction with full pointer compression. Each
  * round, on the CURRENT (contracted) graph:
  *
  *   1. hash-min: l(u) := min({u} ∪ N(u)) — one groupBy-min over the
  *      symmetrized edge list, i.e. ONE shuffle keyed on node id. The
  *      l-pointers form a forest (each pointer strictly decreases);
  *   2. pointer compression: square the mapping (l := l ∘ l) until it
  *      is idempotent — pointer doubling over a NODE-sized table, so a
  *      length-d pointer chain compresses to its root in ⌈log₂ d⌉ cheap
  *      self-joins while the edge set is never touched;
  *   3. contraction: every edge is rewritten to (l(u), l(v)) under the
  *      compressed map, loops dropped, duplicates merged. A path
  *      contracts to EMPTY in one round (its whole l-forest is one
  *      tree); dense near-dup communities collapse almost entirely in
  *      round one, so only round one pays the full |E| (measured:
  *      without contraction, a 5k-doc/9M-edge corpus re-joined all 9M
  *      edges every round and the corpus funnel ran 3x slower). More
  *      rounds are needed only when hash-min split a component into
  *      several trees — O(log n) rounds worst case;
  *   4. the original-node label table composes with the same map each
  *      round. Every round boundary is localCheckpoint'ed (eager) — it
  *      truncates lineage to an RDD leaf, so plans stay constant-size
  *      across rounds and later actions never recompute earlier rounds
  *      (persist + partial actions left uncached partitions whose
  *      recompute cascaded through every prior round). Termination =
  *      the contracted graph has no edges left.
  *
  * Correctness: graph and labels contract through the SAME per-round
  * map, so by induction the contracted graph is the image of the
  * original graph under the composed label map; an empty contracted
  * graph therefore means every original edge joins same-labeled nodes,
  * i.e. labels are uniform per component. Each map is decreasing and
  * stays inside its component, so the component minimum m always maps
  * to itself — every final label IS the component minimum.
  * Deterministic, which is what lets the driver hash-check
  * [[graft.ops.ExtensionQueries.extComponents]] against a DuckDB
  * recursive-CTE oracle.
  *
  * 100 TB shape: the full edge set shuffles once (round 1); subsequent
  * rounds run on the contracted remainder. The compression loop works
  * on node-sized (two-long) tables; no step materializes a component's
  * member list on one task.
  */
object ConnectedComponents {

  /** Squares the (n, lbl) mapping until idempotent: full path
    * compression of a pointer forest in ⌈log₂ depth⌉ self-joins.
    */
  private def compress(mapping: DataFrame, maxJumps: Int = 20): DataFrame = {
    var m = mapping.localCheckpoint()
    var jumps = 0
    var stable = false
    while (!stable && jumps < maxJumps) {
      val m2 = m
        .join(m.select(col("n").as("lbl"), col("lbl").as("lj")), Seq("lbl"), "left")
        .select(col("n"), coalesce(col("lj"), col("lbl")).as("lbl"))
        .localCheckpoint()
      stable = m2.as("x").join(m.as("y"), "n")
        .filter(col("x.lbl") =!= col("y.lbl")).isEmpty
      m = m2
      jumps += 1
    }
    if (!stable)
      throw new IllegalStateException(
        s"pointer compression did not stabilize in $maxJumps squarings")
    m
  }

  /** Per-round sort-buffer budget: symmetric edge rows per shuffle
    * task. Round 1's hash-min groupBy and contraction joins shuffle the
    * FULL symmetric edge list; past `budget × session partitions` rows,
    * AQE's parallelism-first coalescing re-fattens per-task sorts the
    * same way it fattened trussup's build maps (the round-11 m100
    * lesson) — so the round's jobs run under scoped confs (partitions
    * sized to the live edge count, coalescing off), recomputed per
    * round as the graph contracts. Empty below the threshold: fixture
    * plans stay byte-identical.
    */
  private val EdgeRowsPerTask = 1000000L

  private def roundConfs(m: Long, minParts: Int): Seq[(String, String)] =
    if (m <= EdgeRowsPerTask * minParts) Seq.empty
    else Seq(
      "spark.sql.shuffle.partitions" ->
        ((m + EdgeRowsPerTask - 1) / EdgeRowsPerTask).toString,
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")

  /** Connected components of the graph given by `edges` (columns
    * `src`, `dst`, any integral type). Returns (node LONG,
    * component LONG) for every node incident to at least one edge,
    * where component = the minimum node id of the component. Callers
    * wanting singleton components union their isolated ids back in.
    */
  def components(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val spark = edges.sparkSession
    val minParts = spark.conf.getOption("spark.sql.shuffle.partitions")
      .fold(32)(_.toInt)
    val sym0 = edges
      .select(col("src").cast("long").as("u"), col("dst").cast("long").as("v"))
      .filter(col("u") =!= col("v"))
    var graph = sym0.union(sym0.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .localCheckpoint()

    var labels = graph.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint()

    var it = 0
    var m = graph.count()
    var done = m == 0
    while (!done && it < maxIter) {
      val g2 = Plans.withConf(spark, roundConfs(m, minParts): _*) {
        // 1. hash-min (graph is symmetric, so every node appears as u)
        val l1 = graph.groupBy("u").agg(min("v").as("m"))
          .select(col("u").as("n"), least(col("u"), col("m")).as("lbl"))
        // 2. compress the pointer forest to its roots
        val l = compress(l1)
        // 4. compose into the original-node label table (left join:
        //    already-settled labels absent from this round's graph stay)
        labels = labels
          .join(l.select(col("n").as("label"), col("lbl")), Seq("label"), "left")
          .select(col("node"), coalesce(col("lbl"), col("label")).as("label"))
          .localCheckpoint()
        // 3. contract the graph through the same map
        graph
          .join(l.select(col("n").as("u"), col("lbl").as("lu")), "u")
          .join(l.select(col("n").as("v"), col("lbl").as("lv")), "v")
          .select(col("lu").as("u"), col("lv").as("v"))
          .filter(col("u") =!= col("v"))
          .distinct()
          .localCheckpoint()
      }
      m = g2.count()
      done = m == 0
      graph = g2
      it += 1
    }
    if (!done)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds")
    labels.select(col("node"), col("label").as("component"))
  }

  /** Per-component keeper assignment over component labels: the keeper
    * is the component id itself (the minimum member), mirroring
    * Dedup.exactAssignKeepers' shape for near-dup clusters.
    */
  def assignKeepers(comps: DataFrame): DataFrame =
    comps.select(col("node"), col("component").as("keeper"),
      (col("node") =!= col("component")).as("is_dup"))
}
