package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Truncated multi-seed betweenness centrality (Brandes 2001): which
  * nodes carry the most shortest-path traffic — the brokerage view the
  * rest of the centrality family ([[PageRank]] importance, harmonic
  * closeness reach, [[Triangles]] density) doesn't capture.
  *
  * Exact Brandes is all-pairs; at scale the standard estimator samples
  * k seed nodes and truncates the sweep (Bader et al. 2007's adaptive
  * sampling is this loop with a stopping rule). Both passes are
  * level-synchronous and fully relational:
  *
  *  - forward: one fused level-synchronous sweep — per level a
  *    frontier⋈edges join whose σ-sums are anti-joined against the
  *    visited set, which simultaneously assigns BFS levels and
  *    restricts σ to shortest-path edges (level(v) = level(u)+1), σ
  *    summed as exact decimal(38,0) path counts;
  *  - backward: dependency δ(u) = Σ_v (σu/σv)·(1+δv) over the same
  *    edges reversed, one level at a time. Each term is quantized to
  *    1e-9 BEFORE the fold and δ kept decimal(38,9), so every sum is
  *    exact and the result is partitioning/engine independent (the
  *    quantize-then-fold float discipline).
  *
  * Work per round is O(Σ_frontier out-degree) — never nodes × edges;
  * k seeds share each round's joins via the (seed, id) keying. Nodes
  * at the truncation depth get δ = 0 (their deeper subtrees are cut —
  * documented estimator bias, standard for truncated betweenness).
  *
  * Memory discipline: every level localCheckpoints at MEMORY_AND_DISK
  * (lineage truncation keeps per-round Catalyst work constant — a
  * persist-only variant re-optimizes the growing plan tree and measured
  * 7× slower at sf0.1), and `visited` is a LAZY union over the
  * already-pinned σ levels rather than a per-round materialized copy of
  * the growing set. Because BFS levels are DISJOINT per seed, resident
  * state is edges + Σ|σ levels| + Σ|δ levels| = O(reach) — the
  * per-round cumulative visited copies were the O(maxHops · reach) term
  * that OOM'd an 8 GiB single-JVM run at 36M edges (round-8 baseline);
  * without them the same sweep fits the default heap.
  */
object Betweenness {

  private val d380 = "decimal(38,0)"
  private val d389 = "decimal(38,9)"

  /** Per-node accumulated dependency Σ_seeds δ(node) within maxHops of
    * the seeds.
    *
    * @param edges   (src, dst) directed edges — feed both directions
    *                for an undirected graph
    * @param sources (seed, id) seed rows, one BFS root each
    * @return (id, btw) — btw exact decimal(38,9), seeds' own rows
    *         excluded (δ is defined over interior nodes, hops ≥ 1)
    */
  def truncated(edges: DataFrame, sources: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    // maxHops <= 1: every reached node sits AT the truncation depth, so
    // every δ is 0 and the interior is empty — return the empty frame
    // the backward loop would have produced instead of NPE-ing on it
    if (maxHops <= 1)
      return sources.select(col("id"), lit(0).cast(d389).as("btw"))
        .filter(lit(false))

    def pin(df: DataFrame): DataFrame =
      df.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK)

    // the edge list is joined ~2·maxHops times — materialize it once
    // instead of recomputing its upstream (scan + distinct) per round
    val e = pin(edges)

    // forward: one fused level-synchronous sweep computes levels AND σ —
    // candidates = frontier⋈edges σ-sums, minus already-visited nodes
    // (level-synchronous BFS reaches a node first at its min level, so
    // the anti-join both assigns levels and restricts σ to shortest
    // paths; a separate labeled-BFS pass would double the join count).
    // `visited` is never re-materialized: the anti-join scans the
    // already-pinned σ levels, so no cumulative copy stacks up.
    val sigs = new scala.collection.mutable.ArrayBuffer[DataFrame]
    sigs += pin(sources.select(col("seed"), col("id"),
      lit(1).cast(d380).as("sig")))
    def visited: DataFrame =
      sigs.map(_.select(col("seed"), col("id"))).reduce(_ unionAll _)
    for (k <- 1 to maxHops) {
      sigs += pin(sigs(k - 1)
        .join(e, sigs(k - 1)("id") === e("src"))
        .select(col("seed"), col("dst").as("id"), col("sig"))
        .groupBy("seed", "id")
        .agg(sum("sig").cast(d380).as("sig"))
        .join(visited, Seq("seed", "id"), "left_anti"))
    }

    // backward: δ per level, deepest first; truncation level gets 0.
    // Levels are disjoint, so the lazy union consumed by the single
    // final aggregate holds O(reach) rows total.
    var delta = sigs(maxHops).select(col("seed"), col("id"),
      lit(0).cast(d389).as("delta"))
    var acc: DataFrame = null
    for (k <- (maxHops - 1) to 1 by -1) {
      val vk = sigs(k + 1)
        .select(col("seed").as("vseed"), col("id").as("vid"),
          col("sig").as("vsig"))
        .join(delta.select(col("seed").as("vseed"), col("id").as("vid"),
          col("delta").as("vdelta")), Seq("vseed", "vid"))
      val e2 = e.select(col("src").as("uid"), col("dst").as("wid"))
      delta = pin(sigs(k)
        .join(e2, sigs(k)("id") === col("uid"), "left")
        .join(vk, col("wid") === col("vid") && col("seed") === col("vseed"),
          "left")
        .groupBy("seed", "id")
        .agg(coalesce(sum(
          expr(s"""cast(round(cast(sig as double) / cast(vsig as double) *
                   (1 + cast(vdelta as double)), 9) as $d389)""")),
          lit(0).cast(d389)).as("delta")))
      acc = if (acc == null) delta else acc.unionAll(delta)
    }

    acc.groupBy("id").agg(sum("delta").cast(d389).as("btw"))
  }
}
