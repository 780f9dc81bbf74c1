package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    // the edge list is joined ~2·maxHops times — materialize it once
    // instead of recomputing its upstream (scan + distinct) per round
    val e = edges.localCheckpoint()

    // forward: one fused level-synchronous sweep computes levels AND σ —
    // candidates = frontier⋈edges σ-sums, minus already-visited nodes
    // (level-synchronous BFS reaches a node first at its min level, so
    // the anti-join both assigns levels and restricts σ to shortest
    // paths; a separate labeled-BFS pass would double the join count)
    val sigs = new scala.collection.mutable.ArrayBuffer[DataFrame]
    sigs += sources.select(col("seed"), col("id"),
      lit(1).cast(d380).as("sig")).localCheckpoint()
    var visited = sigs(0).select(col("seed"), col("id")).localCheckpoint()
    for (k <- 1 to maxHops) {
      val next = sigs(k - 1)
        .join(e, sigs(k - 1)("id") === e("src"))
        .select(col("seed"), col("dst").as("id"), col("sig"))
        .groupBy("seed", "id")
        .agg(sum("sig").cast(d380).as("sig"))
        .join(visited, Seq("seed", "id"), "left_anti")
        .localCheckpoint()
      sigs += next
      visited = visited.unionAll(next.select(col("seed"), col("id")))
        .localCheckpoint()
    }

    // backward: δ per level, deepest first; truncation level gets 0
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
      delta = sigs(k)
        .join(e2, sigs(k)("id") === col("uid"), "left")
        .join(vk, col("wid") === col("vid") && col("seed") === col("vseed"),
          "left")
        .groupBy("seed", "id")
        .agg(coalesce(sum(
          expr(s"""cast(round(cast(sig as double) / cast(vsig as double) *
                   (1 + cast(vdelta as double)), 9) as $d389)""")),
          lit(0).cast(d389)).as("delta"))
        .localCheckpoint()
      acc = if (acc == null) delta else acc.unionAll(delta)
    }

    acc.groupBy("id").agg(sum("delta").cast(d389).as("btw"))
  }
}
