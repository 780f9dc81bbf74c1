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
  * Memory discipline (the single-container / small-executor case): all
  * intermediates persist at MEMORY_AND_DISK so level tables spill
  * instead of OOM-ing, `visited` is a LAZY union over the persisted σ
  * levels (no per-round materialized copy of the growing set), and the
  * backward pass unpersists each σ/δ level the moment its last
  * consumer has run while folding δ into a running per-id aggregate.
  * Resident state is therefore edges + two σ levels + two δ levels +
  * the fold — O(reach), never O(maxHops · reach).
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

    val level = StorageLevel.MEMORY_AND_DISK
    def pin(df: DataFrame): DataFrame = { val p = df.persist(level); p.count(); p }

    // the edge list is joined ~2·maxHops times — materialize it once
    // (spillable) instead of recomputing its upstream per round
    val e = pin(edges)

    // forward: one fused level-synchronous sweep computes levels AND σ —
    // candidates = frontier⋈edges σ-sums, minus already-visited nodes
    // (level-synchronous BFS reaches a node first at its min level, so
    // the anti-join both assigns levels and restricts σ to shortest
    // paths; a separate labeled-BFS pass would double the join count).
    // `visited` is never materialized: it is the union VIEW over the
    // already-pinned σ levels, so the anti-join scans cached blocks
    // instead of persisting a fresh cumulative copy per round.
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
    // After computing level k's δ, level k+1's σ and δ have no further
    // consumer — unpersist both; δ(k) folds into a running per-id sum
    // so the union of ALL level deltas is never resident at once.
    var delta = pin(sigs(maxHops).select(col("seed"), col("id"),
      lit(0).cast(d389).as("delta")))
    var acc: DataFrame = null
    for (k <- (maxHops - 1) to 1 by -1) {
      val vk = sigs(k + 1)
        .select(col("seed").as("vseed"), col("id").as("vid"),
          col("sig").as("vsig"))
        .join(delta.select(col("seed").as("vseed"), col("id").as("vid"),
          col("delta").as("vdelta")), Seq("vseed", "vid"))
      val e2 = e.select(col("src").as("uid"), col("dst").as("wid"))
      val deltaK = pin(sigs(k)
        .join(e2, sigs(k)("id") === col("uid"), "left")
        .join(vk, col("wid") === col("vid") && col("seed") === col("vseed"),
          "left")
        .groupBy("seed", "id")
        .agg(coalesce(sum(
          expr(s"""cast(round(cast(sig as double) / cast(vsig as double) *
                   (1 + cast(vdelta as double)), 9) as $d389)""")),
          lit(0).cast(d389)).as("delta")))
      sigs(k + 1).unpersist(blocking = false)
      delta.unpersist(blocking = false)
      delta = deltaK
      val folded = pin((if (acc == null) delta.select(col("id"), col("delta"))
        else acc.unionAll(delta.select(col("id"), col("delta"))))
        .groupBy("id").agg(sum("delta").cast(d389).as("delta")))
      if (acc != null) acc.unpersist(blocking = false)
      acc = folded
    }

    // detach the (small, O(reached-nodes)) result from the cache so every
    // internal level can be dropped — localCheckpoint blocks are
    // GC-cleaned, persisted plans are not
    val out = acc.select(col("id"), col("delta").cast(d389).as("btw"))
      .localCheckpoint()
    (Seq(e, sigs(0), sigs(1), delta, acc)).foreach(_.unpersist(blocking = false))
    out
  }
}
