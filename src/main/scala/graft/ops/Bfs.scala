package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Multi-source breadth-first search (E-51): minimum hop count from a
  * seed set over an edge list, the reachability/radius primitive
  * (impact analysis, link-distance features, graph-bounded sampling)
  * complementing [[PageRank]] (importance), [[ConnectedComponents]]
  * (partition) and [[Triangles]] (density).
  *
  * Level-synchronous and fully relational: per round, ONLY the frontier
  * (nodes first reached last round) joins the edge list, then one
  * min-aggregate folds re-discoveries away — work is O(Σ_frontier
  * out-degree) per round, never nodes × edges. Each round is one
  * shuffle keyed by node id; pre-bucketing edges by src removes even
  * that at 100 TB. Lineage is localCheckpoint-truncated per round
  * (same discipline as [[PageRank]]) so maxHops doesn't nest plans.
  */
object Bfs {

  /** @param edges   (src, dst) directed edge list — feed both
    *                directions for an undirected graph
    * @param sources (id) seed nodes, hop 0
    * @return (id, hops) for every node within maxHops of a seed;
    *         unreached nodes are absent
    */
  def hops(edges: DataFrame, sources: DataFrame, maxHops: Int): DataFrame = {
    // the edge list is loop-invariant but joined every round: pin it once
    // so each round reads materialized blocks instead of re-running the
    // caller's scan + distinct + union upstream (the Betweenness pin,
    // measured ~1 recompute of the edge derivation saved per round)
    val e = edges.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK)
    var dist = sources.select(col("id"), lit(0).as("hops")).localCheckpoint()
    var h = 1
    while (h <= maxHops) {
      val frontier = dist.filter(col("hops") === h - 1)
      val next = frontier
        .join(e, frontier("id") === e("src"))
        .select(col("dst").as("id"), lit(h).as("hops"))
      dist = dist.unionAll(next)
        .groupBy("id").agg(min("hops").as("hops"))
        .localCheckpoint()
      h += 1
    }
    dist
  }

  /** Per-seed hop counts for SEVERAL independent seeds in ONE
    * level-synchronous sweep: state is keyed by (seed, id), so k seeds
    * share each round's frontier join instead of running k separate
    * BFS loops — same round count, k× fewer jobs (the eccentricity
    * probe went 18 joins → 6 with this).
    *
    * @param sources (seed, id) rows — each seed's BFS starts at its id
    * @return (seed, id, hops) for every node within maxHops of seed
    */
  def labeledHops(edges: DataFrame, sources: DataFrame,
      maxHops: Int): DataFrame = {
    // same loop-invariant pin as hops()
    val e = edges.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK)
    var dist = sources.select(col("seed"), col("id"), lit(0).as("hops"))
      .localCheckpoint()
    var h = 1
    while (h <= maxHops) {
      val frontier = dist.filter(col("hops") === h - 1)
      val next = frontier
        .join(e, frontier("id") === e("src"))
        .select(col("seed"), col("dst").as("id"), lit(h).as("hops"))
      dist = dist.unionAll(next)
        .groupBy("seed", "id").agg(min("hops").as("hops"))
        .localCheckpoint()
      h += 1
    }
    dist
  }
}
