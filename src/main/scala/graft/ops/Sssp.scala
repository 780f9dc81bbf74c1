package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single/multi-source WEIGHTED shortest paths (E-433): the cost-aware
  * upgrade of [[Bfs]] — hop counts answer "how many links away", this
  * answers "how cheap is the cheapest route" over non-negative integer
  * edge weights (cents, latencies, toll units).
  *
  * Bellman-Ford round algebra, frontier-pruned: after round k,
  * dist(n) = min cost over paths of ≤ k edges — the same result as a
  * full relaxation of every edge each round, but only edges leaving
  * nodes whose distance IMPROVED last round are joined (Δ-stepping's
  * work-efficiency observation without its bucket machinery). Each
  * round is one frontier⋈edges equi-join + one min fold + one
  * improved-set anti-check, all keyed by node id — no global
  * structure, no priority queue, so the plan is the same three
  * shuffles per round at any graph size; pre-bucketing edges by src
  * removes the join shuffle at 100 TB. Weights stay LONG end-to-end:
  * path cost is an exact integer sum, so the min fold is
  * order-independent and engine-portable (no float accumulation).
  * Lineage is localCheckpoint-truncated per round (the [[PageRank]]
  * discipline).
  */
object Sssp {

  /** @param edges   (src, dst, w) directed weighted edge list, w a
    *                non-negative integral column — feed both
    *                directions for an undirected graph
    * @param sources (id) seed nodes at distance 0
    * @param rounds  relaxation rounds; distances are exact for every
    *                shortest path of ≤ rounds edges (rounds ≥ graph
    *                diameter ⇒ the true fixpoint)
    * @return (id, dist) minimum path cost for every node reachable
    *         within `rounds` edges of a seed; unreachable nodes absent
    */
  def distances(edges: DataFrame, sources: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "sssp needs at least one round")
    // loop-invariant edge list joined every round: pin once (Bfs note)
    val e = edges.localCheckpoint(true,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var dist = sources.select(col("id"), lit(0L).as("dist")).localCheckpoint()
    var frontier = dist
    for (_ <- 1 to rounds) {
      val relaxed = frontier
        .select(col("id").as("graft_sp_src"), col("dist").as("graft_sp_d"))
        .join(e, col("graft_sp_src") === e("src"))
        .select(col("dst").as("id"),
          (col("graft_sp_d") + col("w").cast("long")).as("dist"))
      val next = dist.unionAll(relaxed)
        .groupBy("id").agg(min("dist").as("dist"))
        .localCheckpoint()
      frontier = next
        .join(dist.select(col("id"), col("dist").as("graft_sp_old")),
          Seq("id"), "left")
        .filter(col("graft_sp_old").isNull ||
          col("dist") < col("graft_sp_old"))
        .select("id", "dist")
        .localCheckpoint()
      dist = next
    }
    dist
  }
}
