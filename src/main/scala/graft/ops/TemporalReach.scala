package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-respecting reachability (E-439): earliest-arrival search over
  * a TEMPORAL graph — edges exist at moments, and a path is valid
  * only if successive edge times never decrease (you cannot ride a
  * Tuesday link after taking a Wednesday one). The static-graph
  * reachability of [[Bfs]]/[[ConnectedComponents]] OVERSTATES what
  * can propagate through event data (infections, rumors, supply
  * disruptions travel forward in time only); this is the honest
  * version.
  *
  * Earliest-arrival relaxation: arr(v) ← min(arr(v), min{t : edge
  * (u,v,t), t ≥ arr(u)}). Because smaller arr(u) only ENLARGES the
  * qualifying edge set, the fold is monotone and the frontier-pruned
  * form (only nodes whose arrival improved last round re-relax)
  * equals full per-round relaxation — the [[Sssp]] argument. Each
  * round is one frontier⋈edges equi-join with a t ≥ arr residual
  * filter + one (seed, node) min fold; arrival times stay integral
  * day numbers end-to-end (exact min-fold, engine-portable).
  * Lineage is localCheckpoint-truncated per round.
  */
object TemporalReach {

  /** @param edges   (src, dst, t) temporal edge list, t an integral
    *                day/epoch column — feed both directions for an
    *                undirected graph
    * @param sources (seed, id) labeled seed nodes, arrival 0
    * @param rounds  relaxation rounds (max path edge count)
    * @return (seed, id, arr) earliest arrival day for every node
    *         reachable from seed by a time-respecting path of ≤
    *         rounds edges; unreachable nodes absent
    */
  def earliestArrival(edges: DataFrame, sources: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 1, "temporal reach needs at least one round")
    // loop-invariant edge list joined every round: pin once (Bfs note)
    val e = edges.localCheckpoint(true,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var arr = sources.select(col("seed"), col("id"), lit(0L).as("arr"))
      .localCheckpoint()
    var frontier = arr
    for (_ <- 1 to rounds) {
      val relaxed = frontier
        .select(col("seed"), col("id").as("graft_tr_src"),
          col("arr").as("graft_tr_a"))
        .join(e, col("graft_tr_src") === e("src") &&
          e("t").cast("long") >= col("graft_tr_a"))
        .select(col("seed"), col("dst").as("id"),
          col("t").cast("long").as("arr"))
      val next = arr.unionAll(relaxed)
        .groupBy("seed", "id").agg(min("arr").as("arr"))
        .localCheckpoint()
      frontier = next
        .join(arr.select(col("seed"), col("id"),
          col("arr").as("graft_tr_old")), Seq("seed", "id"), "left")
        .filter(col("graft_tr_old").isNull ||
          col("arr") < col("graft_tr_old"))
        .select("seed", "id", "arr")
        .localCheckpoint()
      arr = next
    }
    arr
  }
}
