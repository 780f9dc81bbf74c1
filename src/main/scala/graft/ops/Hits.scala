package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration HITS (hubs & authorities) over a directed edge
  * list — the second classic link-analysis score next to [[PageRank]]
  * (E-128). Where PageRank measures one global importance, HITS
  * separates the two roles a bipartite corpus graph actually has:
  * hubs (documents/suppliers that point at many good authorities) and
  * authorities (targets endorsed by many good hubs).
  *
  * Per iteration the mutual recursion runs relationally:
  * auth(v) = Σ_{u→v} hub(u), then hub(u) = Σ_{u→v} auth_NEW(v) — two
  * keyed join+sum shuffles over the edge table, state one node-sized
  * frame, lineage truncated per round with `localCheckpoint` (the
  * [[PageRank]]/[[ConnectedComponents]] discipline). Unnormalized with
  * fixed iterations — rankings are what matter, and skipping the
  * global-sum normalizer keeps every aggregate a small per-node sum
  * (no corpus-wide float fold), so results pin under rounding.
  *
  * Determinism bound: the "every score is an exact integer in a
  * double" argument holds only while all hub/auth sums stay below
  * 2^53. Each iteration performs TWO propagation hops (hub→auth, then
  * auth→hub), so unnormalized scores grow roughly as
  * maxDegree^(2·iterations) and the exactness budget is
  * 2 · iterations · log₂(maxDegree) < 53 — e.g. 5 iterations tolerate
  * max degree ~39 (2·5·log₂(39) ≈ 53), and a max degree of 1500 only
  * survives ~2 iterations. Denser graphs or more rounds silently
  * re-enter FP-order-sensitive territory and need the normalized
  * variant instead.
  */
object Hits {

  /** @param edges DataFrame with `src` and `dst` columns (directed)
    * @return DataFrame(id, hub, auth) — one row per node
    */
  def run(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, "hits needs at least one iteration")
    // the edge list is loop-invariant but joined TWICE per iteration
    // (auth then hub): pin it once so every round reads materialized
    // blocks instead of re-running the caller's scan + distinct upstream
    val e = edges.localCheckpoint(true,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint()
    var scores = nodes.withColumn("hub", lit(1.0)).withColumn("auth", lit(1.0))
    for (_ <- 1 to iterations) {
      val auth = nodes.join(
          e.join(scores.select(col("id").as("src"), col("hub")), "src")
            .groupBy("dst").agg(sum("hub").as("graft_h_a")),
          nodes("id") === col("dst"), "left")
        .select(col("id"), coalesce(col("graft_h_a"), lit(0.0)).as("auth"))
      val hub = nodes.join(
          e.join(auth.select(col("id").as("dst"), col("auth")), "dst")
            .groupBy("src").agg(sum("auth").as("graft_a_h")),
          nodes("id") === col("src"), "left")
        .select(col("id"), coalesce(col("graft_a_h"), lit(0.0)).as("hub"))
      scores = hub.join(auth, "id").localCheckpoint()
    }
    scores.select(col("id"), col("hub"), col("auth"))
  }
}
