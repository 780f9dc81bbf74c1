package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round k-core refinement (E-54): iteratively peel nodes whose
  * degree within the surviving subgraph is below k — the density-based
  * community/noise separator complementing [[Triangles]] (local
  * density) and [[ConnectedComponents]] (reachability). `rounds` bounds
  * the peeling (the true k-core is the fixpoint; when a round removes
  * nothing the result has converged — the gated query's graph converges
  * in 2 rounds).
  *
  * Per round: two semi-joins restrict the edge list to live endpoints,
  * one count aggregate recomputes degrees — all equi-joins keyed by
  * node id, one shuffle each, lineage truncated per round like
  * [[PageRank]]/[[Bfs]]. Never materializes anything denser than the
  * edge list.
  */
object KCore {

  /** Survivor sets after 0..rounds peels: element r of the result is
    * the node set (id) still alive after r rounds (element 0 = all
    * nodes). The full trajectory shows convergence — equal consecutive
    * counts mean the fixpoint (the true k-core) was reached.
    */
  def peelRounds(edges: DataFrame, k: Long, rounds: Int): Seq[DataFrame] = {
    var nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint()
    var out = Vector(nodes)
    var r = 0
    while (r < rounds) {
      nodes = edges
        .join(nodes.select(col("id").as("src")), Seq("src"), "left_semi")
        .join(nodes.select(col("id").as("dst")), Seq("dst"), "left_semi")
        .groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("src").as("id"))
        .localCheckpoint()
      out :+= nodes
      r += 1
    }
    out
  }

  /** @param edges bidirected (src, dst) edge list
    * @return (id) nodes surviving `rounds` peels at threshold k
    */
  def refine(edges: DataFrame, k: Long, rounds: Int): DataFrame =
    peelRounds(edges, k, rounds).last
}
