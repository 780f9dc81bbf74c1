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
  * INCREMENTAL rounds (round 12, the k-truss delta discipline applied
  * here): the edge list is persisted once and degrees are maintained,
  * not recomputed — peeling node set P only changes a survivor's degree
  * by its edge count INTO P, so each round is one keyed join of the
  * edge list against the (small) peeled delta plus an O(nodes) degree
  * rewrite. Equivalent by induction: deg_r(v) = deg_{r−1}(v) − |{(v,p):
  * p ∈ P_r}| equals v's degree among round-r survivors, because every
  * peeled neighbor is subtracted exactly once, in the round it leaves.
  * (The previous form re-derived the edge list from its source and
  * re-counted degrees under two semi-joins EVERY round — measured 4.4 s
  * at sf0.1 for 3 rounds; the delta form does one derivation pass and
  * three cheap decrement joins.) Never materializes anything denser
  * than the edge list.
  */
object KCore {

  /** Survivor sets after 0..rounds peels: element r of the result is
    * the node set (id) still alive after r rounds (element 0 = all
    * nodes). The full trajectory shows convergence — equal consecutive
    * counts mean the fixpoint (the true k-core) was reached.
    *
    * REQUIRES a BIDIRECTED edge list (every undirected edge present as
    * both (u,v) and (v,u)): nodes and degrees are derived from `src`
    * alone, so a canonical u<v list would silently drop half the nodes
    * and halve degrees. Callers holding canonical edges must union the
    * flipped copy first (see extKcore / refine).
    */
  def peelRounds(edges: DataFrame, k: Long, rounds: Int): Seq[DataFrame] = {
    import org.apache.spark.storage.StorageLevel
    val e = edges.persist(StorageLevel.MEMORY_AND_DISK_SER)
    // full degrees: every node of a bidirected edge list appears as src,
    // so the degree frame covers exactly the src ∪ dst node set
    var deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("id"), col("deg"))
      .localCheckpoint()
    var out = Vector(deg.select("id"))
    var r = 0
    while (r < rounds) {
      val peeled = deg.filter(col("deg") < k).select(col("id").as("dst"))
      val survivors = deg.filter(col("deg") >= k)
      // degree decrement: edges whose dst was peeled this round, counted
      // per surviving src — the only degrees that change
      val delta = e.join(peeled, Seq("dst"))
        .groupBy("src").agg(count(lit(1)).as("d"))
        .select(col("src").as("id"), col("d"))
      deg = survivors.join(delta, Seq("id"), "left")
        .select(col("id"),
          (col("deg") - coalesce(col("d"), lit(0L))).as("deg"))
        .localCheckpoint()
      out :+= deg.select("id")
      r += 1
    }
    e.unpersist(blocking = false)
    out
  }

  /** @param edges bidirected (src, dst) edge list
    * @return (id) nodes surviving `rounds` peels at threshold k
    */
  def refine(edges: DataFrame, k: Long, rounds: Int): DataFrame =
    peelRounds(edges, k, rounds).last
}
