package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection (E-434): the
  * DENSITY-seeking partition next to [[ConnectedComponents]]'
  * reachability partition — components answer "connected at all?",
  * LPA answers "which tightly-knit neighborhood?" by letting every
  * node adopt the MODAL label among its neighbors each round
  * (Raghavan 2007), so labels flood dense regions and stall at sparse
  * cuts.
  *
  * Determinized end-to-end: updates are synchronous (round k+1 reads
  * only round k — no traversal-order dependence), the vote includes
  * the node's OWN current label (one self-vote, the standard damping
  * that keeps bipartite graphs from 2-cycling wholesale), and ties
  * break to the MINIMUM label string. The per-round plan is one
  * edges⋈labels equi-join, one (id, lbl) count, and one per-id
  * row_number pick — two node-keyed shuffles, no global state, modal
  * counts never leave the executors; pre-bucketing edges by src
  * removes the join shuffle at 100 TB. Lineage is
  * localCheckpoint-truncated per round (the [[PageRank]] discipline).
  */
object LabelProp {

  /** @param edges  (src, dst) directed edge list — feed both
    *               directions for an undirected graph; votes flow
    *               src → dst
    * @param rounds synchronous propagation rounds
    * @return (id, lbl) final label per node; communities are the
    *         label-equivalence classes
    */
  def communities(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "label propagation needs at least one round")
    // loop-invariant edge list joined every round: pin once (Bfs note)
    val e = edges.localCheckpoint(true,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .select(col("id"), col("id").as("lbl"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val votes = e
        .join(labels.select(col("id").as("src"), col("lbl")), "src")
        .select(col("dst").as("id"), col("lbl"))
        .unionAll(labels)
        .groupBy("id", "lbl")
        .agg(count(lit(1)).as("graft_lp_n"))
      val pick = Window.partitionBy("id")
        .orderBy(col("graft_lp_n").desc, col("lbl").asc)
      labels = votes
        .withColumn("graft_lp_rk", row_number().over(pick))
        .filter(col("graft_lp_rk") === 1)
        .select("id", "lbl")
        .localCheckpoint()
    }
    labels
  }
}
