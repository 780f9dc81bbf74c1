package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over an edge list — the clustering
  * step that turns pairwise near-duplicate hits (MinHash/SimHash/cosine
  * pairs) into duplicate GROUPS, so a corpus pipeline can keep one
  * representative per cluster instead of reasoning about pairs.
  *
  * Algorithm: hash-min label propagation accelerated by pointer jumping.
  * Every node starts labeled with its own id; each round
  *
  *   1. neighbor-min: L(u) := min(L(u), min over v in N(u) of L(v)) —
  *      one equi-join of the (symmetrized) edge list against the label
  *      table plus a groupBy-min, i.e. ONE shuffle keyed on node id;
  *   2. pointer jump: L(u) := L(L(u)) — a self-join of the label table,
  *      which short-circuits label chains so convergence is
  *      O(log diameter) rounds rather than O(diameter);
  *   3. the new label table is localCheckpoint'ed — lineage stays one
  *      round deep no matter how many rounds run (the GloVe block
  *      trainer's pattern), and the convergence test (count of changed
  *      labels) reuses the checkpointed result.
  *
  * At fixpoint adjacent nodes have equal labels (otherwise neighbor-min
  * would fire), so labels are uniform per component; the minimum node of
  * a component can only carry its own id, hence every label IS the
  * component minimum — deterministic, which is what lets the driver
  * hash-check [[graft.ops.ExtensionQueries.extComponents]] against a
  * DuckDB recursive-CTE oracle.
  *
  * 100 TB shape: edges shuffle once per round on node id, labels are two
  * longs per node, and no step ever materializes a component's member
  * list on one task — cliques of exact duplicates should be collapsed
  * BEFORE edge generation (Dedup.minhashNearDupPairsFromSets already
  * canonicalizes identical sets), keeping |E| near-linear in |V|.
  */
object ConnectedComponents {

  /** Connected components of the graph given by `edges` (columns
    * `src`, `dst`, any integral type). Returns (node LONG,
    * component LONG) for every node incident to at least one edge,
    * where component = the minimum node id of the component. Callers
    * wanting singleton components union their isolated ids back in.
    */
  def components(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val sym0 = edges
      .select(col("src").cast("long").as("u"), col("dst").cast("long").as("v"))
      .filter(col("u") =!= col("v"))
    val sym = sym0.union(sym0.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = sym.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint()

    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("node").as("v"), col("label").as("lv")), "v")
        .groupBy("u").agg(min("lv").as("nl"))
      val updated = labels
        .join(nbrMin.select(col("u").as("node"), col("nl")), Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
      val jumped = updated.as("x")
        .join(updated.select(col("node").as("label"), col("label").as("ll")).as("y"),
          Seq("label"), "left")
        .select(col("node"), coalesce(col("ll"), col("label")).as("label"))
        .localCheckpoint()
      val changed = jumped.as("n").join(labels.as("o"), "node")
        .filter(col("n.label") =!= col("o.label")).count()
      labels = jumped
      converged = changed == 0
      it += 1
    }
    sym.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds")
    labels.select(col("node"), col("label").as("component"))
  }

  /** Per-component keeper assignment over component labels: the keeper
    * is the component id itself (the minimum member), mirroring
    * Dedup.exactAssignKeepers' shape for near-dup clusters.
    */
  def assignKeepers(comps: DataFrame): DataFrame =
    comps.select(col("node"), col("component").as("keeper"),
      (col("node") =!= col("component")).as("is_dup"))
}
