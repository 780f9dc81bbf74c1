package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list — the standard
  * Pregel-style power iteration, expressed relationally so Catalyst
  * plans every step (E-32). Complements connected components
  * (ops.ConnectedComponents) as the second iterative graph operator a
  * corpus pipeline needs (authority scoring over link/citation graphs
  * feeds quality filtering).
  *
  * Per iteration: contribution join (edges ⋈ ranks on src, shuffle
  * keyed by src), one sum shuffle keyed by dst, and a left join back to
  * the node set so sinks keep the teleport mass. State between
  * iterations is one node-sized DataFrame; `localCheckpoint` truncates
  * the lineage each round (same discipline as ConnectedComponents and
  * the GloVe block trainer) so the plan doesn't grow with the iteration
  * count. At 100 TB the edge table dominates: it shuffles once per
  * iteration on src — pre-bucketing edges by src removes even that.
  *
  * Deterministic given the edge list: scores depend only on graph
  * structure (float summation order varies per run at ~1e-16, which the
  * caller's rounding absorbs — same contract as every aggregate query).
  * Uses the classic per-node teleport form p(v) = (1−d) + d·Σ p(u)/deg(u)
  * (Σ over in-neighbors u), initialized at p = 1, so scores average 1
  * rather than summing to 1 — matching the original PageRank paper's
  * formulation.
  */
object PageRank {

  /** @param edges DataFrame with `src` and `dst` string/long columns
    *              (directed; pass both directions for undirected graphs)
    * @return DataFrame(id, pr) — one row per node appearing in `edges`
    */
  def run(edges: DataFrame, iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "pagerank needs at least one iteration")
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint()
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("graft_pr_d"))
    // outdeg rides along with each edge so the per-iteration join is
    // edges ⋈ ranks only
    val contribs = edges.join(outdeg, "src")
    var pr = nodes.withColumn("pr", lit(1.0))
    for (_ <- 1 to iterations) {
      val inbound = contribs
        .join(pr.withColumnRenamed("id", "src"), "src")
        .groupBy("dst")
        .agg(sum(col("pr") / col("graft_pr_d")).as("graft_pr_s"))
      pr = nodes.join(inbound, nodes("id") === inbound("dst"), "left")
        .select(col("id"),
          (lit(1 - damping) +
            lit(damping) * coalesce(col("graft_pr_s"), lit(0.0))).as("pr"))
        .localCheckpoint()
    }
    pr
  }
}
