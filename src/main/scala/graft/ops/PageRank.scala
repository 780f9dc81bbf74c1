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
    // pin the caller's edge plan ONCE, derive nodes/outdeg/contribs from
    // the pin: the contribution frame is loop-invariant but joined every
    // iteration, and without the pin each iteration re-ran the caller's
    // edge derivation (scan + distinct at most call sites) plus the
    // outdeg groupBy + join
    val e = edges.localCheckpoint(true,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("graft_pr_d"))
    // outdeg rides along with each edge so the per-iteration join is
    // edges ⋈ ranks only
    val contribs = e.join(outdeg, "src")
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
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

  /** Personalized PageRank: teleport mass goes ONLY to the seed set
    * (restart vector r(n) = 1[n∈S]/|S|), so scores measure proximity
    * to the seeds instead of global authority — the "related items
    * for THIS portfolio" primitive. p₀ = r; p ← (1−d)·r + d·Σ p/deg.
    * Same per-iteration shape (one contribution join + one sum
    * shuffle) with the seed flag broadcast; |S| is driver-side small
    * by definition.
    */
  def personalized(edges: DataFrame, seeds: DataFrame, iterations: Int,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "ppr needs at least one iteration")
    val k = seeds.select("id").distinct().count()
    require(k >= 1, "ppr needs at least one seed")
    // loop-invariant pin, same reasoning as run()
    val e = edges.localCheckpoint(true,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .join(broadcast(seeds.select(col("id")).distinct()
        .withColumn("graft_ppr_seed", lit(true))), Seq("id"), "left")
      .select(col("id"),
        when(col("graft_ppr_seed"), lit(1.0 / k)).otherwise(lit(0.0))
          .as("graft_ppr_r"))
      .localCheckpoint()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("graft_pr_d"))
    val contribs = e.join(outdeg, "src")
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var pr = nodes.withColumn("pr", col("graft_ppr_r"))
    for (_ <- 1 to iterations) {
      val inbound = contribs
        .join(pr.select(col("id").as("src"), col("pr")), "src")
        .groupBy("dst")
        .agg(sum(col("pr") / col("graft_pr_d")).as("graft_pr_s"))
      pr = nodes.join(inbound, nodes("id") === inbound("dst"), "left")
        .select(col("id"), col("graft_ppr_r"),
          (lit(1 - damping) * col("graft_ppr_r") +
            lit(damping) * coalesce(col("graft_pr_s"), lit(0.0))).as("pr"))
        .localCheckpoint()
    }
    pr.select(col("id"), col("pr"))
  }

  /** Katz centrality with α = 1/invAlpha, β = 1, in EXACT integer
    * arithmetic: with z_k = invAlpha^k · x_k the recurrence
    * x_{k+1} = 1 + α·Σ_in x_k becomes z_{k+1} = invAlpha^{k+1} + Σ z_k
    * — pure long sums, order-independent, no float in the loop. The
    * float form rounds ON the 1/invAlpha^k half-grid (the E-283
    * round-half trap: α=0.05 puts every score exactly on a 1.25e-4
    * grid, so a 4-digit display rounding flips between engines);
    * returning the integer z alongside the terminating-decimal
    * x = z/invAlpha^k makes the score grid-exact at any display
    * precision. Counts attenuated walks — the centrality that still
    * ranks nodes where raw degree ties.
    */
  def katz(edges: DataFrame, iterations: Int,
      invAlpha: Long = 20L): DataFrame = {
    require(iterations >= 1, "katz needs at least one iteration")
    // loop-invariant edge list: pin once (see run)
    val e = edges.localCheckpoint(true,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint()
    var x = nodes.withColumn("z", lit(1L))
    var scale = 1L
    for (_ <- 1 to iterations) {
      scale *= invAlpha
      val inbound = e
        .join(x.select(col("id").as("src"), col("z")), "src")
        .groupBy("dst")
        .agg(sum(col("z")).as("graft_kz_s"))
      x = nodes.join(inbound, nodes("id") === inbound("dst"), "left")
        .select(col("id"),
          (lit(scale) + coalesce(col("graft_kz_s"), lit(0L))).as("z"))
        .localCheckpoint()
    }
    x.select(col("id"), col("z").as("katz_z"),
      (col("z").cast("double") / scale).as("katz"))
  }
}
