package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Louvain community detection — the FULL algorithm shape: synchronous
  * integer-exact local-move rounds iterated to a fixpoint, then one
  * graph COARSENING (communities → super-nodes, intra-community weight
  * → self-loops) and another move round on the contracted graph. E-470
  * shipped the single seed round; this object generalizes it to an
  * arbitrary current partition and to graphs WITH self-loops (which the
  * coarsened graph always has), keeping every decision in the loop an
  * exact long comparison:
  *
  *   moving i from community a to community b changes modularity by
  *     ΔQ = (w_i→b − w_i→a\i)/m − k_i·(Σ_b − (Σ_a − k_i))/(2m²)
  *   which is positive iff
  *     gain2m2 = 2m·(w_i→b − w_i→a\i) − k_i·(Σ_b − Σ_a + k_i) > 0
  *   — an exact long, so the move filter AND the argmax tiebreak
  *   (gain desc, target label asc) are bit-stable on any engine.
  *
  * Synchronous adoption stays acyclic the E-470 way: a node may only
  * move to a STRICTLY SMALLER target label, so each mover's label
  * strictly decreases — a swap cycle cannot oscillate and the round
  * sequence must reach a fixpoint (labels are bounded below). A round
  * with zero movers is absorbing: identical inputs reproduce identical
  * (empty) moves, which is what lets a static unrolled oracle run
  * "too many" rounds safely.
  *
  * The partition score is kept exact too: Q = q_num / (4m²) with
  *   q_num = Σ_c (4m·w_in(c) − Σ_c²)
  * an exact long (no float accumulation across communities — the only
  * IEEE op is the final single division, deterministic everywhere).
  *
  * Scale: every step is a keyed join or aggregation on (node, label)
  * — per round: one fan-out of edges to labeled endpoints, one
  * (node × neighbor-community) aggregate, one window argmax. At 100 TB
  * the graph tables shuffle-partition on node id; rounds repeat the
  * same two keyed joins (the E-22/E-131 iteration shape), and
  * coarsening is one relabel + groupBy that SHRINKS the graph before
  * further rounds pay for it.
  */
object Louvain {

  /** Lineage + STATS truncating checkpoint. `localCheckpoint` alone is
    * not enough for this loop: Spark's checkpointed `LogicalRDD` carries
    * the ORIGIN plan's size estimate forward, and [[moveRound]]'s plan
    * multiplies the labels frame into itself ~6 times (k, σ, w_i→c, the
    * mover stats, the final relabel join), so the propagated
    * `sizeInBytes` bit-length MULTIPLIES by ~6 every round — by round 9
    * the optimizer is doing Toom-Cook arithmetic on million-digit
    * BigIntegers inside every stats visit (measured: 17 min of driver
    * CPU at sf0.01 before this helper; seconds after). Frontier-style
    * loops (PageRank, BFS) reference the previous round ONCE, so their
    * stats grow linearly and plain localCheckpoint is fine — this
    * pathology is specific to self-multiplying round plans. Rebuilding
    * the frame from the checkpointed RDD resets the leaf to the default
    * size estimate, which also (correctly, at scale) keeps the per-node
    * labels table on the shuffle-join path rather than broadcast.
    */
  def pin(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }

  /** Exact weighted degree per node: adjacent edge weight + 2× the
    * node's self-loop weight (a self-loop contributes both endpoints).
    * `selfw` may be null-free empty; nodes come from `nodes` so
    * isolated vertices keep k=0.
    */
  private def degrees(nodes: DataFrame, edges: DataFrame,
      selfw: DataFrame): DataFrame = {
    val adj = edges.select(col("u").as("n"), col("w"))
      .unionAll(edges.select(col("v").as("n"), col("w")))
      .groupBy("n").agg(sum("w").as("kadj"))
    nodes.join(adj, Seq("n"), "left")
      .join(selfw, Seq("n"), "left")
      .select(col("n"),
        (coalesce(col("kadj"), lit(0L)) +
          lit(2L) * coalesce(col("sw"), lit(0L))).as("k"))
  }

  /** One synchronous local-move round from an arbitrary partition.
    *
    * @param edges  undirected (u, v, w), u < v, no self rows
    * @param selfw  (n, sw) self-loop weight per node (w_ii once)
    * @param labels current partition (n, lbl); lbl values share the
    *               node-id domain's total order
    * @param m      total graph weight Σw + Σsw (exact long)
    * @return new labels (n, lbl)
    */
  def moveRound(edges: DataFrame, selfw: DataFrame, labels: DataFrame,
      m: Long): DataFrame = {
    val dir = edges.select(col("u").as("i"), col("v").as("j"), col("w"))
      .unionAll(edges.select(col("v").as("i"), col("u").as("j"), col("w")))
    val k = degrees(labels.select(col("n")), edges, selfw)
    val sigma = labels.join(k, "n").groupBy("lbl").agg(sum("k").as("sig"))
    // w_i→c: weight from i to every NEIGHBOR community c (self-loops
    // move with the node, so they never enter w_i→c)
    val wic = dir
      .join(labels.select(col("n").as("j"), col("lbl").as("c")), "j")
      .groupBy("i", "c").agg(sum("w").as("wic"))
    // the mover's own community stats: Σ_a and w_i→a\i (0 when i has no
    // intra-community neighbor)
    val cur = labels.select(col("n").as("i"), col("lbl").as("a"))
      .join(k.select(col("n").as("i"), col("k").as("ki")), "i")
      .join(sigma.select(col("lbl").as("a"), col("sig").as("siga")), "a")
    val curw = cur
      .join(wic.select(col("i"), col("c").as("a"), col("wic").as("wia")),
        Seq("i", "a"), "left")
      .select(col("i"), col("a"), col("ki"), col("siga"),
        coalesce(col("wia"), lit(0L)).as("wia"))
    val gains = wic.join(curw, "i")
      .filter(col("c") < col("a")) // strictly-smaller-label adoption
      .join(sigma.select(col("lbl").as("c"), col("sig").as("sigc")), "c")
      .select(col("i"), col("c"),
        (lit(2L) * lit(m) * (col("wic") - col("wia")) -
          col("ki") * (col("sigc") - col("siga") + col("ki")))
          .as("gain2m2"))
      .filter(col("gain2m2") > 0)
    val w2 = Window.partitionBy("i")
      .orderBy(col("gain2m2").desc, col("c").asc)
    val moves = gains.withColumn("rk", row_number().over(w2))
      .filter(col("rk") === 1)
      .select(col("i").as("n"), col("c").as("newlbl"))
    labels.join(moves, Seq("n"), "left")
      .select(col("n"), coalesce(col("newlbl"), col("lbl")).as("lbl"))
  }

  /** Exact modularity numerator of a partition:
    * q_num = Σ_c (4m·w_in(c) − Σ_c²), so Q = q_num / (4m²).
    * Returns a 1-row frame (q_num, n_comms).
    */
  def scorePartition(edges: DataFrame, selfw: DataFrame,
      labels: DataFrame, m: Long): DataFrame = {
    val win = edges
      .join(labels.select(col("n").as("u"), col("lbl").as("lu")), "u")
      .join(labels.select(col("n").as("v"), col("lbl").as("lv")), "v")
      .filter(col("lu") === col("lv"))
      .groupBy(col("lu").as("lbl")).agg(sum("w").as("we"))
      .unionByName(
        selfw.join(labels, "n").groupBy("lbl").agg(sum("sw").as("we")))
      .groupBy("lbl").agg(sum("we").as("w_in"))
    val k = degrees(labels.select(col("n")), edges, selfw)
    val sigma = labels.join(k, "n").groupBy("lbl").agg(sum("k").as("sig"))
    sigma.join(win, Seq("lbl"), "left")
      .select(col("lbl"), col("sig"),
        coalesce(col("w_in"), lit(0L)).as("w_in"))
      .agg(sum(lit(4L) * lit(m) * col("w_in") - col("sig") * col("sig"))
        .as("q_num"), count(lit(1)).as("n_comms"))
  }

  /** Contract communities to super-nodes: inter-community weights
    * re-keyed to (min label, max label); intra-community edge weight
    * plus member self-loops become the super-node's self-loop. Total
    * weight m is preserved. Returns (edges', selfw', nodes').
    */
  def coarsen(edges: DataFrame, selfw: DataFrame,
      labels: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val lbld = edges
      .join(labels.select(col("n").as("u"), col("lbl").as("lu")), "u")
      .join(labels.select(col("n").as("v"), col("lbl").as("lv")), "v")
    val cEdges = lbld.filter(col("lu") =!= col("lv"))
      .select(least(col("lu"), col("lv")).as("u"),
        greatest(col("lu"), col("lv")).as("v"), col("w"))
      .groupBy("u", "v").agg(sum("w").as("w"))
    val cSelf = lbld.filter(col("lu") === col("lv"))
      .select(col("lu").as("n"), col("w").as("sw"))
      .unionByName(selfw.join(labels, "n")
        .select(col("lbl").as("n"), col("sw")))
      .groupBy("n").agg(sum("sw").as("sw"))
    val cNodes = labels.select(col("lbl").as("n")).distinct()
    (cEdges, cSelf, cNodes)
  }
}
