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

  /** Lineage + STATS truncating checkpoint — [[moveRound]]'s plan
    * multiplies the labels frame into itself ~6 times per round (k, σ,
    * w_i→c, the mover stats, the final relabel join), the
    * self-multiplying shape whose propagated `sizeInBytes` explodes
    * without a stats reset. The mechanism and measurements live with
    * the shared helper: [[Plans.pin]].
    */
  def pin(df: DataFrame): DataFrame = Plans.pin(df)

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

  /** Per-level summary of one [[cluster]] level: `rounds` move rounds
    * were EXECUTED (the last one moved nothing when the level hit its
    * fixpoint inside `maxRounds`), `nMoved` summed over them, and the
    * level-end partition's exact community count / modularity numerator
    * (Q = qNum / (4m²)).
    */
  final case class LevelStats(level: Int, rounds: Int, nMoved: Long,
      nComms: Long, qNum: Long)

  /** FULL multi-level Louvain: repeat [move-to-fixpoint → coarsen]
    * until a level's move rounds move NOTHING (the standard stopping
    * rule — a zero-mover level means coarsening again would rebuild the
    * identical graph, so the partition is final). E-472's single
    * [fixpoint + coarsen + one round] is the first iteration of this
    * loop; the kernels are level-agnostic, this is just the recursion.
    *
    * Returns the flat assignment on the ORIGINAL node ids — each
    * level's fixpoint labels composed through the super-node chain
    * (one keyed join per level, O(levels) of them) — plus per-level
    * stats. Every per-round frame is [[pin]]ned: move plans are
    * self-multiplying, so both lineage and the stats estimate must be
    * truncated each round (see [[Plans.pin]]).
    *
    * Scale: identical per-round cost to [[moveRound]]; levels SHRINK
    * the graph geometrically in practice, so the level loop adds
    * O(levels) driver actions over strictly smaller inputs — at 100 TB
    * the first level dominates and later levels run on
    * communities-as-rows.
    *
    * @param maxRounds per-level safety valve (termination is guaranteed
    *                  by strictly-smaller-label adoption regardless)
    * @param maxLevels safety valve on the level recursion (the graph
    *                  can shrink at most log-fold per level, so real
    *                  inputs converge in a handful)
    */
  def cluster(edges0: DataFrame, selfw0: DataFrame, nodes0: DataFrame,
      m: Long, maxRounds: Int = 20, maxLevels: Int = 10)
      : (DataFrame, Seq[LevelStats]) = {
    var edges = pin(edges0)
    var selfw = pin(selfw0)
    var nodes = nodes0
    // original node -> its current super-node (identity at level 0)
    var assign = pin(nodes0.select(col("n"), col("n").as("lbl")))
    val stats = scala.collection.mutable.ArrayBuffer.empty[LevelStats]
    var level = 0
    var converged = false
    while (level < maxLevels && !converged) {
      var labels = pin(nodes.select(col("n"), col("n").as("lbl")))
      var total = 0L
      var rounds = 0
      var fix = false
      while (rounds < maxRounds && !fix) {
        val nl = pin(moveRound(edges, selfw, labels, m))
        val nm = nl.join(labels.withColumnRenamed("lbl", "old"), "n")
          .filter(col("lbl") =!= col("old")).count()
        total += nm
        fix = nm == 0L
        labels = nl
        rounds += 1
      }
      val sc = scorePartition(edges, selfw, labels, m).head()
      stats += LevelStats(level, rounds, total, sc.getLong(1), sc.getLong(0))
      if (total == 0L) converged = true
      else {
        assign = pin(assign.select(col("n"), col("lbl").as("cur"))
          .join(labels.select(col("n").as("cur"), col("lbl")), "cur")
          .select(col("n"), col("lbl")))
        val (ce, cs, cn) = coarsen(edges, selfw, labels)
        edges = pin(ce)
        selfw = pin(cs)
        nodes = cn
        level += 1
      }
    }
    (assign, stats.toSeq)
  }
}
