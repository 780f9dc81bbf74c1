package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multi-level Louvain on a PLANTED 2-level community graph (E-474) —
  * the fixture brand graph contracts to one super-node at level 1, so
  * the level recursion can only be exercised on a graph with genuinely
  * hierarchical structure, planted the DedupSpec way.
  *
  * The plant: 4 cliques of 5 nodes (intra edge weight 4, nodes
  * 10c..10c+4); cliques are PAIRED into 2 macro communities by
  * weight-3 complete-bipartite bridges over the NON-MIN members, plus
  * one weight-1 edge (1, 21) connecting the macros so the graph is
  * connected and the final level runs a genuine zero-mover round.
  *
  * Two plant constraints are load-bearing (verified by hand against
  * the exact gain2m2 arithmetic, 2m = 514):
  *
  *  - bridges must EXCLUDE each clique's min node: under
  *    strictly-smaller-label adoption a clique min with a smaller
  *    cross neighbor takes the positive singleton→singleton cross gain
  *    at round 1 (2m·w − k_i·k_j > 0 for w=3) and can never move back
  *    (its new label is the global infimum of its options), orphaning
  *    it outside its clique forever. With bridges off the min nodes,
  *    round 1 collapses every clique onto its min (intra gain
  *    2m·4 − k_i·16 dominates every cross option) and round 2 moves
  *    nothing: a member's cross-pair weight (4·3 = 12) is below its
  *    intra weight (4·4 = 16);
  *  - the macro structure must be INVISIBLE to single nodes but
  *    visible to super-nodes: coarse pairs have w_uv = 16·3 = 48
  *    against K = 2·40 + 48(+1) = 128..129, so the singleton-super
  *    merge gain 2m·48 − 128·129 = 8160 > 0 — while no individual
  *    node ever sees more than 12 of cross weight. Merging the two
  *    macros across the weight-1 edge loses (2m·1 − 257² < 0), so
  *    level 2's single round moves nothing and fires the stopping
  *    rule on a real move round.
  */
class LouvainSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  // cliques: nodes 10c+0..10c+4 for c in 0..3; macro pairs (0,1), (2,3)
  private val cliqueEdges = for {
    c <- 0 to 3; i <- 0 to 4; j <- (i + 1) to 4
  } yield (10L * c + i, 10L * c + j, 4L)

  // bridges: non-min members only (i, j in 1..4), weight 3
  private val bridgeEdges = for {
    (a, b) <- Seq((0, 1), (2, 3)); i <- 1 to 4; j <- 1 to 4
  } yield (10L * a + i, 10L * b + j, 3L)

  private val macroEdge = Seq((1L, 21L, 1L))

  private lazy val edges: DataFrame =
    (cliqueEdges ++ bridgeEdges ++ macroEdge).toDF("u", "v", "w")

  private lazy val nodes: DataFrame =
    edges.select(col("u").as("n")).unionAll(edges.select(col("v").as("n")))
      .distinct()

  private lazy val noSelf: DataFrame =
    edges.select(col("u").as("n"), col("w").as("sw")).filter(lit(false))

  test("cluster() recovers the planted 2-level hierarchy and stops") {
    val m = edges.agg(sum("w")).head().getLong(0)
    assert(m == 257L, s"fixture weight drifted: m=$m")

    val (assign, stats) = Louvain.cluster(edges, noSelf, nodes, m)

    // exactly the planted MACRO partition: {cliques 0,1} and {cliques 2,3}
    val got = assign.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val macros = got.groupBy(_._2).values.map(_.keys.toSet).toSet
    val planted = Set(
      (for (c <- 0 to 1; i <- 0 to 4) yield 10L * c + i).toSet,
      (for (c <- 2 to 3; i <- 0 to 4) yield 10L * c + i).toSet)
    assert(macros == planted, s"communities != planted macros: $macros")

    // the hierarchy resolved LEVEL BY LEVEL:
    // level 0 found the 4 micro-cliques (16 non-min movers, 1 round +
    // the zero-mover confirmation), level 1 merged the pairs, level 2
    // ran one genuine round that moved nothing (stopping rule)
    assert(stats.map(_.level) == Seq(0, 1, 2), s"levels: $stats")
    assert(stats(0).nComms == 4L && stats(0).nMoved == 16L, s"level 0: $stats")
    assert(stats(1).nComms == 2L && stats(1).nMoved == 2L, s"level 1: $stats")
    assert(stats(2).nMoved == 0L && stats(2).rounds == 1, s"level 2: $stats")
    assert(stats(2).nComms == 2L, s"final partition: $stats")

    // modularity ascends strictly across levels (exact longs, shared 4m²):
    // micro partition q_num = 4·41120·… = 98430, macro = 131070
    assert(stats(0).qNum == 98430L, s"level-0 Q: $stats")
    assert(stats(1).qNum == 131070L, s"level-1 Q: $stats")
    assert(stats(1).qNum == stats(2).qNum, s"zero-mover level keeps Q: $stats")
  }

  test("cluster() on a clique converges at level 0 with one community") {
    val k4 = (for (i <- 0 to 3; j <- (i + 1) to 3) yield (i.toLong, j.toLong, 1L))
      .toDF("u", "v", "w")
    val n4 = k4.select(col("u").as("n")).unionAll(k4.select(col("v").as("n")))
      .distinct()
    val (assign, stats) = Louvain.cluster(k4, noSelf, n4, 6L)
    assert(assign.select("lbl").distinct().count() == 1L)
    // one level of merging, then the zero-mover level that stops the loop
    assert(stats.last.nMoved == 0L && stats.last.nComms == 1L, s"$stats")
  }
}
