package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Closed-form checks for weighted SSSP and label propagation —
  * cross-engine agreement on the fixture graph is pinned by the
  * ext_sssp / ext_labelprop oracles.
  */
class SsspLabelPropSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def undirected(e: Seq[(String, String, Long)]) =
    (e ++ e.map(t => (t._2, t._1, t._3))).toDF("src", "dst", "w")

  test("sssp: a cheap 2-edge detour undercuts the direct edge") {
    // A—B (10), B—C (10), A—C (100): cheapest A→C is 20 via B.
    val edges = undirected(Seq(("A", "B", 10L), ("B", "C", 10L), ("A", "C", 100L)))
    val d = Sssp.distances(edges, Seq("A").toDF("id"), rounds = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d == Map("A" -> 0L, "B" -> 10L, "C" -> 20L), s"got $d")
  }

  test("sssp: round bound caps path length; unreachable nodes are absent") {
    val edges = undirected(
      Seq(("A", "B", 10L), ("B", "C", 10L), ("A", "C", 100L), ("X", "Y", 1L)))
    // 1 round = paths of one edge only: the 100-cost direct edge wins.
    val one = Sssp.distances(edges, Seq("A").toDF("id"), rounds = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(one == Map("A" -> 0L, "B" -> 10L, "C" -> 100L), s"got $one")
    // X/Y are in another component: never reached at any round count.
    val four = Sssp.distances(edges, Seq("A").toDF("id"), rounds = 4)
    assert(!four.collect().map(_.getString(0)).contains("X"))
  }

  test("labelprop: two triangles joined by a bridge settle into two communities") {
    val tri = Seq(("a", "b"), ("a", "c"), ("b", "c"),
      ("d", "e"), ("d", "f"), ("e", "f"), ("c", "d"))
    val edges = (tri ++ tri.map(_.swap)).toDF("src", "dst")
    val labs = LabelProp.communities(edges, rounds = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(labs == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "d" -> "d", "e" -> "d", "f" -> "d"), s"got $labs")
  }
}
