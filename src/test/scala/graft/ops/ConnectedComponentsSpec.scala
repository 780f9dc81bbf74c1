package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite with SparkFixture {

  private def comps(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.components(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two triangles and an isolated pair resolve to their minima") {
    val got = comps(Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L), (20L, 21L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("a 64-node chain converges (pointer jumping beats O(diameter))") {
    val got = comps((1L until 64L).map(i => (i, i + 1)))
    assert(got.size == 64 && got.values.forall(_ == 1L))
  }

  test("edge direction and duplicate edges do not matter; self-loops ignored") {
    val got = comps(Seq((5L, 3L), (3L, 5L), (5L, 3L), (7L, 7L), (3L, 9L)))
    // 7 has only a self-loop -> not incident to a real edge -> absent
    assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L))
  }

  test("matches brute-force transitive closure on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val n = 60
    val edges = Seq.fill(45)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // brute force: repeated min-relaxation until fixpoint
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var lbl = nodes.map(x => x -> x).toMap
    var changed = true
    while (changed) {
      changed = false
      for ((a, b) <- edges) {
        val m = math.min(lbl(a), lbl(b))
        if (lbl(a) != m) { lbl += a -> m; changed = true }
        if (lbl(b) != m) { lbl += b -> m; changed = true }
      }
    }
    assert(comps(edges) == lbl)
  }

  test("assignKeepers marks non-minimum members as duplicates") {
    import spark.implicits._
    val k = ConnectedComponents.assignKeepers(
        ConnectedComponents.components(Seq((4L, 2L), (4L, 6L)).toDF("src", "dst")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(k == Set((2L, 2L, false), (4L, 2L, true), (6L, 2L, true)))
  }
}
