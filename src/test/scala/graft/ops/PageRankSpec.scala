package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** PageRank properties (E-32) on graphs with known closed-form or
  * symmetry structure — the cross-engine agreement itself is pinned by
  * the ext_pagerank oracle.
  */
class PageRankSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def ranks(edges: Seq[(String, String)], iters: Int): Map[String, Double] =
    PageRank.run(edges.toDF("src", "dst"), iters).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("symmetric cycle converges to uniform rank 1") {
    // directed 4-cycle: every node has in/out degree 1 -> pr stays 1.0
    val cyc = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a")
    val pr = ranks(cyc, 5)
    assert(pr.values.forall(v => math.abs(v - 1.0) < 1e-12), s"cycle not uniform: $pr")
  }

  test("hub receives more mass than leaves; sinks keep teleport mass") {
    // star: leaves l1..l3 -> hub; hub has no out-edges (sink)
    val star = Seq("l1" -> "hub", "l2" -> "hub", "l3" -> "hub")
    val pr = ranks(star, 2)
    assert(pr("hub") > pr("l1"), s"hub must dominate: $pr")
    // leaves have no in-edges: exactly the teleport constant
    assert(math.abs(pr("l1") - 0.15) < 1e-12)
    // hub after iteration 2: 0.15 + 0.85 * 3 * (0.15 / 1)  (leaves at 0.15)
    assert(math.abs(pr("hub") - (0.15 + 0.85 * 3 * 0.15)) < 1e-12)
  }

  test("total mass is conserved modulo sink leakage (bidirected graph)") {
    // bidirected graphs have no sinks: sum(pr) == n exactly in the limit,
    // and stays n at every iteration of this teleport formulation
    val und = Seq("a" -> "b", "b" -> "a", "b" -> "c", "c" -> "b")
    val pr = ranks(und, 4)
    assert(math.abs(pr.values.sum - 3.0) < 1e-9, s"mass not conserved: $pr")
  }
}
