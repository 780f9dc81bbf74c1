package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Triangle counting on graphs with known closed forms — cross-engine
  * agreement on the fixture graph is pinned by the ext_triangles oracle.
  */
class TrianglesSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNode(edges.toDF("u", "v")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4: every vertex sits in C(3,2)=3 triangles") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val c = counts(k4)
    assert(c == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $c")
  }

  test("triangle-free graphs produce no rows; shared edge credits both triangles") {
    // path graph: no triangles
    assert(counts(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
    // bowtie: triangles {1,2,3} and {3,4,5} share vertex 3
    val bowtie = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (3L, 5L), (4L, 5L))
    val c = counts(bowtie)
    assert(c(3L) == 2L && c(1L) == 1L && c(5L) == 1L, s"got $c")
  }
}
