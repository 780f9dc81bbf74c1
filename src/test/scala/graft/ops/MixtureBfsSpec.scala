package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MixtureBfsSpec extends AnyFunSuite with SparkFixture {

  test("mixture: quotas are floor(total·w/Σw); picks are partitioning-invariant") {
    import spark.implicits._
    val df = (0 until 300).map(i => (i.toLong, s"dom${i % 3}"))
      .toDF("id", "dom")
    val sampled = Mixture.resampleToMixture(df, col("dom"), col("id"),
      Map("dom0" -> 2.0, "dom1" -> 1.0, "dom2" -> 1.0), total = 40)
    val byDom = sampled.groupBy("dom").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDom == Map("dom0" -> 20L, "dom1" -> 10L, "dom2" -> 10L))
    // identical draw on a different partitioning
    val again = Mixture.resampleToMixture(df.repartition(17), col("dom"),
        col("id"), Map("dom0" -> 2.0, "dom1" -> 1.0, "dom2" -> 1.0), total = 40)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == sampled.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("mixture: underfilled domain contributes everything it has") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "dom")
    val got = Mixture.resampleToMixture(df, col("dom"), col("id"),
        Map("a" -> 1.0, "b" -> 1.0), total = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L)) // quotas 5/5, both domains exhaust
  }

  test("bfs: min hops on a known graph, unreached nodes absent") {
    import spark.implicits._
    // path 1→2→3→4→5 plus shortcut 1→4; node 9 isolated target of nothing
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L),
      (8L, 9L)).toDF("src", "dst")
    val sources = Seq(1L).toDF("id")
    val got = Bfs.hops(edges, sources, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // 4 is reached at hop 1 via the shortcut, NOT hop 3; 9 unreachable
    assert(got == Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2, 5L -> 2))
  }

  test("bfs: multi-source takes the nearest seed") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 3L)).toDF("src", "dst")
    val sources = Seq(1L, 10L).toDF("id")
    val got = Bfs.hops(edges, sources, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 10L -> 0, 2L -> 1, 3L -> 1))
  }
}
