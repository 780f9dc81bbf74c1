package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of HITS, the interval-overlap join, column profiling,
  * and the gains table (value equality vs DuckDB is the ext_*
  * contracts' job).
  */
class HitsIntervalSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  test("hits: star graph concentrates authority on the hub target") {
    // edges: h1 -> {a,b,c}; h2 -> {a}; spam -> {z}
    val edges = Seq(("h1", "a"), ("h1", "b"), ("h1", "c"), ("h2", "a"),
      ("spam", "z")).toDF("src", "dst")
    val out = Hits.run(edges, 2).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    // a has indegree 2 and its hubs are strong — top authority
    assert(out("a")._2 > out("b")._2 && out("b")._2 > out("z")._2)
    // h1 points at 3 strong authorities — top hub
    assert(out("h1")._1 > out("h2")._1 && out("h2")._1 > out("spam")._1)
    // sources get no authority, sinks no hub score, in a bipartite DAG
    assert(out("h1")._2 == 0.0 && out("a")._1 == 0.0)
  }

  test("hits: unnormalized scores on unit init are exact integers") {
    val rng = new scala.util.Random(23L)
    val edges = (0 until 200)
      .map(_ => (s"s${rng.nextInt(10)}", s"p${rng.nextInt(30)}"))
      .toDF("src", "dst").distinct()
    Hits.run(edges, 3).collect().foreach { r =>
      assert(r.getDouble(1) == math.rint(r.getDouble(1)))
      assert(r.getDouble(2) == math.rint(r.getDouble(2)))
    }
  }

  test("interval join equals the naive range join, each pair once") {
    val rng = new scala.util.Random(29L)
    val rows = (0 until 300).map { i =>
      val s = rng.nextInt(10000).toLong
      (i % 3, i.toLong, s, s + rng.nextInt(500))
    }
    val df = rows.toDF("blk", "id", "s", "e")
    for (w <- Seq(100L, 499L, 5000L)) {
      val got = IntervalJoin.overlapSelfJoin(df, col("blk"), col("id"),
          col("s"), col("e"), w)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val naive = rows.flatMap { case (ba, ia, sa, ea) =>
        rows.collect { case (bb, ib, sb, eb)
          if ba == bb && ia < ib && sa <= eb && sb <= ea => (ia, ib) }
      }
      assert(got.length == got.distinct.length, s"dup pairs at width=$w")
      assert(got.toSet == naive.toSet, s"pair mismatch at width=$w")
    }
  }

  test("interval join overlap length is exact and plans as equi-join") {
    val df = Seq((1, 1L, 0L, 10L), (1, 2L, 5L, 20L), (1, 3L, 21L, 30L))
      .toDF("blk", "id", "s", "e")
    val out = IntervalJoin.overlapSelfJoin(df, col("blk"), col("id"),
      col("s"), col("e"), 7L)
    val rows = out.collect().map(r => ((r.getLong(1), r.getLong(2)), r.getLong(3)))
    assert(rows.toMap == Map((1L, 2L) -> 6L)) // [5,10] inclusive = 6 units
    val plan = out.queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("profile counts nulls/distinct per column over a mixed frame") {
    val df = Seq((Some("x"), Some(1L)), (Some("x"), None), (None, Some(2L)))
      .toDF("a", "b")
      .select(col("a"), col("b").cast("string").as("b"))
    val out = Profile.profile(df, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(out("a") == ((3L, 2L, 1L, 1L))) // rows, non-null, nulls, distinct
    assert(out("b") == ((3L, 2L, 1L, 2L)))
  }

  test("gains: a perfect ranker captures all positives in the top tiles") {
    // 100 rows, 20 positives, score = 1 for positives, descending noise
    val rows = (0 until 100).map { i =>
      (i.toLong, if (i < 20) 1.0 - i * 0.001 else 0.5 - i * 0.001, i < 20)
    }
    val out = Eval.gains(rows.toDF("id", "score", "pos"),
      col("score"), col("pos"), col("id"), 10).orderBy("tile").collect()
    assert(out.length == 10)
    assert(out(0).getLong(2) == 10 && out(1).getLong(2) == 10) // tiles 1-2 all pos
    assert(out(1).getAs[Double]("capture") == 1.0)
    assert(math.abs(out(0).getAs[Double]("lift") - 5.0) < 1e-12) // 100%/20%
    // cum_pos is monotone and ends at total positives
    val cum = out.map(_.getLong(3))
    assert(cum.zip(cum.tail).forall { case (a, b) => a <= b } && cum.last == 20)
  }
}
