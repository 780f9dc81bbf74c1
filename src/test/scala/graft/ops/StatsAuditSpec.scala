package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the estimation-statistics helpers ([[Stats]]) and the
  * governance audits ([[Audit]], [[Privacy.lDiversity]],
  * [[Sampling.foldAssign]]). Value equality vs DuckDB is the
  * ext_ttest/.../ext_crossval contracts' job; these pin the algebra on
  * inputs with known closed-form answers and on adversarial shapes
  * (ties at the trim boundary, homogeneous privacy groups, orphaned
  * keys) the fixtures may not exercise.
  */
class StatsAuditSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  test("welchT recovers the hand-computed statistic on a known sample") {
    // group1 = {10,12,14}, group2 = {20,24}: m1=12, m2=22,
    // s1²=4, s2²=8, se=4/3+8/2=16/3, t=-10/sqrt(16/3)
    val df = Seq((true, 10L), (true, 12L), (true, 14L), (false, 20L), (false, 24L))
      .toDF("g", "v")
    val r = Stats.welchT(df, col("g"), col("v")).collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 2)
    assert(math.abs(r.getDouble(2) - 12.0) < 1e-12)
    assert(math.abs(r.getDouble(3) - 22.0) < 1e-12)
    val se = 4.0 / 3 + 8.0 / 2
    assert(math.abs(r.getDouble(4) - (-10.0 / math.sqrt(se))) < 1e-12)
    val df_ = se * se / ((4.0 / 3) * (4.0 / 3) / 2 + (8.0 / 2) * (8.0 / 2) / 1)
    assert(math.abs(r.getDouble(5) - df_) < 1e-12)
  }

  test("welchT is symmetric under group flip (t negates, df invariant)") {
    val rng = new scala.util.Random(7L)
    val rows = (0 until 400).map(i => (i % 3 == 0, rng.nextInt(1000).toLong))
    val df = rows.toDF("g", "v")
    val a = Stats.welchT(df, col("g"), col("v")).collect()(0)
    val b = Stats.welchT(df, !col("g"), col("v")).collect()(0)
    assert(a.getLong(0) == b.getLong(1) && a.getLong(1) == b.getLong(0))
    assert(math.abs(a.getDouble(4) + b.getDouble(4)) < 1e-12)
    assert(math.abs(a.getDouble(5) - b.getDouble(5)) < 1e-12)
  }

  test("spearman: monotone=1, reversed=-1, ties match the midrank formula") {
    val mono = (1 to 50).map(i => (i.toLong, (i * i).toLong)).toDF("x", "y")
    assert(math.abs(Stats.spearman(mono, col("x"), col("y"))
      .collect()(0).getDouble(1) - 1.0) < 1e-12)
    val rev = (1 to 50).map(i => (i.toLong, (100 - i).toLong)).toDF("x", "y")
    assert(math.abs(Stats.spearman(rev, col("x"), col("y"))
      .collect()(0).getDouble(1) + 1.0) < 1e-12)
    // tied data against a brute-force midrank Pearson computed in Scala
    val rng = new scala.util.Random(11L)
    val pts = (0 until 200).map(_ => (rng.nextInt(8).toLong, rng.nextInt(8).toLong))
    def midranks(vs: Seq[Long]): Map[Long, Double] = {
      val sorted = vs.sorted.zipWithIndex.map { case (v, i) => (v, i + 1.0) }
      sorted.groupBy(_._1).map { case (v, g) => v -> g.map(_._2).sum / g.size }
    }
    val rx = midranks(pts.map(_._1)); val ry = midranks(pts.map(_._2))
    val xs = pts.map(p => rx(p._1)); val ys = pts.map(p => ry(p._2))
    val n = pts.size.toDouble
    val mx = xs.sum / n; val my = ys.sum / n
    val num = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
    val den = math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum) *
      math.sqrt(ys.map(b => (b - my) * (b - my)).sum)
    val rho = Stats.spearman(pts.toDF("x", "y"), col("x"), col("y"))
      .collect()(0).getDouble(1)
    assert(math.abs(rho - num / den) < 1e-10)
  }

  test("ols2 recovers an exact linear law with r2=1, and beats noise") {
    val rng = new scala.util.Random(13L)
    val exact = (0 until 300).map { _ =>
      val x1 = rng.nextInt(50).toLong; val x2 = rng.nextInt(30).toLong
      (300 + 2 * x1 - 5 * x2, x1, x2)
    }.toDF("y", "x1", "x2")
    val r = Stats.ols2(exact, col("y"), col("x1"), col("x2")).collect()(0)
    assert(math.abs(r.getDouble(1) - 300.0) < 1e-6)
    assert(math.abs(r.getDouble(2) - 2.0) < 1e-9)
    assert(math.abs(r.getDouble(3) + 5.0) < 1e-9)
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-12)
    // with symmetric noise the slopes stay near truth and 0 < r2 < 1
    val noisy = (0 until 2000).map { _ =>
      val x1 = rng.nextInt(50).toLong; val x2 = rng.nextInt(30).toLong
      (300 + 2 * x1 - 5 * x2 + rng.nextInt(21) - 10, x1, x2)
    }.toDF("y", "x1", "x2")
    val rn = Stats.ols2(noisy, col("y"), col("x1"), col("x2")).collect()(0)
    assert(math.abs(rn.getDouble(2) - 2.0) < 0.1)
    assert(math.abs(rn.getDouble(3) + 5.0) < 0.1)
    assert(rn.getDouble(4) > 0.9 && rn.getDouble(4) < 1.0)
  }

  test("trimmedMean cuts exactly floor(frac*n) per tail on a unique order") {
    // 20 rows, frac=0.1 → drop lowest 2 and highest 2; values 1..20 so
    // the kept sum is 3+..+18 = 168
    val df = (1 to 20).map(i => ("g", i.toLong, i.toLong)).toDF("grp", "v", "id")
    val r = Stats.trimmedMean(df, Seq("grp"), col("v"), col("id"), 0.1).collect()(0)
    assert(r.getLong(1) == 20 && r.getLong(2) == 16)
    assert(r.getAs[Long]("sum_v") == 168L)
    // ties straddling the cut: all-equal values — the tiebreak makes the
    // cut positional, n_kept is still exactly n - 2*floor(frac*n)
    val ties = (1 to 17).map(i => ("g", 5L, i.toLong)).toDF("grp", "v", "id")
    val rt = Stats.trimmedMean(ties, Seq("grp"), col("v"), col("id"), 0.1).collect()(0)
    assert(rt.getLong(2) == 17 - 2 && math.abs(rt.getDouble(4) - 5.0) < 1e-12)
    // frac=0 degenerates to the plain mean
    val r0 = Stats.trimmedMean(df, Seq("grp"), col("v"), col("id"), 0.0).collect()(0)
    assert(math.abs(r0.getDouble(4) - 10.5) < 1e-12)
  }

  test("fkAudit counts orphans per edge and 0 for a complete edge") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq((10L, 1L), (11L, 2L), (12L, 2L), (13L, 7L), (14L, 9L))
      .toDF("id", "fk")
    val out = Audit.fkAudit(Seq(
      Audit.FkEdge("child.fk->parent", child, "fk", parent, "pk"),
      Audit.FkEdge("parent.pk->parent", parent, "pk", parent, "pk")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("child.fk->parent") == ((5L, 2L)))
    assert(out("parent.pk->parent") == ((3L, 0L)))
  }

  test("lDiversity flags homogeneous groups and hides groups under k") {
    val df = Seq(
      // group (1,1): 3 members, all same segment → size ok, not diverse
      (1, 1, "A"), (1, 1, "A"), (1, 1, "A"),
      // group (2,2): 4 members, 3 segments → diverse
      (2, 2, "A"), (2, 2, "B"), (2, 2, "C"), (2, 2, "A"),
      // group (3,3): 2 members → below k, suppressed from the report
      (3, 3, "A"), (3, 3, "B"))
      .toDF("q1", "q2", "s")
    val out = Privacy.lDiversity(df, Seq("q1", "q2"), "s", k = 3, l = 3)
      .collect().map(r => (r.getInt(0), r.getLong(3), r.getBoolean(4)))
    assert(out.toSet == Set((1, 1L, false), (2, 3L, true)))
  }

  test("foldAssign is deterministic, in-range, and near-uniform") {
    val df = (1 to 5000).map(_.toLong).toDF("k")
    val folds = df.select(Sampling.foldAssign(col("k"), 5).as("f"))
      .groupBy("f").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(folds.keySet == Set(0L, 1L, 2L, 3L, 4L))
    // binomial(5000, 1/5): sd ≈ 28 — allow 5 sd
    folds.values.foreach(c => assert(math.abs(c - 1000L) < 150, s"skewed folds: $folds"))
    // same keys → same folds on a re-evaluation (pure projection)
    val again = df.select(col("k"), Sampling.foldAssign(col("k"), 5).as("f"))
      .except(df.select(col("k"), Sampling.foldAssign(col("k"), 5).as("f")))
    assert(again.count() == 0)
  }

  test("stats aggregates stay map-side combinable (no window over raw rows)") {
    // welchT and ols2 must plan as a single HashAggregate pair over the
    // scan — a Window/Sort before the aggregate would break the 100 TB
    // one-pass shape.
    val df = (1 to 100).map(i => (i % 2 == 0, i.toLong, i.toLong, i.toLong))
      .toDF("g", "v", "x1", "x2")
    for (plan <- Seq(
        Stats.welchT(df, col("g"), col("v")).queryExecution.sparkPlan.toString,
        Stats.ols2(df, col("v"), col("x1"), col("x2")).queryExecution.sparkPlan.toString)) {
      assert(!plan.contains("Window"), s"unexpected Window:\n${plan.take(800)}")
    }
  }
}
