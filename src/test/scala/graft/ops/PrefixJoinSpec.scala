package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the prefix-filtered exact set-similarity join, the
  * sorted-neighborhood blocker, and the bootstrap/benford/calibration
  * helpers (value equality vs DuckDB is the ext_* contracts' job).
  */
class PrefixJoinSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  test("prefix join equals brute-force all-pairs at several thresholds") {
    val rng = new scala.util.Random(17L)
    val vocab = (0 until 40).map(i => s"w$i")
    // overlapping token sets: random subsets plus a few exact clones
    val docs = (0 until 120).map { i =>
      val base = rng.shuffle(vocab).take(5 + rng.nextInt(8))
      (i.toLong, base.mkString(" "))
    } ++ Seq((1000L, "w1 w2 w3 w4"), (1001L, "w1 w2 w3 w4"),
      (1002L, "w1 w2 w3 w4 w5"))
    val df = docs.toDF("doc_id", "text")
    val tok = Dedup.tokenSet(col("text"))
    for ((num, den) <- Seq((4, 5), (1, 2), (9, 10))) {
      val got = PrefixJoin.selfJoin(df, "doc_id", tok, num, den)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val a = df.select(col("doc_id").as("ia"), tok.as("sa"))
      val b = df.select(col("doc_id").as("ib"), tok.as("sb"))
      val brute = a.crossJoin(b).filter(col("ia") < col("ib"))
        .filter(size(array_intersect(col("sa"), col("sb"))).cast("long") * den >=
          size(array_union(col("sa"), col("sb"))).cast("long") * num)
        .select("ia", "ib").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute, s"pair set mismatch at tau=$num/$den")
    }
  }

  test("prefix join emits each pair once and never goes all-pairs") {
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "a b c d f"),
      (4L, "x y z"), (5L, "p q r s t u")).toDF("doc_id", "text")
    val out = PrefixJoin.selfJoin(df, "doc_id", Dedup.tokenSet(col("text")), 4, 5)
    val pairs = out.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == pairs.distinct.length)
    val plan = out.queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"prefix join degenerated to all-pairs:\n${plan.take(1200)}")
  }

  test("sorted neighborhood pairs each row with exactly its w-1 successors") {
    val df = (1 to 20).map(i => (s"blk${i % 2}", f"key$i%02d", i.toLong))
      .toDF("blk", "k", "id")
    val out = Blocking.sortedNeighborhood(df, col("blk"), col("k"), col("id"), 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // per block of 10 sorted rows with w=3: 9 + 8 = 17 pairs
    assert(out.length == 34)
    assert(out.forall { case (_, a, b) => a != b })
    // every pair's keys are within 2 positions in the block's sort order
    val byBlock = out.groupBy(_._1)
    assert(byBlock.keySet == Set("blk0", "blk1"))
    // ids in a block sorted by key ascending == id ascending here
    out.foreach { case (_, a, b) => assert(b > a && b - a <= 4) }
  }

  test("bootstrap CI brackets the mean, widens with alpha, reproduces") {
    val df = (1 to 800).map(i => (i.toLong, (i % 97).toLong * 100)).toDF("k", "v")
    val r = Stats.bootstrapMeanCI(df, col("k"), col("v"), b = 100, alpha = 0.025)
      .collect()(0)
    val (mean, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(lo < mean && mean < hi, s"CI [$lo,$hi] does not bracket $mean")
    // CI must have realistic width: se ≈ sd/sqrt(n) ≈ 2800/28.3 ≈ 99
    assert(hi - lo > 100 && hi - lo < 2000, s"implausible CI width ${hi - lo}")
    val narrow = Stats.bootstrapMeanCI(df, col("k"), col("v"), b = 100, alpha = 0.1)
      .collect()(0)
    assert(narrow.getDouble(2) >= lo && narrow.getDouble(3) <= hi)
    val again = Stats.bootstrapMeanCI(df, col("k"), col("v"), b = 100, alpha = 0.025)
      .collect()(0)
    assert(again.getDouble(2) == lo && again.getDouble(3) == hi)
  }

  test("poisson multiplicities average ~1 so resample sizes center on n") {
    // the CDF fold must test thresholds smallest-first: a wrong order
    // collapses every u to one multiplicity (the round-4 bug)
    val df = (1 to 2000).map(i => (i.toLong, 1L)).toDF("k", "v")
    val r = Stats.bootstrapMeanCI(df, col("k"), col("v"), b = 50, alpha = 0.025)
      .collect()(0)
    // with v≡1 every resample mean is exactly 1 — but only if sizes are
    // sane; also spot-check the CDF is increasing
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0)
    assert(Stats.poisson1Cdf == Stats.poisson1Cdf.sorted)
  }

  test("benford: a perfect Benford sample gets chi2 ~ 0, digits complete") {
    // synthesize counts proportional to log10(1+1/d) by repeating digit
    // d round(10000*p_d) times as the value d (first digit = d)
    val rows = (1 to 9).flatMap { d =>
      val n = math.round(10000 * math.log10(1 + 1.0 / d)).toInt
      Seq.fill(n)(d.toLong)
    }
    val out = Audit.benford(rows.toDF("v"), col("v")).orderBy("digit").collect()
    assert(out.map(_.getLong(0)).toSeq == (1L to 9L))
    assert(out.forall(r => r.getDouble(4) < 1.0), // chi2 tiny for a perfect fit
      s"chi2=${out.head.getDouble(4)}")
    // and a degenerate all-start-with-1 sample blows up
    val bad = Seq.fill(1000)(199L).toDF("v")
    val badChi = Audit.benford(bad, col("v")).collect()(0).getDouble(4)
    assert(badChi > 100)
  }

  test("calibration: perfectly calibrated bins have ece ~ 0") {
    // score s in [-1,1]; positive iff hash-ish alternation with rate
    // (s+1)/2 per bin: use deterministic assignment hitting the rate
    val rows = for {
      bin <- 0 until 8
      i <- 0 until 100
    } yield {
      val s = -1.0 + (bin + 0.5) / 8 * 2 // bin center
      val rate = (s + 1) / 2
      (s, i < math.round(100 * rate))
    }
    val out = Eval.calibration(rows.toDF("score", "pos"),
      col("score"), col("pos"), 8).collect()
    assert(out.length == 8)
    val ece = out.head.getAs[Double]("ece")
    assert(ece < 0.01, s"ece=$ece for a calibrated sample")
    out.foreach { r =>
      assert(r.getLong(1) == 100)
      assert(math.abs(r.getDouble(3) - (r.getDouble(4) + 1) / 2) < 0.006)
    }
  }
}
