package graft.ops

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (ARRAY<FLOAT>).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) probe
  * set against a single scan of the corpus, ranked per probe. Spark
  * plans the final `orderBy().limit(k)` as TakeOrderedAndProject
  * (partition-local top-k, no global sort); per-probe ranking uses a
  * window over the probe partition, which shuffles once on probe_id.
  *
  * Scale path: random-hyperplane LSH — each vector gets a `bits`-bit
  * sign code from deterministic pseudo-random hyperplanes; near vectors
  * collide in code space. Probes search only their own bucket ring
  * (multi-probe: all codes within Hamming radius r of the probe code),
  * so the join is an equi-join on code, not a cross product. Recall is
  * property-tested on planted clusters; exactness is NOT claimed — the
  * brute-force operator stays the correctness oracle.
  */
object Similarity {

  /** Brute-force cosine top-k neighbors for every probe row.
    * `probes` must be small (it is broadcast).
    * Output: (probe_id, vec_id, sim, rank) — rank 1..k, ties broken by
    * vec_id, sim rounded to `roundTo` for cross-engine determinism.
    */
  /** Fused native cosine (graft.functions.CosineSimilarity); the
    * builder registers it on the corpus session on first use.
    */
  private def cosineSim(df: DataFrame, a: Column, b: Column): Column = {
    GraftFunctions.register(df.sparkSession)
    call_function("cosine_sim", a, b)
  }

  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int,
      roundTo: Int = 4): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(desc("sim"), asc("vec_id"))
    corpus.crossJoin(broadcast(probes.select(col("vec_id").as("probe_id"),
        col("embedding").as("probe_vec"))))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(cosineSim(corpus, col("embedding"), col("probe_vec")), roundTo).as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Top-`limit` most-similar distinct pairs in the corpus (embedding
    * near-duplicate detection). All-pairs theta-join formulation — the
    * oracle/spec; the production path is [[blockTopPairs]], which
    * computes the identical result without a quadratic join.
    */
  def topSimilarPairs(corpus: DataFrame, limit: Int, roundTo: Int = 4): DataFrame = {
    val a = corpus.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = corpus.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosineSim(corpus, col("va"), col("vb")), roundTo).as("sim"))
      .orderBy(desc("sim"), asc("id_a"), asc("id_b"))
      .limit(limit)
  }

  /** One side-tagged replica of a vector for a block-pair task. */
  case class BlockedVec(lo: Int, hi: Int, blk: Int, id: Long, v: Array[Float])
  case class SimPair(id_a: Long, id_b: Long, sim: Double)

  /** Production formulation of [[topSimilarPairs]]: EXACT global top-k
    * most-similar pairs via block-pair partitioning, hash-identical to
    * the all-pairs oracle.
    *
    * Why not LSH here: global top-k pairs with no similarity floor is
    * only sub-quadratic when the top pairs are separated from the bulk.
    * On this corpus the rank-50 pair sits at cos ≈ 0.41 while the p99 of
    * random pairs is ≈ 0.29 — sign-random-projection collision
    * probabilities there are 0.633 vs 0.597 per bit, so NO banding
    * geometry can recall the top pairs without admitting nearly every
    * pair (and that is the general regime: exact top-k pair mining is
    * inherently O(n²) similarity evaluations). The scalable organization
    * of that work is what matters:
    *
    *  - each vector lands in one of B blocks (hash of its id) and is
    *    replicated to the B block-pair tasks involving its block —
    *    shuffle volume is O(n·B·d), never O(n²);
    *  - each of the B(B+1)/2 tasks holds ≲ 2n/B vectors in memory,
    *    computes its local pairs in a tight double-precision loop, and
    *    keeps only its top `limit` in a bounded heap — task output is
    *    O(B²·limit) rows, so the final global top-k is a
    *    TakeOrderedAndProject over candidates, not a sort of n² rows;
    *  - B tunes memory/parallelism: pick B ≈ 2·n·d·4B / executor-mem so
    *    a task's two blocks fit comfortably; tasks scale horizontally.
    *
    * Cosine + rounding replicate the oracle arithmetic exactly
    * (ascending-index double accumulation, HALF_UP rounding), so the
    * result is bit-equal to [[topSimilarPairs]] — asserted in
    * SimilaritySpec and by ext_sim_pairs sharing the DuckDB oracle.
    */
  def blockTopPairs(corpus: DataFrame, limit: Int, nBlocks: Int = 8,
      roundTo: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val lim = limit
    val rt = roundTo
    val replicas = corpus
      .select(col("vec_id").cast("long").as("id"), col("embedding").as("v"),
        pmod(xxhash64(col("vec_id")), lit(nBlocks)).cast("int").as("blk"))
      .select(col("id"), col("v"), col("blk"),
        explode(sequence(lit(0), lit(nBlocks - 1))).as("other"))
      .select(least(col("blk"), col("other")).as("lo"),
        greatest(col("blk"), col("other")).as("hi"),
        col("blk"), col("id"), col("v"))
      .as[BlockedVec]

    replicas
      .groupByKey(r => (r.lo, r.hi))
      .flatMapGroups { (key: (Int, Int), it: Iterator[BlockedVec]) =>
        val (lo, hi) = key
        val aSide = scala.collection.mutable.ArrayBuffer.empty[BlockedVec]
        val bSide = scala.collection.mutable.ArrayBuffer.empty[BlockedVec]
        it.foreach(r => if (r.blk == lo) aSide += r else bSide += r)
        // heap keeps the `lim` best under (sim desc, id_a asc, id_b asc);
        // its head is the WORST kept pair, evicted on overflow
        val worstFirst: Ordering[SimPair] =
          Ordering.by((p: SimPair) => (-p.sim, p.id_a, p.id_b))
        val heap = scala.collection.mutable.PriorityQueue.empty[SimPair](worstFirst)
        def cosRounded(a: Array[Float], b: Array[Float]): Double = {
          var dot = 0.0; var na = 0.0; var nb = 0.0
          var i = 0
          while (i < a.length) {
            val xi = a(i).toDouble; val yi = b(i).toDouble
            dot += xi * yi; na += xi * xi; nb += yi * yi
            i += 1
          }
          BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
            .setScale(rt, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
        }
        def push(x: BlockedVec, y: BlockedVec): Unit = {
          val s = cosRounded(x.v, y.v)
          val p = if (x.id < y.id) SimPair(x.id, y.id, s) else SimPair(y.id, x.id, s)
          heap += p
          if (heap.size > lim) heap.dequeue()
        }
        if (lo == hi) {
          var i = 0
          while (i < aSide.length) {
            var j = i + 1
            while (j < aSide.length) { push(aSide(i), aSide(j)); j += 1 }
            i += 1
          }
        } else {
          aSide.foreach(x => bSide.foreach(y => push(x, y)))
        }
        heap.toSeq
      }
      .toDF()
      .orderBy(desc("sim"), asc("id_a"), asc("id_b"))
      .limit(limit)
  }

  /** Deterministic `bits`-bit random-hyperplane code for a vector.
    * Hyperplane h, dimension d has pseudo-random weight derived from
    * xxhash64(seed, h, d), mapped to [-1, 1]. Sign of the dot product
    * sets bit h. Pure projection — no shuffle.
    *
    * Production form: the native fused [[graft.functions.HyperplaneCode]]
    * expression (one codegen'd loop/row). The composed built-in
    * formulation below is kept as the spec oracle; the two are
    * property-tested bit-equal.
    */
  def hyperplaneCode(vec: Column, dim: Int, bits: Int, seed: Long = 42L): Column = {
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("hyperplane_code", vec, lit(dim), lit(bits), lit(seed))
  }

  /** Spec formulation of [[hyperplaneCode]] on stock built-ins only. */
  def hyperplaneCodeComposed(vec: Column, dim: Int, bits: Int, seed: Long = 42L): Column = {
    val planes = (0 until bits).map { h =>
      val dotExpr = (0 until dim).map { d =>
        // xxhash64 -> [-1,1] weight; fixed given (seed, h, d)
        val w = (xxhash64(lit(seed), lit(h), lit(d)).cast("double") / lit(Long.MaxValue.toDouble))
        element_at(vec, d + 1).cast("double") * w
      }.reduce(_ + _)
      when(dotExpr > 0, shiftleft(lit(1L), h)).otherwise(0L)
    }
    planes.reduce(_ + _)
  }

  /** ANN candidates by LSH code: probes match corpus vectors whose code
    * is within Hamming distance `radius` of theirs. The code join is an
    * equi-join on a banded split of the code (pigeonhole over radius+1
    * segments), never a cross product.
    */
  def lshCandidates(corpus: DataFrame, probes: DataFrame, dim: Int,
      bits: Int = 16, radius: Int = 3, seed: Long = 42L): DataFrame = {
    val nSeg = radius + 1
    val segBits = bits / nSeg
    // Candidate generation carries ids + codes ONLY — the bucket join and
    // the distinct never shuffle the vectors themselves (at scale the
    // wide embedding arrays dominate shuffle volume; they are joined
    // back exactly once per surviving candidate pair below).
    def coded(df: DataFrame, idAs: String) = df
      .select(col("vec_id").as(idAs),
        hyperplaneCode(col("embedding"), dim, bits, seed).as(s"code_$idAs"))
      .select(col(idAs), col(s"code_$idAs"),
        explode(transform(sequence(lit(0), lit(nSeg - 1)),
          s => struct(s.as("seg"),
            call_function("shiftright", col(s"code_$idAs"), (s * segBits).cast("int"))
              .bitwiseAND(lit((1L << segBits) - 1)).as("sv")))).as("x"))
      .select(col(idAs), col(s"code_$idAs"), col("x.seg"), col("x.sv"))
    val c = coded(corpus, "vec_id").as("c")
    val p = coded(probes, "probe_id").as("p")
    val ids = c.join(p, col("c.seg") === col("p.seg") && col("c.sv") === col("p.sv") &&
        col("c.vec_id") =!= col("p.probe_id"))
      .filter(bit_count(col("c.code_vec_id").bitwiseXOR(col("p.code_probe_id"))) <= radius)
      .select(col("p.probe_id"), col("c.vec_id"))
      .distinct()
    ids
      .join(corpus.select(col("vec_id"), col("embedding")), "vec_id")
      .join(probes.select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec")),
        "probe_id")
      .select(col("probe_id"), col("vec_id"), col("embedding"), col("probe_vec"))
  }

  /** Approximate cosine top-k: rank only the LSH candidate set. */
  def lshTopK(corpus: DataFrame, probes: DataFrame, dim: Int, k: Int,
      bits: Int = 16, radius: Int = 3, seed: Long = 42L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(desc("sim"), asc("vec_id"))
    lshCandidates(corpus, probes, dim, bits, radius, seed)
      .select(col("probe_id"), col("vec_id"),
        round(cosineSim(corpus, col("embedding"), col("probe_vec")), 4).as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
