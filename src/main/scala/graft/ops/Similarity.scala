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
    * near-duplicate detection). All-pairs formulation — the oracle/spec;
    * use [[lshTopKCandidates]]-style bucketing at scale.
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
