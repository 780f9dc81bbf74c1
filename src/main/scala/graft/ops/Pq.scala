package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization for ANN (Jégou/Douze/Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): split each
  * vector into `m` subvectors, k-means each subspace independently
  * (codebooks of k centroids), store per-vector CODES (m small ints ≈
  * m·log2(k) bits instead of d floats), and answer queries with
  * asymmetric distance computation (ADC): the probe precomputes an
  * m×k table of exact subspace distances, a candidate's approximate
  * distance is the sum of m table lookups.
  *
  * Spark shapes, designed for the 100 TB layout:
  *  - training/encoding touch each vector once per Lloyd step — the
  *    codebook (m·k rows) is always the broadcast side;
  *  - the encoded corpus is m ints per vector: at 100 TB of raw
  *    vectors the code table is ~100–200× smaller, which is the point
  *    — the scan side of a search reads codes, never raw floats;
  *  - ADC per probe is a broadcast of its m×k table joined to the
  *    code table on (sub, cid) + a grouped sum: linear in corpus,
  *    constant in dimension. Distances are quantized to 1e-9 longs
  *    before the fold so the per-candidate sum is order-independent
  *    (house E-257 discipline), making search results bit-stable.
  *
  * Determinism: subspace k-means inits from the k subvectors with
  * smallest xxhash64(seed, vec_id) (the [[Ivf]] discipline), Lloyd
  * means are deterministic per (sub, cid, pos), code assignment
  * tie-breaks on centroid id.
  */
object Pq {

  private def dist2(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.euclideanSq(a, b)

  /** Per-vector subvectors: (vec_id, sub, subvec ARRAY<DOUBLE>). */
  private def subvectors(corpus: DataFrame, m: Int, subDim: Int): DataFrame =
    corpus.select(col("vec_id"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          v => v.cast("double")).as("emb"))
      .select(col("vec_id"), col("sub"),
        slice(col("emb"), col("sub") * subDim + 1, lit(subDim)).as("subvec"))

  /** Train the m codebooks: (sub, cid, centroid ARRAY<DOUBLE>). */
  def trainCodebooks(corpus: DataFrame, m: Int, k: Int, subDim: Int,
      iters: Int, seed: Long = 42L): DataFrame = {
    val subs = subvectors(corpus, m, subDim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    subs.count()
    // init: per subspace, the k subvectors with smallest seeded hash.
    // Every step localCheckpoints (NOT cache) — the Ivf.trainCentroids
    // plan-truncation discipline: a cached codebook keeps `iters` nested
    // Lloyd steps in its logical plan and every consuming action pays
    // their re-analysis in driver time; the checkpoint makes it an
    // m·k-row leaf, and the trailing limit(m·k) re-exposes the
    // structural bound to the plan gate.
    val wInit = Window.partitionBy("sub")
      .orderBy(xxhash64(lit(seed), col("vec_id")), col("vec_id"))
    var codebooks = subs
      .withColumn("rn", row_number().over(wInit))
      .filter(col("rn") <= k)
      .select(col("sub"), (col("rn") - 1).as("cid"),
        col("subvec").as("centroid"))
      .localCheckpoint()
    var it = 0
    while (it < iters) {
      // scalar-only argmin (the Ivf.assign round-12 lesson): carrying
      // `first(subvec)` in the agg buffer forces SortAggregate, and the
      // n·m·k distance rows get EXTERNALLY SORTED per Lloyd iteration
      // (~40 GB at the m100v 16×256 budget); the scalar form
      // hash-aggregates with map-side partials and the subvec rejoins
      // by (vec_id, sub) — one skinny shuffle
      val cids = subs.join(broadcast(codebooks), Seq("sub"))
        .select(col("vec_id"), col("sub"),
          col("cid"), dist2(col("subvec"), col("centroid")).as("d2"))
        .groupBy("vec_id", "sub")
        .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"))
      val assigned = subs.join(cids, Seq("vec_id", "sub"))
      codebooks = assigned
        .select(col("sub"), col("cid"),
          posexplode(col("subvec")).as(Seq("pos", "v")))
        .groupBy("sub", "cid", "pos")
        .agg(avg("v").as("mu"))
        .groupBy("sub", "cid")
        .agg(org.apache.spark.sql.functions.transform(
          array_sort(collect_list(struct(col("pos"), col("mu")))),
          e => e.getField("mu")).as("centroid"))
        .localCheckpoint()
      it += 1
    }
    subs.unpersist(blocking = false)
    // structural bound for the broadcast side: ≤ m·k rows exist
    codebooks.limit(m * k)
  }

  /** Encode the corpus: (vec_id, sub, cid) — m rows per vector. */
  def encode(corpus: DataFrame, codebooks: DataFrame, m: Int,
      subDim: Int): DataFrame =
    subvectors(corpus, m, subDim)
      .join(broadcast(codebooks), Seq("sub"))
      .groupBy("vec_id", "sub")
      .agg(min_by(col("cid"),
        struct(dist2(col("subvec"), col("centroid")), col("cid"))).as("cid"))

  /** Quantized ADC distance of EVERY encoded vector to every probe:
    * (probe_id, vec_id, adq LONG) with adq = Σ_sub round(d²·1e9). The
    * probe's m×k distance table is the broadcast side; the scan side
    * reads only codes.
    */
  def adcDistances(probes: DataFrame, codes: DataFrame, codebooks: DataFrame,
      m: Int, subDim: Int): DataFrame = {
    val ptab = probes
      .select(col("probe_id"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          v => v.cast("double")).as("emb"))
      .select(col("probe_id"), col("sub"),
        slice(col("emb"), col("sub") * subDim + 1, lit(subDim)).as("psub"))
      .join(broadcast(codebooks), Seq("sub"))
      // quantize each table entry so the m-term fold below is
      // order-independent (and thus partitioning-independent)
      .select(col("probe_id"), col("sub"), col("cid"),
        round(dist2(col("psub"), col("centroid")) * 1e9).cast("long").as("dq"))
    codes.join(broadcast(ptab), Seq("sub", "cid"))
      .groupBy("probe_id", "vec_id")
      .agg(sum(col("dq")).as("adq"))
  }

  /** ADC top-k: for each probe (probe_id, embedding), the k nearest
    * encoded vectors by summed subspace-table distance. Output:
    * (probe_id, vec_id, adist DOUBLE, rank).
    */
  def adcTopK(probes: DataFrame, codes: DataFrame, codebooks: DataFrame,
      m: Int, subDim: Int, k: Int): DataFrame = {
    val w = Window.partitionBy("probe_id").orderBy(col("adq"), col("vec_id"))
    adcDistances(probes, codes, codebooks, m, subDim)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("vec_id"),
        (col("adq").cast("double") / 1e9).as("adist"), col("rank"))
  }
}
