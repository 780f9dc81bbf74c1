package graft.ops

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF×PQ composed ANN — the production search form (IVFADC in
  * Jégou/Douze/Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011 §IV): the coarse quantizer of [[Ivf]] routes a
  * probe to `nProbe` inverted lists, and inside those lists candidates
  * are scored by asymmetric distance over [[Pq]] codes of the RESIDUAL
  * (vector − its coarse centroid), never raw floats. The round-12
  * measured curve showed why the composition matters: raw-float IVF
  * needs nProbe ≈ kCentroids for full recall on realistic geometry,
  * while flat PQ scans the whole corpus — IVFADC prunes to the probed
  * lists AND reads ~m bytes per candidate.
  *
  * Residual encoding (not raw-vector PQ) is deliberate: residuals are
  * centered near 0 with far smaller spread than the raw vectors, so a
  * fixed code budget quantizes them with less error — the standard
  * IVFADC accuracy argument. The cost is that a probe's ADC table
  * depends on WHICH list it probes (its residual differs per list), so
  * the table is per-(probe, probed list): nProbe·m·k rows per probe,
  * still broadcast-sized for any sane probe panel.
  *
  * 100 TB layout: `codes` is the scan side — m small ints per vector,
  * partitioned by the coarse `cid` exactly like [[Ivf.IvfIndex.lists]]
  * (each inverted list a filesystem partition; a probe reads `nProbe`
  * directories of CODES, ~100–200× smaller than the raw vectors). The
  * raw corpus is touched only by the optional exact re-rank, a keyed
  * join fetching `refine` rows per probe.
  *
  * Determinism: both quantizers inherit the seeded-hash init and
  * tie-break discipline of [[Ivf]]/[[Pq]]; ADC distances quantize to
  * 1e-9 longs before the sum so the per-candidate fold is
  * order-independent (E-257 discipline), and every rank window
  * tie-breaks on vec_id.
  */
object IvfPq {

  private def dist2(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.euclideanSq(a, b)

  /** A composed index: the coarse quantizer's centroids, the shared
    * residual codebooks (m·k rows — always the broadcast side), and
    * the coded inverted lists (cid, vec_id, sub, code) — m rows per
    * vector, partitioned by cid in storage.
    */
  final case class IvfPqIndex(centroids: DataFrame, codebooks: DataFrame,
      codes: DataFrame)

  /** Residuals of an assigned corpus: (vec_id, cid, embedding =
    * vector − centroid[cid]) — the PQ training/encoding input.
    */
  private def residuals(assigned: DataFrame, centroids: DataFrame): DataFrame =
    assigned.select(col("vec_id"), col("cid"), col("embedding"))
      .join(broadcast(centroids), Seq("cid"))
      .select(col("vec_id"), col("cid"),
        zip_with(col("embedding"), col("centroid"),
          (x, c) => x.cast("double") - c).as("embedding"))

  /** Train coarse + residual quantizers and encode the corpus.
    *
    * @param corpus     (vec_id, embedding) — embedding of dim m·subDim
    * @param kCentroids coarse lists (√n is the usual starting point)
    * @param m          PQ subspaces (code bytes per vector at k ≤ 256)
    * @param kCodes     centroids per subspace codebook
    * @param subDim     dimensions per subspace
    */
  def buildIndex(corpus: DataFrame, kCentroids: Int, m: Int, kCodes: Int,
      subDim: Int, iters: Int = 3, seed: Long = 42L): IvfPqIndex = {
    val centroids = Ivf.trainCentroids(corpus, kCentroids, iters, seed)
    val assigned = Ivf.assign(corpus, centroids)
      .select("vec_id", "cid", "embedding")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val res = residuals(assigned, centroids)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    res.count()
    // ONE shared codebook over all residuals (standard IVFADC): the
    // residual distribution is roughly list-independent once centered,
    // and a shared book keeps the broadcast side at m·k rows
    val codebooks = Pq.trainCodebooks(res.select("vec_id", "embedding"),
      m, kCodes, subDim, iters, seed)
    // localCheckpoint, not persist: the index frames outlive this call
    // and every search action would otherwise re-analyze the full
    // training lineage kept alive by a cached frame's logical plan
    // (the Ivf.trainCentroids discipline — measured 30-50 s of driver
    // time PER SEARCH at 2000 vectors before the truncation)
    val codes = Pq.encode(res.select("vec_id", "embedding"), codebooks,
      m, subDim)
      .withColumnRenamed("cid", "code")
      .join(assigned.select("vec_id", "cid"), "vec_id")
      .select("cid", "vec_id", "sub", "code")
      .localCheckpoint()
    val out = IvfPqIndex(centroids, codebooks, codes)
    res.unpersist(blocking = false)
    assigned.unpersist(blocking = false)
    out
  }

  /** Persist: three parquet datasets, codes partitioned by cid (the
    * inverted-list layout — a probe's pruned scan reads nProbe dirs).
    */
  def save(index: IvfPqIndex, path: String): Unit = {
    index.centroids.write.mode("overwrite").parquet(s"$path/centroids")
    index.codebooks.write.mode("overwrite").parquet(s"$path/codebooks")
    index.codes.write.mode("overwrite").partitionBy("cid")
      .parquet(s"$path/codes")
  }

  def load(spark: org.apache.spark.sql.SparkSession,
      path: String): IvfPqIndex =
    IvfPqIndex(
      spark.read.parquet(s"$path/centroids"),
      spark.read.parquet(s"$path/codebooks"),
      spark.read.parquet(s"$path/codes"))

  /** ADC search: candidates from the probed lists only, scored by the
    * m-term table sum. Output (probe_id, vec_id, adist DOUBLE, rank).
    */
  def searchAdc(index: IvfPqIndex, probes: DataFrame, k: Int, nProbe: Int,
      m: Int, subDim: Int): DataFrame = {
    val ptab0 = probeCodeTables(index, probes, nProbe, m, subDim)
      .drop("probe_vec")
    // the table side is nprobes·nProbe·m·k rows — broadcast-sized for a
    // typical probe panel, but a big panel at a production code budget
    // (e.g. 200 probes × nProbe 32 × 16×256 books = 26M rows) must
    // shuffle-join on (cid, sub, code) instead; the probe count is the
    // cheap side to measure
    val tabRows = probes.count() * nProbe.toLong * index.codebooks.count()
    val ptab = if (tabRows <= 4000000L) broadcast(ptab0) else ptab0
    val w = Window.partitionBy("probe_id").orderBy(col("adq"), col("vec_id"))
    index.codes.join(ptab, Seq("cid", "sub", "code"))
      .groupBy("probe_id", "vec_id")
      .agg(sum("dq").as("adq"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("vec_id"),
        (col("adq").cast("double") / 1e9).as("adist"), col("rank"))
  }

  /** Per-(probe, list, sub, CODE) tables — the join-ready form of
    * [[probeTables]]: one row per codebook entry a candidate code can
    * hit, keyed exactly like `codes`.
    */
  private def probeCodeTables(index: IvfPqIndex, probes: DataFrame,
      nProbe: Int, m: Int, subDim: Int): DataFrame = {
    val wProbe = Window.partitionBy("probe_id").orderBy(asc("d"), asc("cid"))
    val routed = probes
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
      .crossJoin(broadcast(index.centroids))
      .select(col("probe_id"), col("probe_vec"), col("cid"), col("centroid"),
        dist2(col("probe_vec"), col("centroid")).as("d"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nProbe)
      .select(col("probe_id"), col("probe_vec"), col("cid"),
        zip_with(col("probe_vec"), col("centroid"),
          (x, c) => x.cast("double") - c).as("pres"))
    val books = index.codebooks
      .select(col("sub"), col("cid").as("code"), col("centroid"))
    routed
      .select(col("probe_id"), col("probe_vec"), col("cid"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"), col("pres"))
      .select(col("probe_id"), col("probe_vec"), col("cid"), col("sub"),
        slice(col("pres"), col("sub") * subDim + 1, lit(subDim)).as("psub"))
      .join(broadcast(books), Seq("sub"))
      .select(col("probe_id"), col("probe_vec"), col("cid"), col("sub"),
        col("code"),
        round(dist2(col("psub"), col("centroid")) * 1e9).cast("long").as("dq"))
  }

  /** Production search: ADC prunes each probe's candidates to the
    * `refine` best, then an EXACT cosine re-rank over the raw vectors
    * of just those candidates orders the final top-k — the scan reads
    * codes, the keyed re-rank join reads `refine` raw rows per probe.
    * With `refine` ≥ the probed-list population this degrades to
    * [[Ivf.search]] semantics exactly (re-rank IS the exact scoring).
    * Output (probe_id, vec_id, sim, rank) — [[Ivf.search]]'s shape.
    */
  def search(index: IvfPqIndex, corpus: DataFrame, probes: DataFrame,
      k: Int, nProbe: Int, m: Int, subDim: Int,
      refine: Int = 0): DataFrame = {
    GraftFunctions.register(probes.sparkSession)
    val r = if (refine > 0) refine else 4 * k
    val cand = searchAdc(index, probes, k = r, nProbe = nProbe,
      m = m, subDim = subDim)
    val w = Window.partitionBy("probe_id").orderBy(desc("sim"), asc("vec_id"))
    cand.select("probe_id", "vec_id")
      .join(corpus.select(col("vec_id"), col("embedding")), "vec_id")
      .join(probes.select(col("vec_id").as("probe_id"),
        col("embedding").as("probe_vec")), "probe_id")
      .select(col("probe_id"), col("vec_id"),
        round(call_function("cosine_sim", col("embedding"), col("probe_vec")),
          4).as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
