package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PQ quality on CLUSTERED data (SURVEY E-423). The driver-fixture
  * oracle row (ext_pq) pins the ADC lower-bound invariant on uniform
  * unit vectors; this spec measures retrieval QUALITY where geometry
  * exists — GenScale's 10 planted clusters — and determinism of the
  * whole train→encode→search path.
  */
class PqSpec extends AnyFunSuite with SparkFixture {

  private val m = 4; private val subDim = 16

  private lazy val vecs =
    graft.tools.GenScale.embeddingsDf(spark, 500L).cache()

  private lazy val codebooks =
    Pq.trainCodebooks(vecs, m, k = 16, subDim, iters = 2)
  private lazy val codes = Pq.encode(vecs, codebooks, m, subDim)

  test("codes are complete: m small ints per vector") {
    // Lloyd may EMPTY a centroid when true cluster count < k (10
    // planted clusters vs 16 centroids here) — dropped means are
    // standard k-means behavior and harmless to ADC (the codebook is
    // whatever survives); the invariants are per-subspace presence
    // and full encoding coverage
    val perSub = codebooks.groupBy("sub").count().collect()
    assert(perSub.length == m, s"missing subspaces: ${perSub.length} of $m")
    perSub.foreach(r => assert(r.getLong(1) >= 1L && r.getLong(1) <= 16L))
    assert(codes.count() == 500L * m)
    val cidRange = codes.agg(min("cid"), max("cid")).head()
    assert(cidRange.getInt(0) >= 0 && cidRange.getInt(1) < 16)
  }

  test("ADC neighbors are label-pure on clustered data") {
    // 20 probes (vectors 0..19, 2 per planted cluster): among each
    // probe's ADC top-5 (self excluded) count label matches. With
    // between-cluster distance ~3.5x within-cluster, 4x16-dim
    // codebooks keep clusters separated — purity must be ~perfect.
    val probes = vecs.filter(col("vec_id") < 20)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val top = Pq.adcTopK(probes, codes, codebooks, m, subDim, k = 6)
      .filter(col("vec_id") =!= col("probe_id"))
    val purity = top
      .join(vecs.select(col("vec_id").as("probe_id"),
        col("label").as("probe_label")), Seq("probe_id"))
      .join(vecs.select(col("vec_id"), col("label")), Seq("vec_id"))
      .agg(avg(when(col("label") === col("probe_label"), 1.0)
        .otherwise(0.0)).as("purity"))
      .head().getDouble(0)
    info(f"ADC top-5 label purity on planted clusters: $purity%.3f")
    assert(purity >= 0.95, f"purity $purity%.3f — PQ lost the planted clusters")
  }

  test("train -> encode -> search is deterministic across builds") {
    val cb2 = Pq.trainCodebooks(vecs, m, k = 16, subDim, iters = 2)
    val codes2 = Pq.encode(vecs, cb2, m, subDim)
    assert(codes.exceptAll(codes2).isEmpty && codes2.exceptAll(codes).isEmpty)
  }
}
