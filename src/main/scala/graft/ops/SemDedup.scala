package graft.ops

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (E-49, Abbas et al. 2023):
  * cluster the embedding space with k-means, then search for
  * high-cosine duplicate pairs WITHIN each cluster only — the cluster
  * id turns the quadratic all-pairs comparison into an equi-join, the
  * same shape that makes MinHash-LSH ([[Dedup]]) and IVF ([[Ivf]])
  * scale: at 100 TB the lists are partitions and no vector ever meets a
  * vector from another cluster.
  *
  * Semantics contract (what the oracle pins): duplicates above the
  * threshold must co-cluster for the scoped search to equal the global
  * one. Exact copies always do — k-means assignment is a deterministic
  * function of the vector (min_by over (distance, cid), ties to the
  * lowest cid), so identical vectors land identically. For merely-near
  * vectors recall is approximate by design — SemDeDup's trade — and the
  * gated query uses a threshold (0.99) far above the corpus' max
  * non-identical cosine (~0.51 in the fixture), making the scoped
  * result provably equal to the all-pairs oracle.
  */
object SemDedup {

  /** Within-cluster duplicate pairs (keeper = lower vec_id): returns
    * (keeper, dup_id, cos). Compose with [[ConnectedComponents]] when
    * transitive cliques need a single representative.
    *
    * @param vectors (vec_id, embedding) — vec_id unique
    * @param k       number of k-means clusters (the parallelism knob:
    *                expected within-cluster pair work is n²/k)
    */
  def clusterScopedDupPairs(vectors: DataFrame, k: Int, iters: Int,
      tau: Double, seed: Long = 42L): DataFrame = {
    GraftFunctions.register(vectors.sparkSession)
    val assigned = Ivf.assign(vectors,
      Ivf.trainCentroids(vectors, k, iters, seed))
    val a = assigned.select(col("cid"), col("vec_id").as("keeper"),
      col("embedding").as("ea"))
    val b = assigned.select(col("cid"), col("vec_id").as("dup_id"),
      col("embedding").as("eb"))
    a.join(b, Seq("cid"))
      .filter(col("keeper") < col("dup_id"))
      .select(col("keeper"), col("dup_id"),
        call_function("cosine_sim", col("ea"), col("eb")).as("cos"))
      .filter(col("cos") >= tau)
  }
}
