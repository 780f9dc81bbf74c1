package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seedless random-projection dimensionality reduction (E-82):
  * v′ⱼ = (Σᵢ vᵢ·Rᵢⱼ) ∕ √k with a ±1 Rademacher matrix derived from
  * sha256(i:j) — the Johnson–Lindenstrauss sketch with an RNG-free,
  * engine-reproducible matrix (same trick as `Sampling.hashUniform`:
  * the hash IS the randomness, so any engine regenerates bit-identical
  * R). The standard pre-step before ANN/clustering when 100 TB of
  * wide embeddings won't fit the similarity budget: d → k costs one
  * explode + one broadcast join against the (d·k)-row matrix + one
  * (vec, j) aggregate — all map-side combinable, no shuffle wider
  * than the OUTPUT.
  */
object RandomProjection {

  /** The ±1 projection matrix as a DataFrame (i, j, r) — d·k rows,
    * broadcast-sized for any practical d·k.
    */
  def rademacher(spark: SparkSession, dIn: Int, kOut: Int): DataFrame =
    spark.range(dIn).select(col("id").cast("int").as("i"),
        explode(sequence(lit(0), lit(kOut - 1))).as("j"))
      .withColumn("r",
        when(conv(substring(
            sha2(concat(col("i"), lit(":"), col("j")), 256), 1, 1), 16, 10)
          .cast("int") % 2 === 0, 1.0).otherwise(-1.0))

  /** Project `embedding` (ARRAY, dIn wide) down to kOut dims.
    * @return (idCol, j, v) — one row per output dimension
    */
  def project(df: DataFrame, dIn: Int, kOut: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val r = rademacher(df.sparkSession, dIn, kOut)
    df.select(col(idCol), posexplode(col(vecCol)).as(Seq("i", "x")))
      .join(broadcast(r), "i")
      .groupBy(idCol, "j")
      .agg((sum(col("x") * col("r")) / math.sqrt(kOut.toDouble)).as("v"))
  }
}
