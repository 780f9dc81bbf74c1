package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-dimension z-score standardization of a vector column (E-57) —
  * the feature-scaling step before anything distance-based downstream
  * ([[Ivf]] k-means, [[SemDedup]], [[Quantize]]): dimensions with
  * larger raw variance would otherwise dominate every distance.
  *
  * Fully relational: posexplode → per-dimension mean/stddev_pop (a
  * dim-sized table — broadcasts at any scale) → rebuild. Two shuffles
  * total (the dim-stats aggregate and the per-id rebuild), both keyed
  * sensibly; constant plan size in the vector dimension.
  */
object Scaling {

  /** @return (idCol, scaled ARRAY<DOUBLE>) — x'_d = (x_d − μ_d) ∕ σ_d */
  def standardScale(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val x = df
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col(idCol), col("pos"), col("x").cast("double").as("x"))
    val stats = x.groupBy("pos")
      .agg(avg("x").as("mu"), stddev_pop(col("x")).as("sd"))
    x.join(broadcast(stats), "pos")
      .select(col(idCol), col("pos"),
        ((col("x") - col("mu")) / col("sd")).as("z"))
      .groupBy(idCol)
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("z")))),
        e => e.getField("z")).as("scaled"))
  }

  /** Percentile-rank normalization WITHIN groups (E-91): score →
    * (rank − 1) ∕ (n − 1) ∈ [0, 1] per group — the calibration step
    * before comparing or mixing quality scores across domains whose
    * raw scales differ (source A's 0.7 might be source B's 0.4). Rank
    * is row_number over (score, tiebreak), so ties resolve identically
    * in any engine; a 1-row group maps to 0.5 (no spread to rank
    * within). One window shuffle keyed on the group.
    */
  def percentileRank(df: DataFrame, group: org.apache.spark.sql.Column,
      score: org.apache.spark.sql.Column,
      tiebreak: org.apache.spark.sql.Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("graft_pr_g").orderBy(score, tiebreak)
    val wN = org.apache.spark.sql.expressions.Window.partitionBy("graft_pr_g")
    df.withColumn("graft_pr_g", group)
      .withColumn("graft_pr_n", count(lit(1)).over(wN))
      .withColumn("pr",
        when(col("graft_pr_n") > 1,
          (row_number().over(w) - 1).cast("double")
            / (col("graft_pr_n") - 1)).otherwise(lit(0.5)))
      .drop("graft_pr_g", "graft_pr_n")
  }
}
