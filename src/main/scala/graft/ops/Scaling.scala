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
}
