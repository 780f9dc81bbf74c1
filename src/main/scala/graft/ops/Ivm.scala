package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for a grouped join view
  * V = γ_{g, sum(m), count}(L ⋈_k R) (SURVEY §2, E-110).
  *
  * The delta algebra: with base relations L₀, R₀ and insert deltas
  * ΔL, ΔR,
  *
  *   Δ(L ⋈ R) = (ΔL ⋈ R₀) ∪ (L₀ ⋈ ΔR) ∪ (ΔL ⋈ ΔR)
  *
  * and because sum/count are mergeable, the grouped view folds the
  * delta partials into the materialized state with one full-outer
  * merge on the group key — the view is never recomputed from
  * scratch. At 100 TB this is THE point: a daily refresh touches
  * |Δ|·(join fan-out) rows, not |L|+|R|; bucket both base tables on
  * the join key and the three delta joins are shuffle-free, leaving
  * one small shuffle on the group key.
  *
  * Money-typed measures must be FIXED-POINT (integer cents or
  * DECIMAL): a float measure summed via two different association
  * orders (incremental vs recompute) drifts by ulps, so "view equals
  * recompute" only holds exactly when the partial sums are exact —
  * the same reason lakehouse engines keep additive money columns in
  * DECIMAL, not DOUBLE.
  */
object Ivm {

  /** Partial aggregates of the three delta joins, merged per group. */
  def deltaGroups(oldLeft: DataFrame, deltaLeft: DataFrame,
      oldRight: DataFrame, deltaRight: DataFrame,
      joinKey: String, groupCol: String, measureCol: String): DataFrame = {
    val parts = deltaLeft.join(oldRight, joinKey)
      .unionAll(oldLeft.join(deltaRight, joinKey))
      .unionAll(deltaLeft.join(deltaRight, joinKey))
    parts.groupBy(groupCol)
      .agg(sum(measureCol).as("d_sum"), count(lit(1)).as("d_cnt"))
  }

  /** Fold a delta-partial frame into the materialized view state
    * (groupCol, v_sum, v_cnt). Groups touched only by the delta
    * appear via the full-outer side; untouched groups pass through.
    */
  def merge(view: DataFrame, delta: DataFrame, groupCol: String): DataFrame =
    view.join(delta, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("v_sum"), lit(0L)) + coalesce(col("d_sum"), lit(0L)))
          .as("v_sum"),
        (coalesce(col("v_cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L)))
          .as("v_cnt"))

  /** Build the initial materialized state from the base relations. */
  def initial(oldLeft: DataFrame, oldRight: DataFrame,
      joinKey: String, groupCol: String, measureCol: String): DataFrame =
    oldLeft.join(oldRight, joinKey)
      .groupBy(groupCol)
      .agg(sum(measureCol).as("v_sum"), count(lit(1)).as("v_cnt"))
}
