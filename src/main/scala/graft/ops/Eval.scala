package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality evaluation (E-66): AUC-ROC as the Mann–Whitney
  * rank-sum statistic — the probability that a random positive
  * outscores a random negative:
  *
  *   AUC = (Σ_pos avgrank(score) − n⁺(n⁺+1)/2) ∕ (n⁺ n⁻)
  *
  * with average ranks over ties (min-rank + (tiecount−1)/2), the
  * textbook tie treatment. Callers should rank on a ROUNDED score so
  * cross-engine float noise cannot reorder near-ties — given equal
  * rounded scores the statistic is exact rational arithmetic.
  *
  * One sort-shuffle for the global rank window (scores are
  * evaluation-set-sized, not corpus-sized), one tie-count window on
  * the same order, one final aggregate.
  */
object Eval {

  /** @return one row: (n_pos, n_neg, auc) */
  def auc(df: DataFrame, score: Column, isPositive: Column): DataFrame = {
    val wRank = Window.orderBy("graft_auc_s")
    val wTies = Window.partitionBy("graft_auc_s")
    df.select(score.as("graft_auc_s"), isPositive.as("graft_auc_p"))
      .withColumn("graft_auc_r",
        rank().over(wRank) + (count(lit(1)).over(wTies) - 1) / 2.0)
      .agg(
        sum(when(col("graft_auc_p"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("graft_auc_p"), 1L).otherwise(0L)).as("n_neg"),
        ((sum(when(col("graft_auc_p"), col("graft_auc_r")))
          - sum(when(col("graft_auc_p"), 1L).otherwise(0L))
            * (sum(when(col("graft_auc_p"), 1L).otherwise(0L)) + 1) / 2.0)
          / (sum(when(col("graft_auc_p"), 1L).otherwise(0L))
            * sum(when(!col("graft_auc_p"), 1L).otherwise(0L)))).as("auc"))
  }
}
