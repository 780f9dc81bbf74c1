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

  /** Two-proportion z-test (E-79): the A/B-test primitive —
    * z = (p₁ − p₂) ∕ √(p̂(1−p̂)(1∕n₁ + 1∕n₂)) with the pooled
    * proportion p̂, the standard large-sample success-rate comparison.
    * One conditional-count aggregate per input pass (map-side
    * combinable); the z arithmetic is a 1-row projection.
    *
    * @param group   boolean column: true = variant A, false = variant B
    * @param success boolean column: the measured conversion
    * @return one row: (n_a, x_a, n_b, x_b, p_a, p_b, z)
    */
  def twoProportionZ(df: DataFrame, group: Column,
      success: Column): DataFrame = {
    val na = sum(when(group, 1L).otherwise(0L)).cast("double")
    val nb = sum(when(!group, 1L).otherwise(0L)).cast("double")
    val xa = sum(when(group && success, 1L).otherwise(0L)).cast("double")
    val xb = sum(when(!group && success, 1L).otherwise(0L)).cast("double")
    val pooled = (xa + xb) / (na + nb)
    df.agg(
      na.cast("long").as("n_a"), xa.cast("long").as("x_a"),
      nb.cast("long").as("n_b"), xb.cast("long").as("x_b"),
      (xa / na).as("p_a"), (xb / nb).as("p_b"),
      ((xa / na - xb / nb)
        / sqrt(pooled * (lit(1.0) - pooled) * (lit(1.0) / na + lit(1.0) / nb)))
        .as("z"))
  }

  /** Cohen's kappa (E-72): chance-corrected agreement between two
    * binary raters — κ = (p_o − p_e) ∕ (1 − p_e), where p_o is the
    * observed agreement rate and p_e = p_A⁺p_B⁺ + p_A⁻p_B⁻ the
    * agreement expected if the raters were independent. The standard
    * check before trusting any labeling rule pair (annotator vs
    * heuristic, old model vs new). Single aggregate, one pass, exact
    * rational arithmetic over counts — map-side combinable.
    *
    * @return one row: (n, p_o, p_e, kappa)
    */
  def cohenKappa(df: DataFrame, raterA: Column, raterB: Column): DataFrame = {
    val n = count(lit(1)).cast("double")
    val pa = sum(when(raterA, 1L).otherwise(0L)) / n
    val pb = sum(when(raterB, 1L).otherwise(0L)) / n
    val po = sum(when(raterA === raterB, 1L).otherwise(0L)) / n
    val pe = pa * pb + (lit(1.0) - pa) * (lit(1.0) - pb)
    df.agg(count(lit(1)).as("n"), po.as("p_o"), pe.as("p_e"),
      ((po - pe) / (lit(1.0) - pe)).as("kappa"))
  }

  /** Decile gains / lift table (E-131): the targeting view of a
    * ranking score — cut the scored population into nTiles equal
    * buckets by descending score and report, per tile, the positive
    * count, the cumulative capture rate (share of ALL positives found
    * so far), and the lift over the base rate. ntile over a UNIQUE
    * (score desc, tiebreak) order is positional, so both engines cut
    * the identical row multiset.
    *
    * One sort-shuffle over the evaluation set (scores are
    * evaluation-sized, not corpus-sized), then nTiles rows of exact
    * integer arithmetic.
    *
    * @return per tile: (tile, n, pos, cum_pos, capture, lift) un-rounded
    */
  def gains(df: DataFrame, score: Column, isPositive: Column,
      tiebreak: Column, nTiles: Int): DataFrame = {
    require(nTiles >= 2)
    val tiled = df.select(score.as("__s"),
        when(isPositive, 1L).otherwise(0L).as("__p"), tiebreak.as("__t"))
      .withColumn("tile", ntile(nTiles).over(
        Window.orderBy(col("__s").desc, col("__t"))))
    val per = tiled.groupBy("tile")
      .agg(count(lit(1)).as("n"), sum(col("__p")).as("pos"))
    val wCum = Window.orderBy("tile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    per.withColumn("cum_pos", sum(col("pos")).over(wCum))
      .withColumn("capture",
        col("cum_pos").cast("double") / sum(col("pos")).over(wAll))
      .withColumn("lift",
        (col("pos").cast("double") / col("n")) /
          (sum(col("pos")).over(wAll).cast("double") / sum(col("n")).over(wAll)))
  }

  /** Calibration / reliability bins (E-127): does a score of 0.8 mean
    * an 80% positive rate? Scores in [−1, 1] (cosine convention) are
    * cut into nBins equal bins; each bin reports its count, positive
    * rate, and mean score, plus the expected calibration error
    * ECE = Σ_b (n_b∕N)·|pos_rate_b − mean01_b| as a constant column
    * (mean01 = the bin's mean score mapped to [0,1] so both terms live
    * on the probability scale).
    *
    * Determinism: the mean score per bin sums ROUND(score·10⁶) longs —
    * exact integer aggregation, no FP order dependence — and the ECE
    * folds over ≤ nBins rows of settled doubles. One keyed aggregate
    * over the scored set; the ECE window spans nBins rows, not data.
    *
    * @return per non-empty bin: (bin, n, n_pos, pos_rate, mean_score, ece)
    *         un-rounded
    */
  def calibration(df: DataFrame, score: Column, isPositive: Column,
      nBins: Int): DataFrame = {
    require(nBins >= 2)
    val s6 = round(score * 1e6).cast("long") // fixed-point, exact sums
    val bin = least(greatest(
      floor((score + 1.0) / 2.0 * nBins).cast("long"), lit(0L)), lit(nBins - 1L))
    val per = df.select(bin.as("bin"), s6.as("s6"),
        when(isPositive, 1L).otherwise(0L).as("p"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("p")).as("n_pos"),
        sum(col("s6")).as("ss6"))
    val posRate = col("n_pos").cast("double") / col("n")
    val mean = col("ss6").cast("double") / col("n") / 1e6
    val mean01 = (mean + 1.0) / 2.0
    val wAll = Window.partitionBy()
    per.select(col("bin"), col("n"), col("n_pos"),
        posRate.as("pos_rate"), mean.as("mean_score"),
        (col("n").cast("double") / sum(col("n")).over(wAll) *
          abs(posRate - mean01)).as("__e"))
      .withColumn("ece", sum(col("__e")).over(wAll))
      .drop("__e")
  }
}
