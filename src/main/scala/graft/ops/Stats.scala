package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical estimation statistics over exact integer sufficient
  * statistics — the "is this difference real / what drives this
  * measure" toolkit next to the hypothesis-test family in [[Eval]]
  * (two-proportion z, Cohen's κ) and the drift family in [[Drift]].
  *
  * Determinism discipline (SURVEY §5.2): every input measure is
  * fixed-point (cents / basis points / half-rank units) so the big
  * aggregates are EXACT integer sums — associative, partitioning- and
  * engine-independent. The closed-form float arithmetic then runs on a
  * 1-row frame with an identical operation order on both engines, so
  * results pin bit-for-bit after rounding.
  *
  * Scale shapes (100 TB): everything here is one map-side-combinable
  * aggregate over the raw table except Spearman's rank transform, which
  * windows over the ALREADY-AGGREGATED analysis frame (per-key rows,
  * thousands), never the raw table. For a raw-table Spearman at corpus
  * scale, the identical rank sums come from a value-histogram prefix
  * sum exactly like Mann-Whitney's (ExtensionQueries3 scaladoc).
  */
object Stats {

  /** Welch's unequal-variance t-test between two groups of an integer
    * (fixed-point) measure. One conditional-sum aggregate yields n, Σx
    * and Σx² per group; t and the Satterthwaite df are 1-row math:
    * s² = (Σx² − (Σx)²∕n) ∕ (n−1),  t = (m₁−m₂) ∕ √(s₁²∕n₁ + s₂²∕n₂),
    * df = (s₁²∕n₁+s₂²∕n₂)² ∕ ((s₁²∕n₁)²∕(n₁−1) + (s₂²∕n₂)²∕(n₂−1)).
    *
    * @param group      boolean: true = group 1, false = group 2
    * @param valueFixed integer-typed fixed-point measure (e.g. cents);
    *                   Σx² must fit a long — pre-scale if values exceed ~3e6
    * @return one row: (n1, n2, mean1, mean2, t, df) — means in the
    *         fixed-point unit, un-rounded (callers round for contracts)
    */
  def welchT(df: DataFrame, group: Column, valueFixed: Column): DataFrame = {
    val agg = df.agg(
      sum(when(group, 1L).otherwise(0L)).as("n1"),
      sum(when(!group, 1L).otherwise(0L)).as("n2"),
      sum(when(group, valueFixed).otherwise(0L)).as("s1"),
      sum(when(!group, valueFixed).otherwise(0L)).as("s2"),
      sum(when(group, valueFixed * valueFixed).otherwise(0L)).as("q1"),
      sum(when(!group, valueFixed * valueFixed).otherwise(0L)).as("q2"))
    val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
    val m1 = col("s1").cast("double") / n1
    val m2 = col("s2").cast("double") / n2
    val v1 = (col("q1").cast("double") - col("s1").cast("double") * col("s1").cast("double") / n1) / (n1 - 1)
    val v2 = (col("q2").cast("double") - col("s2").cast("double") * col("s2").cast("double") / n2) / (n2 - 1)
    val se1 = v1 / n1; val se2 = v2 / n2
    agg.select(
      col("n1"), col("n2"), m1.as("mean1"), m2.as("mean2"),
      ((m1 - m2) / sqrt(se1 + se2)).as("t"),
      ((se1 + se2) * (se1 + se2)
        / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1))).as("df"))
  }

  /** Average rank in HALF-UNITS: 2·rank + ties − 1 = 2·(midrank). An
    * integer column, so downstream sums are exact; any statistic that
    * is scale-invariant in the ranks (Spearman ρ) is unchanged.
    */
  private def halfRank2(v: Column): Column = {
    val rnk = rank().over(Window.orderBy(v))
    val ties = count(lit(1)).over(Window.partitionBy(v))
    lit(2L) * rnk + ties - 1
  }

  /** Spearman rank correlation between two columns of `df` (ties get
    * shared average ranks, the textbook definition). The rank transform
    * runs on `df` itself — hand this the aggregated analysis frame, not
    * a raw fact table. ρ is Pearson over the integer half-unit ranks:
    * exact sums, then one row of float math.
    *
    * @return one row: (n, rho) with rho un-rounded
    */
  def spearman(df: DataFrame, x: Column, y: Column): DataFrame = {
    val ranked = df.select(x.as("x"), y.as("y"))
      .withColumn("rx", halfRank2(col("x")))
      .withColumn("ry", halfRank2(col("y")))
    val agg = ranked.agg(
      count(lit(1)).as("n"), sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
      sum(col("rx") * col("rx")).as("sxx"),
      sum(col("ry") * col("ry")).as("syy"),
      sum(col("rx") * col("ry")).as("sxy"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
    val num = n * col("sxy").cast("double") - sx * sy
    val den = sqrt(n * col("sxx").cast("double") - sx * sx) *
      sqrt(n * col("syy").cast("double") - sy * sy)
    agg.select(col("n"), (num / den).as("rho"))
  }

  /** Two-feature ordinary least squares y = b0 + b1·x1 + b2·x2 by the
    * normal equations, solved in closed form (Cramer's rule over the
    * centered 2×2 Gram matrix). All sufficient statistics are exact —
    * second-order sums accumulate in decimal(38,0) because Σy² at cents
    * scale overflows a long — so the fit is one pass, map-side
    * combinable, and engine-pinned.
    *
    * @param y,x1,x2 integer-typed fixed-point columns
    * @return one row: (n, b0, b1, b2, r2) un-rounded
    */
  def ols2(df: DataFrame, y: Column, x1: Column, x2: Column): DataFrame = {
    def big(c: Column): Column = sum(c.cast("decimal(38,0)"))
    val agg = df.select(y.as("y"), x1.as("x1"), x2.as("x2")).agg(
      count(lit(1)).as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"), sum(col("y")).as("sy"),
      big(col("x1") * col("x1")).as("s11"),
      big(col("x2") * col("x2")).as("s22"),
      big(col("x1") * col("x2")).as("s12"),
      big(col("x1") * col("y")).as("s1y"),
      big(col("x2") * col("y")).as("s2y"),
      big(col("y").cast("decimal(19,0)") * col("y")).as("syy"))
    val n = col("n").cast("double")
    val m1 = col("s1").cast("double") / n
    val m2 = col("s2").cast("double") / n
    val my = col("sy").cast("double") / n
    // centered second moments: S_ab = Σab − n·ā·b̄
    val c11 = col("s11").cast("double") - n * m1 * m1
    val c22 = col("s22").cast("double") - n * m2 * m2
    val c12 = col("s12").cast("double") - n * m1 * m2
    val c1y = col("s1y").cast("double") - n * m1 * my
    val c2y = col("s2y").cast("double") - n * m2 * my
    val cyy = col("syy").cast("double") - n * my * my
    val det = c11 * c22 - c12 * c12
    val b1 = (c22 * c1y - c12 * c2y) / det
    val b2 = (c11 * c2y - c12 * c1y) / det
    agg.select(col("n"),
      (my - b1 * m1 - b2 * m2).as("b0"), b1.as("b1"), b2.as("b2"),
      ((b1 * c1y + b2 * c2y) / cyy).as("r2"))
  }

  /** Symmetric trimmed mean per group: drop the lowest and highest
    * ⌊frac·n⌋ rows by (value, tiebreak) order — the outlier-robust
    * location estimate between the mean and the median. The cut is
    * positional over a UNIQUE ordering, so both engines keep the
    * identical row multiset even when ties straddle the boundary.
    * One partitioned window + exact integer re-aggregate.
    *
    * @param valueFixed integer fixed-point measure; tiebreak must make
    *                   (valueFixed, tiebreak) unique within each group
    * @return per group: (groupCols, n, n_trimmed, trimmed mean in
    *         fixed-point units as double, un-rounded)
    */
  def trimmedMean(df: DataFrame, groupCols: Seq[String], valueFixed: Column,
      tiebreak: Column, frac: Double): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(valueFixed, tiebreak)
    val cut = df
      .withColumn("__v", valueFixed)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(groupCols.map(col): _*)))
      .withColumn("__k", floor(col("__n") * frac))
      .filter(col("__rn") > col("__k") && col("__rn") <= col("__n") - col("__k"))
    cut.groupBy(groupCols.map(col): _*)
      .agg(max(col("__n")).as("n"), count(lit(1)).as("n_kept"),
        sum(col("__v")).as("sum_v"),
        (sum(col("__v")).cast("double") / count(lit(1))).as("trimmed"))
  }

  /** Exact cumulative probabilities P(Poisson(1) ≤ k), k = 0..6; mass
    * above 7 (< 1e-4) is assigned to 7. Literal doubles so Spark and
    * the SQL oracle parse bit-identical thresholds.
    */
  val poisson1Cdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119)

  /** Deterministic Poisson-bootstrap confidence interval for the mean
    * (E-125): the error bar that needs no distributional assumption,
    * next to the delete-one jackknife (E-104). Each of `b` resamples
    * gives row r multiplicity ~ Poisson(1) — the classic bootstrap
    * approximation that never materializes a resample: multiplicity is
    * a PURE FUNCTION of sha256(key ':' rep), so the draw is
    * engine-reproducible, partitioning-independent, and auditable,
    * like every sampler in [[Sampling]].
    *
    * Scale shape: one narrow explode to b·n rows (no shuffle), one
    * keyed aggregate to b rows of exact integer (Σm, Σm·v), then the
    * percentile pick orders b rows. The interval is the ⌈α·b⌉-th and
    * ⌈(1−α)·b⌉-th smallest resample means — positional over b, no
    * float percentile interpolation.
    *
    * @param valueFixed integer fixed-point measure
    * @param alpha      e.g. 0.025 for a 95% interval
    * @return one row: (reps, mean, ci_lo, ci_hi) — fixed-point units,
    *         un-rounded
    */
  def bootstrapMeanCI(df: DataFrame, key: Column, valueFixed: Column,
      b: Int, alpha: Double): DataFrame = {
    require(b >= 40 && alpha > 0 && alpha < 0.5)
    val rows = df.select(key.cast("string").as("__k"), valueFixed.as("__v"))
      .withColumn("__b", explode(sequence(lit(0), lit(b - 1))))
    // u = first 32 hash bits / 2^32: exact in double, uniform on [0,1)
    val u = conv(substring(
        sha2(concat(col("__k"), lit(":"), col("__b").cast("string")), 256),
        1, 8), 16, 10).cast("long").cast("double") / 4294967296.0
    // reversed fold so the k=0 threshold is the OUTERMOST when — the
    // chain must test the smallest threshold first
    val mult = poisson1Cdf.zipWithIndex.reverse.foldLeft(lit(7)) {
      case (acc, (t, k)) => when(u < t, k).otherwise(acc)
    }
    val means = rows.withColumn("__m", mult.cast("long"))
      .groupBy("__b")
      .agg(sum(col("__m")).as("__n"), sum(col("__m") * col("__v")).as("__s"))
      .select(col("__b"),
        (col("__s").cast("double") / col("__n")).as("__mean"))
      .withColumn("__r", row_number().over(
        Window.orderBy(col("__mean"), col("__b")))) // b rows — tiny sort
    val loIdx = math.ceil(alpha * b).toLong
    val hiIdx = math.ceil((1 - alpha) * b).toLong
    val full = df.agg(count(lit(1)).as("__cn"), sum(valueFixed).as("__cs"))
      .select((col("__cs").cast("double") / col("__cn")).as("mean"))
    full.crossJoin(
        means.agg(
          sum(when(col("__r") === loIdx, col("__mean"))).as("ci_lo"),
          sum(when(col("__r") === hiIdx, col("__mean"))).as("ci_hi")))
      .select(lit(b.toLong).as("reps"), col("mean"), col("ci_lo"), col("ci_hi"))
  }
}
