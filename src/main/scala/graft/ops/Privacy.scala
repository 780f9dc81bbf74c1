package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity by suppression (E-53): drop every row whose
  * quasi-identifier combination occurs fewer than k times — the
  * release-gating privacy primitive complementing PII scrubbing
  * ([[graft.text.TextAnalysis.scrub]]): scrub removes direct
  * identifiers, k-anonymity suppresses rows that remain re-identifiable
  * through rare attribute combinations.
  *
  * Scale shape: one count aggregate on the quasi columns + a LEFT SEMI
  * join back on the same keys — both sides hash-partition identically,
  * so AQE plans the join without a second shuffle of the big side
  * beyond the aggregate's own.
  */
object Privacy {

  def kAnonymize(df: DataFrame, quasi: Seq[String], k: Long): DataFrame = {
    val safe = df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("graft_kanon_n"))
      .filter(col("graft_kanon_n") >= k)
      .select(quasi.map(col): _*)
    df.join(safe, quasi, "left_semi")
  }

  /** l-diversity audit (E-120): k-anonymity's necessary complement —
    * a group can be k-anonymous yet leak its sensitive attribute when
    * every member shares one value (the homogeneity attack). Reports,
    * per quasi-identifier group of size ≥ k, the number of DISTINCT
    * sensitive values l and whether it clears the `l` floor.
    *
    * Scale shape: one groupBy on the quasi columns with
    * count + count_distinct — a single keyed shuffle; the distinct
    * count is exact (release gating must not be approximate).
    */
  def lDiversity(df: DataFrame, quasi: Seq[String], sensitive: String,
      k: Long, l: Long): DataFrame =
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitive)).as("l"))
      .filter(col("n") >= k)
      .withColumn("diverse", col("l") >= l)
}
