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
}
