package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Referential-integrity audit (E-121): for each declared foreign-key
  * edge, count the child rows whose key has no parent — the first check
  * a data-ops team runs after any ingest, and the one that catches
  * truncated dimension loads before a join silently drops fact rows.
  *
  * Scale shape: one LEFT ANTI join per edge, each a plain keyed shuffle
  * (or broadcast when the parent is a small dim — Catalyst picks); the
  * total count is a separate aggregate over the same scan. Everything
  * stays declarative — the per-edge results are 1-row frames joined by
  * a broadcast cross join and unioned, so a single action runs the
  * whole audit and edges parallelize as independent stages. No
  * driver-side counting.
  */
object Audit {

  /** One audited FK edge: child.childKey → parent.parentKey. */
  final case class FkEdge(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String)

  /** Audit every edge; returns (edge, total_rows, orphans, orphan_pct)
    * with orphan_pct un-rounded (callers round for contracts).
    */
  def fkAudit(edges: Seq[FkEdge]): DataFrame =
    edges.map { e =>
      val total = e.child.agg(count(lit(1)).as("total_rows"))
      val orphans = e.child
        .join(e.parent.select(col(e.parentKey).as(e.childKey)),
          Seq(e.childKey), "left_anti")
        .agg(count(lit(1)).as("orphans"))
      total.crossJoin(orphans) // two 1-row frames — broadcast, no shuffle
        .select(lit(e.name).as("edge"), col("total_rows"), col("orphans"),
          (col("orphans").cast("double") / col("total_rows")).as("orphan_pct"))
    }.reduce(_ unionAll _)

  /** Benford first-digit audit (E-126): the fraud/fabrication screen —
    * naturally-occurring multiplicative amounts put digit d first with
    * probability log₁₀(1 + 1∕d); fabricated or constrained data do not.
    * Reports the observed vs expected share per digit 1–9 and the
    * Pearson χ² = N·Σ (obs−exp)²∕exp as a constant column.
    *
    * Determinism: the first digit comes from the DECIMAL STRING of the
    * positive integer `valueFixed` (fixed-point, e.g. cents) — no
    * log10-of-float boundary can misclassify 999.99…; expected shares
    * are log10 on exact small rationals, identical on both engines.
    * One groupBy over the scan; the χ² window spans 9 rows.
    *
    * Observed counts are left-joined onto a literal 1–9 digit spine so
    * an ABSENT digit still contributes its full N·p_d term (share 0 vs
    * expected p_d) — exactly the degenerate/fabricated shapes the audit
    * exists to flag. Without the spine the statistic was understated in
    * those cases (a dropped (0−p_d)²∕p_d term per missing digit).
    *
    * @return one row per digit 1–9: (digit, n, share, expected, chi2)
    *         un-rounded; n = 0 for digits never observed
    */
  def benford(df: DataFrame, valueFixed: Column): DataFrame = {
    val observed = df.filter(valueFixed > 0)
      .select(substring(valueFixed.cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val spine = df.sparkSession.range(1, 10).select(col("id").as("digit"))
    val per = spine.join(observed, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val share = col("n").cast("double") / sum(col("n")).over(wAll)
    val expected = log10(lit(1.0) + lit(1.0) / col("digit"))
    per.select(col("digit"), col("n"), share.as("share"),
        expected.as("expected"),
        (sum(col("n")).over(wAll).cast("double") *
          (share - expected) * (share - expected) / expected).as("__c"))
      .withColumn("chi2", sum(col("__c")).over(wAll))
      .drop("__c")
  }
}
