package graft.ops

import org.apache.spark.sql.DataFrame
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
}
