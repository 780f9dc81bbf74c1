package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal rank fusion (E-58, Cormack et al. 2009) — the standard
  * hybrid-retrieval combiner: given per-system rankings of a shared
  * candidate set, fused(d) = Σ_systems 1 ∕ (k + rank_s(d)). Rank-based
  * fusion needs no score calibration between systems (BM25 scores and
  * perplexities are not comparable; their RANKS are), which is why RRF
  * is the default first fusion in lexical+semantic retrieval stacks.
  *
  * Relational shape: union of the (id, rank) lists + one sum by id —
  * a single shuffle over data that is candidate-set-sized, not
  * corpus-sized. k = 60 is the canonical constant; IEEE addition of
  * the per-system terms is order-insensitive for the two-list case and
  * the gated query rounds defensively anyway.
  */
object Fusion {

  /** @param rankings (idCol, rank) tables, rank 1-based; items absent
    *                 from a ranking simply contribute nothing
    */
  def rrf(rankings: Seq[DataFrame], idCol: String = "doc_id",
      k: Int = 60): DataFrame =
    rankings.map(_.select(col(idCol), col("rank")))
      .reduce(_ unionAll _)
      .groupBy(idCol)
      .agg(sum(lit(1.0) / (lit(k) + col("rank"))).as("rrf"),
        count(lit(1)).as("n_rankings"))
}
