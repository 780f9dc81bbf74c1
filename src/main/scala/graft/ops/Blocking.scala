package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorted-neighborhood blocking for entity resolution — the classic
  * complement to equality blocking ([[ExtensionQueries3]]'s ext_jaro
  * first-token blocks): sort records within a coarse block by a fuzzy
  * sort key and compare each record only to its w−1 successors. Typos
  * ANYWHERE after the sort-relevant prefix still land adjacent, where
  * an equality block would separate them.
  *
  * Scale shape (100 TB): the sort is a per-block window (blocks are
  * coarse but bounded — mfgr/brand/shard-sized, never one global
  * partition); pairing is an equi-join of each rank r against ranks
  * r+1…r+w−1 via an exploded offset column, so the candidate count is
  * exactly (w−1)·n and the verify (any similarity predicate the caller
  * applies) touches only those.
  */
object Blocking {

  /** Candidate pairs by sorted neighborhood: within each `block`, order
    * by (sortKey, id) and pair every record with its next w−1 neighbors.
    *
    * @return (block, id_a, id_b, key_a, key_b) with a ordered before b
    */
  def sortedNeighborhood(df: DataFrame, block: Column, sortKey: Column,
      id: Column, w: Int): DataFrame = {
    require(w >= 2)
    val ranked = df.select(block.as("__blk"), sortKey.as("__key"), id.as("__id"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__blk").orderBy(col("__key"), col("__id"))))
    val offs = ranked.select(col("__blk"), col("__rn"),
      col("__id").as("id_a"), col("__key").as("key_a"),
      explode(sequence(col("__rn") + 1, col("__rn") + (w - 1))).as("__rnb"))
    offs.join(ranked.select(col("__blk"), col("__rn").as("__rnb"),
        col("__id").as("id_b"), col("__key").as("key_b")),
      Seq("__blk", "__rnb"))
      .select(col("__blk").as("block"), col("id_a"), col("id_b"),
        col("key_a"), col("key_b"))
  }
}
