package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap self-join via bucket registration (E-129) — the
  * temporal analogue of [[BandJoin]]'s value bands and [[GeoJoin]]'s
  * grid cells: find all pairs of intervals that OVERLAP, without a
  * nested-loop range join. Each interval registers in every
  * `bucketWidth`-sized bucket it touches; two overlapping intervals
  * necessarily share the bucket containing their overlap start, so
  * candidates come from an equi-join on (block, bucket) and the exact
  * predicate (s_a ≤ e_b ∧ s_b ≤ e_a) prunes the rest.
  *
  * Scale shape (100 TB): the explode fans each row out to
  * span∕bucketWidth rows (pick the width near the median span to keep
  * the fan-out O(1)); the join is a plain keyed shuffle on
  * (block, bucket); dedup of multi-bucket matches is a distinct on the
  * pair key. All relational, no window over raw rows.
  */
object IntervalJoin {

  /** Pairs (id_a < id_b) in the same `block` whose [start, end]
    * intervals overlap. Ends are inclusive; start ≤ end required.
    *
    * @param start,end integer columns (epoch seconds/days — one unit)
    * @return (block, id_a, id_b, overlap) where overlap =
    *         min(e)−max(s)+1 in the same unit
    */
  def overlapSelfJoin(df: DataFrame, block: Column, id: Column,
      start: Column, end: Column, bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1)
    val base = df.select(block.as("__blk"), id.as("__id"),
        start.cast("long").as("__s"), end.cast("long").as("__e"))
      .filter(col("__s") <= col("__e"))
    val buckets = base.withColumn("__b",
      explode(sequence(floor(col("__s") / bucketWidth),
        floor(col("__e") / bucketWidth))))
    val a = buckets.select(col("__blk"), col("__b"), col("__id").as("id_a"),
      col("__s").as("sa"), col("__e").as("ea"))
    val b = buckets.select(col("__blk"), col("__b"), col("__id").as("id_b"),
      col("__s").as("sb"), col("__e").as("eb"))
    a.join(b, Seq("__blk", "__b"))
      .filter(col("id_a") < col("id_b") &&
        col("sa") <= col("eb") && col("sb") <= col("ea"))
      .select(col("__blk").as("block"), col("id_a"), col("id_b"),
        col("sa"), col("ea"), col("sb"), col("eb"))
      .distinct() // intervals sharing several buckets match once
      .select(col("block"), col("id_a"), col("id_b"),
        (least(col("ea"), col("eb")) - greatest(col("sa"), col("sb")) + 1)
          .as("overlap"))
  }
}
