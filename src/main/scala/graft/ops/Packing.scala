package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents, in deterministic id order, to
  * fixed-capacity token bins — the batching step that turns a filtered
  * corpus into training-ready context windows.
  *
  * Semantics are LINEAR packing: bin(doc) = floor(tokens_before / C)
  * where tokens_before is the exclusive running token count in id
  * order. A document straddling a capacity boundary stays in the bin
  * where it started (bins may overflow by at most one document), which
  * is the property that makes the assignment a pure prefix-sum — fully
  * deterministic, order-stable, and SQL-expressible for the oracle.
  * First-fit-decreasing packs ~equally well but is inherently
  * sequential state; prefix-sum packing is the shape that survives a
  * 1000-executor corpus.
  *
  * Two formulations, byte-identical (property-tested, the W-7 pattern
  * from [[graft.text.Vocabulary]]):
  *  - [[packWindow]]: unpartitioned window cumsum — the oracle-exact
  *    spec form, single-partition for the sum;
  *  - [[packScalable]]: range-sort + per-partition sums + broadcast
  *    partition offsets — two passes, no single-partition stage, the
  *    production path at scale.
  */
object Packing {

  /** Spec form: (id, n_tokens, cum_before, bin) via one global window. */
  def packWindow(docs: DataFrame, capacity: Long, idCol: String = "doc_id",
      tokCol: String = "n_tokens"): DataFrame = {
    val w = Window.orderBy(idCol).rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol).cast("long").as(idCol), col(tokCol).cast("long").as(tokCol))
      .withColumn("cum_before", coalesce(sum(tokCol).over(w), lit(0L)))
      .withColumn("bin", floor(col("cum_before") / capacity).cast("long"))
  }

  /** Scale form: identical output, no single-partition stage. The sort
    * is a range partitioning; partition token totals (one small row per
    * partition) are collected and broadcast as offsets, then each
    * partition computes its local running sum on top of its offset.
    */
  def packScalable(docs: DataFrame, capacity: Long, idCol: String = "doc_id",
      tokCol: String = "n_tokens"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sorted = docs
      .select(col(idCol).cast("long"), col(tokCol).cast("long"))
      .as[(Long, Long)]
      .rdd.sortBy(_._1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partSums = sorted
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L; it.foreach(s += _._2); Iterator((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val out = sorted.mapPartitionsWithIndex { (pid, it) =>
      var cum = bc.value(pid)
      it.map { case (id, n) =>
        val before = cum; cum += n
        (id, n, before, before / capacity)
      }
    }.toDF(idCol, tokCol, "cum_before", "bin")
    sorted.unpersist(blocking = false)
    out
  }

  /** Per-bin summary of a packing: (bin, n_docs, bin_tokens,
    * first_doc, last_doc), ordered by bin.
    */
  def binSummary(packed: DataFrame, idCol: String = "doc_id",
      tokCol: String = "n_tokens"): DataFrame =
    packed.groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum(tokCol).as("bin_tokens"),
        min(idCol).as("first_doc"), max(idCol).as("last_doc"))
      .orderBy("bin")
}
