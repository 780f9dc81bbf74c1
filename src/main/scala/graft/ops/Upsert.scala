package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC-style upsert application: fold a stream/batch of keyed updates
  * onto a snapshot, keeping only the LATEST update per key (by an
  * explicit, total ordering — ties must be broken by a unique column or
  * the result is nondeterministic).
  *
  * Scale shape: one window (shuffle by update key) to pick winners, one
  * join (shuffle or broadcast by key) to apply them. Both stages are
  * keyed on the same column, so with bucketed storage
  * (sources.Bucketed) the second shuffle disappears. This is the batch
  * formulation of what `foreachBatch` + MERGE does in a lakehouse sink —
  * expressed engine-natively so it needs no table format.
  */
object Upsert {

  /** Reduce `updates` to the latest row per `key` under `ordering`
    * (descending priority — first column compared first).
    */
  def latestPerKey(updates: DataFrame, key: String, ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ordering.map(_.desc): _*)
    updates
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Apply `updates` (latest per key wins) onto `snapshot`: rows with a
    * matching update get `valueCol` from the update; unmatched snapshot
    * rows pass through unchanged. Returns the snapshot columns plus
    * `newValueName` and an `updated` flag.
    */
  def applyLatest(
      snapshot: DataFrame, snapKey: String, snapValue: String,
      updates: DataFrame, updKey: String, updValue: String,
      ordering: Seq[Column], newValueName: String): DataFrame = {
    val latest = latestPerKey(updates, updKey, ordering)
      .select(col(updKey).as("__k"), col(updValue).as("__v"))
    snapshot
      .join(latest, col(snapKey) === col("__k"), "left")
      .withColumn(newValueName, coalesce(col("__v"), col(snapValue)))
      .withColumn("updated", col("__v").isNotNull)
      .drop("__k", "__v")
  }
}
