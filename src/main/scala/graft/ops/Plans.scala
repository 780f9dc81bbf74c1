package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Plan-shape utilities shared by the iterate-to-fixpoint operators. */
object Plans {

  /** Run `body` with session confs temporarily overridden, restoring the
    * previous values (or unsetting) afterwards. Runtime confs are read
    * at ACTION time, so this scopes shuffle-partition / AQE knobs to the
    * jobs an operator materializes inside `body` — the only way Spark
    * offers to give ONE operator's joins a different partitioning
    * discipline than the session default. Not thread-safe across
    * concurrently-executing queries on the same session (the driver
    * contract runs queries sequentially).
    */
  def withConf[T](spark: SparkSession, entries: (String, String)*)(body: => T): T = {
    val conf = spark.conf
    val saved = entries.map { case (k, _) => k -> conf.getOption(k) }
    entries.foreach { case (k, v) => conf.set(k, v) }
    try body
    finally saved.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
  }

  /** Lineage + STATS truncating checkpoint for SELF-MULTIPLYING round
    * plans (Louvain's move round references the labels frame ~6 times;
    * any fixpoint loop that later gains a self-join hits the same cliff).
    *
    * `localCheckpoint` alone is not enough for such loops: Spark's
    * checkpointed `LogicalRDD` carries the ORIGIN plan's size estimate
    * forward, so when round r's plan multiplies round r−1's frame into
    * itself ~6 times, the propagated `sizeInBytes` bit-length MULTIPLIES
    * by ~6 every round — by round 9 the optimizer is doing Toom-Cook
    * arithmetic on million-digit BigIntegers inside every stats visit
    * (measured on Louvain at sf0.01: 17 min of driver CPU before this
    * helper; ~25 s after). Frontier-style loops (PageRank, BFS, SSSP)
    * reference the previous round ONCE, so their stats grow linearly and
    * plain `localCheckpoint` is fine — the pathology is specific to
    * self-multiplying round plans.
    *
    * Rebuilding the frame from the checkpointed RDD resets the leaf to
    * the default size estimate, which also (correctly, at scale) keeps
    * a per-node state table on the shuffle-join path rather than
    * broadcast.
    */
  def pin(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }
}
