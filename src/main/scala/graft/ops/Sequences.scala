package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition matrix over per-key event sequences
  * (E-75): P(next state | state), estimated from observed consecutive
  * pairs. The classic sequence profile for clickstreams and user
  * journeys (and the generative check for synthetic event data).
  *
  * Shape: one window per key for the successor (a single shuffle on
  * the key — sequences are per-user, so no global sort), then a
  * count aggregate on (from, to) and a vocabulary-sized row
  * normalization. Keys with one event contribute nothing (no
  * transition), which is the correct estimator, not data loss.
  */
object Sequences {

  /** @param ordering total per-key order (ties must be broken — an
    *                 ambiguous successor makes the matrix
    *                 nondeterministic)
    * @return (from_s, to_s, n, p) — p row-normalized over from_s
    */
  def transitions(df: DataFrame, key: Column, state: Column,
      ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy("graft_seq_k").orderBy(ordering: _*)
    val wFrom = Window.partitionBy("from_s")
    df.select((Seq(key.as("graft_seq_k"), state.as("from_s")) ++ ordering): _*)
      .withColumn("to_s", lead(col("from_s"), 1).over(w))
      .filter(col("to_s").isNotNull)
      .groupBy("from_s", "to_s")
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n") / sum("n").over(wFrom).cast("double"))
  }
}
