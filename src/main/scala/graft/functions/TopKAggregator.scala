package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored record for top-k selection: ordered by score desc, then
  * tiebreak asc (deterministic).
  */
case class Scored(score: Double, tiebreak: Long)

/** Exact top-k per group as a typed Aggregator (SURVEY X-2 / A-10
  * alternative): a bounded buffer is maintained through reduce/merge, so
  * each partition keeps at most k rows per group and the shuffle carries
  * k rows per (group, partition) — unlike the window formulation, which
  * sorts every group's full row set under WindowExec.
  *
  * The buffer is a sorted Seq (score desc, tiebreak asc), never longer
  * than k; merge is associative and commutative, so partial aggregation
  * (map-side combine) applies.
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0)

  private val ord: Ordering[Scored] =
    Ordering.by[Scored, (Double, Long)](s => (-s.score, s.tiebreak))

  override def zero: Seq[Scored] = Seq.empty

  override def reduce(buf: Seq[Scored], row: Scored): Seq[Scored] =
    insert(buf, row)

  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
    b.foldLeft(a)(insert)

  private def insert(buf: Seq[Scored], row: Scored): Seq[Scored] = {
    if (buf.length >= k && ord.lteq(buf.last, row)) buf
    else ((buf :+ row).sorted(ord)).take(k)
  }

  override def finish(reduction: Seq[Scored]): Seq[Scored] = reduction

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}
