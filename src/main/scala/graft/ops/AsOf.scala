package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join (J-7 production formulation): for each left row,
  * attach the single right row with the greatest (time, tiebreak) at or
  * before the left row's time, within the same key.
  *
  * The spec formulation (equi-join + inequality + row_number, Q20) pairs
  * every left row with EVERY earlier right row of its key before ranking
  * — quadratic per key. This merge formulation unions both sides, sorts
  * per key by (time, side, tiebreak) and carries the last right row
  * forward with a window `last(ignoreNulls)` — one shuffle on the key,
  * linear in rows, the classic sort-merge as-of.
  *
  * Right rows sort BEFORE left rows at equal time (inclusive <=); among
  * equal-time right rows the tiebreak ascends, so the carried row is the
  * (time desc, tiebreak desc) winner — exactly the spec's ranking.
  */
object AsOf {

  /** @param carry right-side columns to attach (prefixed as-is)
    * @return left rows that matched (inner semantics), with carry columns
    */
  def backward(left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      tiebreak: String, carry: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val carryStruct = struct((Seq(rightTime, tiebreak) ++ carry).distinct.map(col): _*)
    val carryType = right.select(carryStruct.as("c")).schema("c").dataType
    val leftType = left.select(struct(leftCols.map(col): _*).as("l")).schema("l").dataType
    val l = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
      lit(null).cast("long").as("__tb"),
      lit(null).cast(carryType).as("__carry"),
      struct(leftCols.map(col): _*).as("__left"))
    val r = right.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
      col(tiebreak).cast("long").as("__tb"),
      carryStruct.as("__carry"),
      lit(null).cast(leftType).as("__left"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = l.unionByName(r)
      .withColumn("__match", last("__carry", ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__match").isNotNull)
    val out = leftCols.map(c => col(s"__left.$c").as(c)) ++
      carry.map(c => col(s"__match.$c").as(c))
    merged.select(out: _*)
  }

  /** Forward as-of: attach the right row with the SMALLEST (time,
    * tiebreak) at or after the left row's time. Same merge shape as
    * [[backward]], traversed in descending time order: right rows still
    * sort before left rows at equal time (inclusive >=), and among
    * equal-time right rows the tiebreak DESCENDS so the carried row is
    * the (time asc, tiebreak asc) winner.
    */
  def forward(left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      tiebreak: String, carry: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val carryStruct = struct((Seq(rightTime, tiebreak) ++ carry).distinct.map(col): _*)
    val carryType = right.select(carryStruct.as("c")).schema("c").dataType
    val leftType = left.select(struct(leftCols.map(col): _*).as("l")).schema("l").dataType
    val l = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
      lit(null).cast("long").as("__tb"),
      lit(null).cast(carryType).as("__carry"),
      struct(leftCols.map(col): _*).as("__left"))
    val r = right.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
      col(tiebreak).cast("long").as("__tb"),
      carryStruct.as("__carry"),
      lit(null).cast(leftType).as("__left"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").desc, col("__side"), col("__tb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = l.unionByName(r)
      .withColumn("__match", last("__carry", ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__match").isNotNull)
    val out = leftCols.map(c => col(s"__left.$c").as(c)) ++
      carry.map(c => col(s"__match.$c").as(c))
    merged.select(out: _*)
  }
}
