package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset diff (E-88) — the data-ops regression check: given two
  * versions of a keyed table, classify every key as added / removed /
  * changed / unchanged and surface both sides' values. One full-outer
  * join on the key; all shared non-key columns compared null-safely.
  * At 100 TB this is the same single keyed shuffle as any join — and
  * with both versions bucketed by the key, no shuffle at all.
  *
  * Changed/added/removed are usually a vanishing fraction, so the
  * common pattern is `diff(...).filter($"status" =!= "unchanged")` —
  * Catalyst pushes that filter below nothing (it needs the join), but
  * the OUTPUT stays small, which is what matters downstream.
  */
object TableDiff {

  /** @return (key, status, <c>_old, <c>_new per common non-key column) */
  def diff(oldDf: DataFrame, newDf: DataFrame, key: String): DataFrame = {
    val common = oldDf.columns.toSeq.filter(_ != key)
      .filter(newDf.columns.contains)
    val o = oldDf.select((key +: common).map(col): _*).alias("o")
    val n = newDf.select((key +: common).map(col): _*).alias("n")
    val changed = common
      .map(c => !(col(s"o.$c") <=> col(s"n.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val status = when(col(s"n.$key").isNull, "removed")
      .when(col(s"o.$key").isNull, "added")
      .when(changed, "changed")
      .otherwise("unchanged")
    val outCols =
      Seq(coalesce(col(s"o.$key"), col(s"n.$key")).as(key), status.as("status")) ++
        common.flatMap(c =>
          Seq(col(s"o.$c").as(s"${c}_old"), col(s"n.$c").as(s"${c}_new")))
    o.join(n, col(s"o.$key") === col(s"n.$key"), "full_outer")
      .select(outCols: _*)
  }
}
