package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality audit (E-43): declarative expectations evaluated in ONE
  * pass over the data — the validation gate a training pipeline runs
  * before accepting an input drop.
  *
  * Row rules (a violation predicate per row) and uniqueness rules
  * (duplicate count of a key) all fold into a single aggregate — no
  * per-rule scans — and the one-row wide result is exploded to the
  * (rule, violations, n_rows) report shape. Cost: one scan + one 1-row
  * aggregate regardless of rule count.
  */
object Expectations {

  sealed trait Rule { def name: String }
  /** Fires per row where `violation` is true. */
  final case class RowRule(name: String, violation: Column) extends Rule
  /** Fires once per duplicate occurrence of `key`. */
  final case class UniqueRule(name: String, key: Column) extends Rule

  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    val aggs = rules.map {
      case RowRule(n, v) => sum(when(v, 1L).otherwise(0L)).as(n)
      case UniqueRule(n, k) => (count(k) - countDistinct(k)).as(n)
    } :+ count(lit(1)).as("__n")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.map(r =>
      struct(lit(r.name).as("rule"), col(r.name).cast("long").as("violations")))
    wide.select(explode(array(stacked: _*)).as("s"), col("__n").as("n_rows"))
      .select(col("s.rule"), col("s.violations"), col("n_rows"))
  }
}
