package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Long-encoded node ids for the supplier–part graph family.
  *
  * The S/P graph queries historically keyed every BFS/power-iteration
  * shuffle on concat-built "S123"/"P456" STRINGS (the two key ranges
  * overlap, so a bare key cannot name a node). A string key costs more
  * everywhere the iterative operators live: wider shuffle rows, slower
  * hashing and equality in every join/aggregate hash map, and varlen
  * comparisons in sorts (optimization guide §2.3 — narrower types).
  * Encoding supplier k → 2k and part k → 2k+1 keeps the union injective
  * in one LONG; queries decode back to the contract strings ONLY at the
  * output boundary (after the final aggregate, before the final
  * order/limit), so declared results — including string tie-break
  * ordering — are byte-identical.
  *
  * NOT applicable to ext_labelprop: its min-label tie-break folds over
  * the label VALUES, and long order ("P11"=23 < "P101"=203) differs
  * from string order ("P101" < "P11") — that query keeps string ids.
  */
object SpIds {

  /** supplier key → even long */
  def s(k: Column): Column = k.cast("long") * 2

  /** part key → odd long */
  def p(k: Column): Column = k.cast("long") * 2 + 1

  /** decode an encoded id back to the "S&lt;k&gt;"/"P&lt;k&gt;" contract string */
  def decode(id: Column): Column =
    when(pmod(id, lit(2)) === 0, concat(lit("S"), shiftright(id, 1)))
      .otherwise(concat(lit("P"), shiftright(id, 1)))
}
