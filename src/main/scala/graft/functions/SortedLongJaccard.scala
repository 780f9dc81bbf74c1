package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: Jaccard similarity of two SORTED long
  * arrays (deduplicated set elements, pre-hashed to longs), via a single
  * allocation-free merge walk (SURVEY T-9/E-2..E-4).
  *
  * Replaces `size(array_intersect(a,b))/size(array_union(a,b))` in
  * near-dup recheck hot paths: the built-in pair builds two hash sets
  * and materializes two result arrays per row — at 12M candidate pairs
  * (sf0.1 near-dup recheck) that allocation dominates the query. The
  * merge walk does the same counting in one pass.
  *
  * Equal to the string-set formulation whenever the long elements are
  * distinct hashes of the distinct set elements (collision probability
  * ~n²/2⁶⁵ — vanishing for any real set size); the equivalence is
  * property-tested in DedupSpec. Inputs MUST be sorted ascending and
  * duplicate-free (sort_array over a hashed distinct set).
  *
  * Empty ∩ empty yields NaN (0/0), matching the built-in double divide.
  */
case class SortedLongJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_long_jaccard expects two array<bigint>, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { inter += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    inter.toDouble / (nx + ny - inter).toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0, $j = 0, $inter = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xi = $a.getLong($i); long $yj = $b.getLong($j);
         |  if ($xi == $yj) { $inter++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; } else { $j++; }
         |}
         |${ev.value} = ((double) $inter) / ((double) ($nx + $ny - $inter));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongJaccard =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_long_jaccard"
}
