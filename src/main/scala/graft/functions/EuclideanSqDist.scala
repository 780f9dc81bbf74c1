package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: squared euclidean distance of two
  * numeric arrays in one fused codegen loop (SURVEY §4.4 — the
  * CosineSimilarity discipline applied to the distance kernel that
  * dominates DBSCAN/IVF/PQ hot paths).
  *
  * BIT-IDENTICAL to `VectorFunctions.euclideanSq` by construction:
  * the accumulator adds (xᵢ−yᵢ)² in index order with per-element
  * double casts, exactly the fold the zip_with + aggregate chain
  * performs — so swapping one for the other can never move a
  * threshold decision (DbscanSpec pins banded-native ≡ brute-HOF).
  * The win is mechanical: no zipped intermediate array, no lambda
  * dispatch per element.
  */
case class EuclideanSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = left.nullable || right.nullable

  private def elemAccessor(t: DataType): String = t match {
    case ArrayType(FloatType, _) => "getFloat"
    case ArrayType(DoubleType, _) => "getDouble"
    case ArrayType(IntegerType, _) => "getInt"
    case ArrayType(LongType, _) => "getLong"
    case other => throw new IllegalArgumentException(
      s"euclidean_sq: unsupported element type in $other")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    try { elemAccessor(left.dataType); elemAccessor(right.dataType) }
    catch { case e: IllegalArgumentException =>
      return org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(e.getMessage)
    }
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    def get(arr: ArrayData, t: DataType, i: Int): Double = t match {
      case ArrayType(FloatType, _) => arr.getFloat(i).toDouble
      case ArrayType(DoubleType, _) => arr.getDouble(i)
      case ArrayType(IntegerType, _) => arr.getInt(i).toDouble
      case ArrayType(LongType, _) => arr.getLong(i).toDouble
      case _ => throw new IllegalStateException
    }
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = get(x, left.dataType, i) - get(y, right.dataType, i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = elemAccessor(left.dataType)
    val bGet = elemAccessor(right.dataType)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.$aGet($i) - (double) $b.$bGet($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EuclideanSqDist =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "euclidean_sq"
}

object EuclideanSqDist {
  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2,
      s"euclidean_sq expects 2 args, got ${children.length}")
    EuclideanSqDist(children(0), children(1))
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[EuclideanSqDist].getCanonicalName, "euclidean_sq")
}
