package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: `bits`-bit random-hyperplane LSH code of a
  * numeric array (SURVEY §4.4, E-7), fused into one codegen'd loop.
  *
  * Semantics are IDENTICAL to the composed built-in formulation the spec
  * pins (Similarity.hyperplaneCodeComposed): hyperplane h, dimension d
  * has pseudo-random weight xxhash64(seed, h, d)/Long.MaxValue in
  * [-1, 1]; bit h is set iff the (float->double) dot product of the
  * first `dim` elements with plane h is > 0; an input shorter than `dim`
  * yields code 0 (the composed form's null dot sets no bits). Weights
  * are evaluated once at construction by running the very same XxHash64
  * expression the composed form folds, so codes are bit-equal — the
  * equivalence is property-tested.
  *
  * The composed form is a bits×dim-term expression tree (~1 ms/row at
  * 16×64 even constant-folded); this is a 2-instruction-per-term loop.
  */
case class HyperplaneCode(child: Expression, dim: Int, bits: Int, seed: Long)
    extends UnaryExpression {

  require(dim > 0 && bits > 0 && bits <= 63, s"bad hyperplane geometry dim=$dim bits=$bits")

  override def dataType: DataType = LongType

  private def elemAccessor(t: DataType): String = t match {
    case ArrayType(FloatType, _) => "getFloat"
    case ArrayType(DoubleType, _) => "getDouble"
    case ArrayType(IntegerType, _) => "getInt"
    case ArrayType(LongType, _) => "getLong"
    case other => throw new IllegalArgumentException(
      s"hyperplane_code: unsupported element type in $other")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    try elemAccessor(child.dataType)
    catch { case e: IllegalArgumentException =>
      return org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(e.getMessage)
    }
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  // weights(h*dim + d) = xxhash64(seed, h, d) / Long.MaxValue — evaluated
  // through the same Catalyst XxHash64 the composed formulation uses
  // (LongType, IntegerType, IntegerType children, default hash seed).
  @transient private lazy val weights: Array[Double] = {
    val w = new Array[Double](bits * dim)
    var h = 0
    while (h < bits) {
      var d = 0
      while (d < dim) {
        val hash = XxHash64(Seq(Literal(seed), Literal(h), Literal(d)), 42L)
          .eval(null).asInstanceOf[Long]
        w(h * dim + d) = hash.toDouble / Long.MaxValue.toDouble
        d += 1
      }
      h += 1
    }
    w
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() < dim) return 0L
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    var code = 0L
    var h = 0
    while (h < bits) {
      var dot = 0.0
      var d = 0
      val off = h * dim
      while (d < dim) {
        val x = et match {
          case FloatType => arr.getFloat(d).toDouble
          case DoubleType => arr.getDouble(d)
          case IntegerType => arr.getInt(d).toDouble
          case LongType => arr.getLong(d).toDouble
          case _ => throw new IllegalStateException
        }
        dot += x * weights(off + d)
        d += 1
      }
      if (dot > 0) code |= 1L << h
      h += 1
    }
    code
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = elemAccessor(child.dataType)
    val w = ctx.addReferenceObj("hyperplaneWeights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val h = ctx.freshName("h")
      val d = ctx.freshName("d")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val code = ctx.freshName("code")
      s"""
         |long $code = 0L;
         |if ($a.numElements() >= $dim) {
         |  for (int $h = 0; $h < $bits; $h++) {
         |    double $dot = 0.0;
         |    int $off = $h * $dim;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $dot += ((double) $a.$get($d)) * $w[$off + $d];
         |    }
         |    if ($dot > 0) $code |= 1L << $h;
         |  }
         |}
         |${ev.value} = $code;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneCode =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_code"
}
