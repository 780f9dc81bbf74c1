package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit SimHash of a token array (SURVEY
  * E-3). Bit k of the result is set iff
  * Σ_instances (2·bit_k(xxhash64(token)) − 1) > 0 — identical to the
  * relational tf-weighted formulation (Dedup.simhash): summing ±1 per
  * token INSTANCE equals summing tf·±1 per distinct token. Bit-equality
  * is property-tested in DedupSpec.
  *
  * The relational form tokenizes, aggregates term frequencies, explodes
  * 64 bit positions and re-aggregates — two shuffles over
  * docs×terms×64 rows. This is a pure per-row projection: no shuffle at
  * all, which is the version that holds at 100 TB.
  *
  * An empty array yields 0L (callers filter empty docs to match the
  * relational form, which simply has no row for them). Null elements are
  * skipped.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = new Array[Int](64)
    var d = 0
    while (d < n) {
      if (!arr.isNullAt(d)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(d), 42L)
        var k = 0
        while (k < 64) {
          if (((h >>> k) & 1L) == 1L) acc(k) += 1 else acc(k) -= 1
          k += 1
        }
      }
      d += 1
    }
    var code = 0L
    var k = 0
    while (k < 64) { if (acc(k) > 0) code |= 1L << k; k += 1 }
    code
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val utf8 = classOf[UTF8String].getName
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val acc = ctx.freshName("acc")
      val code = ctx.freshName("code")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |int[] $acc = new int[64];
         |for (int $d = 0; $d < $n; $d++) {
         |  if (!$a.isNullAt($d)) {
         |    $utf8 $s = $a.getUTF8String($d);
         |    long $h = $xxh.hashUTF8String($s, 42L);
         |    for (int $k = 0; $k < 64; $k++) {
         |      if ((($h >>> $k) & 1L) == 1L) $acc[$k]++; else $acc[$k]--;
         |    }
         |  }
         |}
         |long $code = 0L;
         |for (int $k = 0; $k < 64; $k++) {
         |  if ($acc[$k] > 0) $code |= 1L << $k;
         |}
         |${ev.value} = $code;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}
