package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: k-function MinHash signature over an array
  * of PRE-HASHED (long) set elements (SURVEY T-9/E-2).
  *
  * Element i of the result is min over elements e of xxhash64(i, e) —
  * bit-equal to the composed built-in formulation
  * `transform(sequence(0,k-1), i -> array_min(transform(set, e ->
  * xxhash64(i, e))))` because it replays Spark's own XXH64 mixing:
  * seed_i = XXH64.hashInt(i, 42); hash = XXH64.hashLong(e, seed_i).
  * The equivalence is property-tested in DedupSpec.
  *
  * The composed form pays an interpreted lambda dispatch per (element ×
  * hash function) — k=128 over a 100-element set is ~12.8k lambda evals
  * per document; this is the same arithmetic in one codegen'd loop.
  *
  * Returns null for an empty input array (callers band only non-empty
  * sets — an empty set can never pass a Jaccard >= tau > 0 recheck).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, s"minhash_signature: numHashes must be > 0, got $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_signature expects array<bigint> (pre-hashed elements), got $other")
  }

  // seeds(i) = XXH64.hashInt(i, 42) — the state of Spark's xxhash64(i, e)
  // after mixing the int literal i, before mixing the long element e.
  @transient private lazy val seeds: Array[Long] = {
    val s = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) { s(i) = XXH64.hashInt(i, 42L); i += 1 }
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      var min = Long.MaxValue
      val seed = seeds(i)
      var d = 0
      while (d < n) {
        val h = XXH64.hashLong(arr.getLong(d), seed)
        if (h < min) min = h
        d += 1
      }
      out(i) = min
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
    val xxh = classOf[XXH64].getName
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val min = ctx.freshName("min")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $out = new long[$numHashes];
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $min = Long.MAX_VALUE;
         |    for (int $d = 0; $d < $n; $d++) {
         |      long $h = $xxh.hashLong($a.getLong($d), $seedsRef[$i]);
         |      if ($h < $min) $min = $h;
         |    }
         |    $out[$i] = $min;
         |  }
         |  ${ev.value} = new $gad($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}
