package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression: cosine similarity of two numeric arrays,
  * fused into a single loop with whole-stage codegen (SURVEY §4.4).
  *
  * Semantics match the composed built-in formulation
  * (VectorFunctions.cosine = dot/(sqrt(normSq(a))*sqrt(normSq(b))) with
  * per-element cast to double BEFORE multiply/accumulate) — the two are
  * property-tested equal so either can serve the B10 oracle. The win is
  * mechanical: one traversal, no intermediate zipped array, no lambda
  * dispatch — where the built-in chain walks both arrays four times and
  * allocates a zip_with result per row.
  *
  * Null if either side is null; NaN propagates like the built-ins
  * (zero-norm input divides by zero -> NaN/Infinity, same as the SQL
  * formulation).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = left.nullable || right.nullable

  private def elemAccessor(t: DataType): String = t match {
    case ArrayType(FloatType, _) => "getFloat"
    case ArrayType(DoubleType, _) => "getDouble"
    case ArrayType(IntegerType, _) => "getInt"
    case ArrayType(LongType, _) => "getLong"
    case other => throw new IllegalArgumentException(
      s"cosine_sim: unsupported element type in $other")
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
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = get(x, left.dataType, i)
      val yi = get(y, right.dataType, i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = elemAccessor(left.dataType)
    val bGet = elemAccessor(right.dataType)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.$aGet($i);
         |  double $yi = (double) $b.$bGet($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

/** Registration of graft's native expressions, both imperatively
  * (register(spark)) and via SparkSessionExtensions
  * (spark.sql.extensions=graft.functions.GraftExtensions).
  */
object GraftFunctions {
  val cosineSimBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, s"cosine_sim expects 2 args, got ${children.length}")
    CosineSimilarity(children(0), children(1))
  }

  val cosineSimInfo: ExpressionInfo = new ExpressionInfo(
    classOf[CosineSimilarity].getCanonicalName, "cosine_sim")

  private def litInt(e: Expression, what: String): Int = {
    require(e.foldable, s"hyperplane_code: $what must be a literal")
    e.eval(null).asInstanceOf[Number].intValue()
  }

  val hyperplaneCodeBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 4,
      s"hyperplane_code expects (vec, dim, bits, seed), got ${children.length} args")
    HyperplaneCode(children(0), litInt(children(1), "dim"),
      litInt(children(2), "bits"),
      { val s = children(3); require(s.foldable, "hyperplane_code: seed must be a literal")
        s.eval(null).asInstanceOf[Number].longValue() })
  }

  val hyperplaneCodeInfo: ExpressionInfo = new ExpressionInfo(
    classOf[HyperplaneCode].getCanonicalName, "hyperplane_code")

  val minhashSignatureBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2,
      s"minhash_signature expects (array, numHashes), got ${children.length} args")
    MinHashSignature(children(0), litInt(children(1), "numHashes"))
  }

  val minhashSignatureInfo: ExpressionInfo = new ExpressionInfo(
    classOf[MinHashSignature].getCanonicalName, "minhash_signature")

  val sortedLongJaccardBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2,
      s"sorted_long_jaccard expects 2 args, got ${children.length}")
    SortedLongJaccard(children(0), children(1))
  }

  val sortedLongJaccardInfo: ExpressionInfo = new ExpressionInfo(
    classOf[SortedLongJaccard].getCanonicalName, "sorted_long_jaccard")

  val simhash64Builder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, s"simhash64 expects 1 arg, got ${children.length}")
    SimHash64(children(0))
  }

  val simhash64Info: ExpressionInfo = new ExpressionInfo(
    classOf[SimHash64].getCanonicalName, "simhash64")

  val jaroWinklerBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2,
      s"jaro_winkler expects 2 args, got ${children.length}")
    JaroWinkler(children(0), children(1))
  }

  val jaroWinklerInfo: ExpressionInfo = new ExpressionInfo(
    classOf[JaroWinkler].getCanonicalName, "jaro_winkler")

  /** Imperative registration on an existing session. Idempotent AND
    * silent: queries call this defensively (any entry point must work on
    * a caller-provided session), so an already-registered name is simply
    * skipped — re-registering via createOrReplaceTempFunction would emit
    * a `SimpleFunctionRegistry ... replaced` WARN per call site and bury
    * real registry warnings in log noise.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def once(name: String, builder: Seq[Expression] => Expression): Unit =
      if (!reg.functionExists(new FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    once("cosine_sim", cosineSimBuilder)
    once("hyperplane_code", hyperplaneCodeBuilder)
    once("minhash_signature", minhashSignatureBuilder)
    once("sorted_long_jaccard", sortedLongJaccardBuilder)
    once("simhash64", simhash64Builder)
    once("jaro_winkler", jaroWinklerBuilder)
    once("euclidean_sq", EuclideanSqDist.builder)
  }
}

/** Session-extension hook: set
  * `spark.sql.extensions=graft.functions.GraftExtensions` and
  * `cosine_sim` is available in every session, SQL included.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((new FunctionIdentifier("cosine_sim"),
      GraftFunctions.cosineSimInfo, GraftFunctions.cosineSimBuilder))
    ext.injectFunction((new FunctionIdentifier("hyperplane_code"),
      GraftFunctions.hyperplaneCodeInfo, GraftFunctions.hyperplaneCodeBuilder))
    ext.injectFunction((new FunctionIdentifier("minhash_signature"),
      GraftFunctions.minhashSignatureInfo, GraftFunctions.minhashSignatureBuilder))
    ext.injectFunction((new FunctionIdentifier("sorted_long_jaccard"),
      GraftFunctions.sortedLongJaccardInfo, GraftFunctions.sortedLongJaccardBuilder))
    ext.injectFunction((new FunctionIdentifier("simhash64"),
      GraftFunctions.simhash64Info, GraftFunctions.simhash64Builder))
    ext.injectFunction((new FunctionIdentifier("jaro_winkler"),
      GraftFunctions.jaroWinklerInfo, GraftFunctions.jaroWinklerBuilder))
    ext.injectFunction((new FunctionIdentifier("euclidean_sq"),
      EuclideanSqDist.info, EuclideanSqDist.builder))
    // Bloom semi-join reduction pair (ops.BloomJoin) — injected here too
    // so SQL-text sessions get the same surface as the imperative path.
    ext.injectFunction((new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        "org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate",
        "graft_bloom_agg"),
      graft.ops.BloomJoin.bloomAggBuilder))
    ext.injectFunction((new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        "org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain",
        "graft_might_contain"),
      graft.ops.BloomJoin.mightContainBuilder))
  }
}
