package graft.ops

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** int8 quantization properties (E-29): codes stay in [-127, 127],
  * dequantization reconstructs within the absmax error bound
  * scale/254 per component, zero vectors are safe, and the operator is
  * a pure projection (no shuffle in the plan).
  */
class QuantizeSpec extends AnyFunSuite with SparkFixture {

  private lazy val embeddings = Tables.table(spark, sf001, "embeddings")

  test("codes bounded and reconstruction error within scale/254 + float ulp") {
    val q = Quantize.quantize(embeddings)
      .withColumn("deq", Quantize.dequantize(col("codes"), col("scale")))
      .withColumn("max_code", array_max(transform(col("codes"), c => abs(c))))
      .withColumn("max_err", array_max(zip_with(col("embedding"), col("deq"),
        (a, b) => abs(a.cast("double") - b.cast("double")))))
      // float32 reconstruction adds up to half an ulp of the magnitude on
      // top of the quantization bound — allow 1e-4 slack (vectors are
      // unit-ish, scale < 1)
      .agg(max("max_code").as("mc"),
        max(col("max_err") - col("scale") / 254d).as("excess"))
      .head()
    assert(q.getAs[Int]("mc") <= 127)
    assert(q.getAs[Double]("excess") <= 1e-4, s"err beyond bound: $q")
  }

  test("zero vector quantizes to zero codes with zero scale") {
    import spark.implicits._
    val z = Seq((1L, Array(0f, 0f, 0f)), (2L, Array(1f, -2f, 0.5f)))
      .toDF("vec_id", "embedding")
    val out = Quantize.quantize(z).orderBy("vec_id").collect()
    assert(out(0).getAs[Double]("scale") == 0.0)
    assert(out(0).getSeq[Int](out(0).fieldIndex("codes")) == Seq(0, 0, 0))
    // absmax component always maps to ±127
    assert(out(1).getSeq[Int](out(1).fieldIndex("codes")).contains(-127))
  }

  test("quantize is a pure projection: no exchange in the plan") {
    val plan = Quantize.quantize(embeddings).queryExecution.sparkPlan.toString
    assert(!plan.contains("Exchange"), s"quantize shuffled:\n${plan.take(1200)}")
  }
}
