package graft.functions

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CosineSimilaritySpec extends AnyFunSuite with SparkFixture {

  test("native cosine_sim equals the built-in composition on fixture embeddings") {
    GraftFunctions.register(spark)
    val emb = Tables.table(spark, sf001, "embeddings")
    val probe = emb.filter(col("vec_id") === 0).select(col("embedding").as("e"))
    val both = emb.crossJoin(broadcast(probe))
      .select(
        call_function("cosine_sim", col("embedding"), col("e")).as("native"),
        VectorFunctions.cosine(col("embedding"), col("e")).as("composed"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12,
        s"native=${r.getDouble(0)} composed=${r.getDouble(1)}")
    }
  }

  test("interpreted eval path agrees with codegen") {
    val a = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(1.0f, 2.0f, 3.0f))
    val b = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(4.0f, -5.0f, 6.0f))
    val e = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal(a,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal(b,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    val got = e.eval(null).asInstanceOf[Double]
    val expected = 12.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(got - expected) < 1e-12)
  }

  test("works from SQL after registration, nulls propagate") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "select cosine_sim(array(1.0D,0.0D), array(0.0D,1.0D)) o, " +
      "cosine_sim(array(1.0D,0.0D), array(1.0D,0.0D)) s, " +
      "cosine_sim(cast(null as array<double>), array(1.0D)) n").collect()(0)
    assert(math.abs(r.getDouble(0)) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(r.isNullAt(2))
  }
}
