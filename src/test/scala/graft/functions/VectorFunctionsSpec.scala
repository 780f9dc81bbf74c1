package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class VectorFunctionsSpec extends AnyFunSuite with SparkFixture {

  private lazy val df = spark.createDataFrame(Seq(
    (Array(1.0f, 2.0f, 3.0f), Array(4.0f, -5.0f, 6.0f)),
    (Array(0.0f, 0.0f, 1.0f), Array(0.0f, 1.0f, 0.0f))
  )).toDF("a", "b")

  test("dot product") {
    val got = df.select(VectorFunctions.dot(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(4.0 - 10.0 + 18.0, 0.0))
  }

  test("norm and cosine") {
    val n = df.select(VectorFunctions.norm(col("a"))).collect().map(_.getDouble(0))
    assert(math.abs(n(0) - math.sqrt(14.0)) < 1e-12)
    val c = df.select(VectorFunctions.cosine(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(math.abs(c(0) - 12.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12)
    assert(math.abs(c(1)) < 1e-12) // orthogonal
  }

  test("euclidean squared") {
    val e = df.select(VectorFunctions.euclideanSq(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(e.toSeq == Seq(9.0 + 49.0 + 9.0, 0.0 + 1.0 + 1.0))
  }
}
