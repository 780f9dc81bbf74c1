package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over ARRAY<FLOAT>/ARRAY<DOUBLE> embeddings.
  *
  * Built on Spark's codegen'd higher-order functions (`zip_with`,
  * `aggregate`) — no UDFs, so the expressions stay inside whole-stage
  * codegen and Catalyst can see through the projection. Elements are cast
  * to double BEFORE multiply/accumulate so results are engine-portable
  * (float accumulation differs between engines).
  */
object VectorFunctions {

  /** Sequential-fold dot product: Σ aᵢ·bᵢ (as double). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Squared L2 norm Σ aᵢ² (as double). */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity dot(a,b) / (|a|·|b|). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared euclidean distance Σ (aᵢ-bᵢ)². */
  def euclideanSq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0),
      (acc, v) => acc + v)
}
