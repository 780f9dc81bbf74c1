package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric int8 embedding quantization — the standard storage/ANN
  * compression step for 100 TB-scale vector corpora (4× smaller than
  * float32, and int8 dot products SIMD-vectorize downstream).
  *
  * Per vector: scale = max |x_i| (the symmetric absmax scheme), code_i =
  * ⌊x_i·127/scale + ½⌋ clamped to [−127, 127]. The arithmetic is pinned
  * to floor(double·double + 0.5) — not round() — so every engine
  * reproduces the codes bit-for-bit (round()'s half-even/half-up
  * behavior varies across engines; floor does not). Zero vectors get
  * scale 0 and all-zero codes rather than a division error.
  *
  * Pure codegen'd higher-order projection: no UDF, no shuffle — the
  * operator cost is one pass over the vectors wherever they already
  * live. Dequantize(quantize(x)) ≈ x with |err| ≤ scale/254 per
  * component, property-tested in QuantizeSpec.
  */
object Quantize {

  /** absmax of a float array as double (0.0 for empty/all-zero). */
  def absMax(vec: Column): Column =
    aggregate(vec, lit(0.0d), (acc, x) => greatest(acc, abs(x.cast("double"))))

  /** int8 codes (as array<int> for portability) under scale = absmax. */
  def int8Codes(vec: Column, scale: Column): Column =
    transform(vec, x =>
      when(scale === 0d, lit(0))
        .otherwise(
          greatest(lit(-127),
            least(lit(127),
              floor(x.cast("double") * 127d / scale + 0.5d).cast("int")))))

  /** Adds `scale` and `codes` columns for `vecCol`. */
  def quantize(df: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val s = absMax(col(vecCol))
    df.withColumn("scale", s).withColumn("codes", int8Codes(col(vecCol), s))
  }

  /** Reconstruction: codes → approximate float vector (for QuantizeSpec's
    * error-bound property; production consumers use the codes directly).
    */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => (c.cast("double") * scale / 127d).cast("float"))
}
