package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-3 contract queries (batch 3): the ANSI linear-regression
  * aggregate family and higher-moment / bitwise aggregates.
  *
  * Same determinism discipline as the earlier files (SURVEY §5.2):
  * doubles rounded in-query, BIGINT-aligned ints, total ORDER BY.
  */
object ContractQueries4 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- Q85 linear-regression aggregates (A-19) ---------------------------
  // The full ANSI regr_* family over lineitem: price regressed on
  // quantity per return flag. Both engines implement the same textbook
  // covar_pop/var_pop forms; rounding absorbs last-ulp division noise.
  def q85Regr(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("regr_count(l_extendedprice, l_quantity)").cast("long").as("rc"),
        round(expr("regr_avgx(l_extendedprice, l_quantity)"), 4).as("ax"),
        round(expr("regr_avgy(l_extendedprice, l_quantity)"), 4).as("ay"),
        round(expr("regr_slope(l_extendedprice, l_quantity)"), 4).as("sl"),
        round(expr("regr_intercept(l_extendedprice, l_quantity)"), 4).as("ic"),
        round(expr("regr_r2(l_extendedprice, l_quantity)"), 6).as("r2"))
      .orderBy("l_returnflag")

  // ---- Q86 higher moments + bitwise aggregates (A-20, F-9b) --------------
  // Spark's skewness/kurtosis are the POPULATION forms ((Σd³/n)/(Σd²/n)^1.5
  // and (Σd⁴/n)/(Σd²/n)² − 3); DuckDB's built-ins are the sample-corrected
  // forms, so the oracle spells out the population moments explicitly —
  // an honest cross-engine pin of the definition, not just the name.
  def q86Moments(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        round(skewness(col("o_totalprice")), 6).as("sk"),
        round(kurtosis(col("o_totalprice")), 6).as("kt"),
        expr("bit_and(o_custkey)").cast("long").as("ba"),
        expr("bit_or(o_custkey)").cast("long").as("bo"),
        expr("bit_xor(o_custkey)").cast("long").as("bx"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  /** Round-3 batch-3 contract queries keyed by id. */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q85_regr" -> (q85Regr _),
    "q86_moments" -> (q86Moments _))
}
