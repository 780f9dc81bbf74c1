package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling (E-130): the describe-table a data team runs
  * before trusting any new ingest — per column: non-null/null counts,
  * exact distinct count, and lexicographic min/max of the STRING cast
  * (one uniform output schema across column types; integer/date/string
  * casts render identically on every engine, which is why the profile
  * contract sticks to those types).
  *
  * Scale shape: one aggregate per profiled column, unioned — parquet
  * column pruning means each pass scans ONLY its column, so profiling
  * k columns reads k column chunks, not k full-table scans; the
  * distinct count is exact (profiles gate data releases — approximate
  * would hide low-cardinality corruption). All 1-row frames, one
  * action for the whole profile.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      val s = col(c).cast("string")
      df.agg(
        count(lit(1)).as("n_rows"),
        count(s).as("non_null"),
        countDistinct(s).as("n_distinct"),
        min(s).as("min_str"),
        max(s).as("max_str"))
        .select(lit(c).as("col_name"), col("n_rows"),
          col("non_null"), (col("n_rows") - col("non_null")).as("n_nulls"),
          col("n_distinct"), col("min_str"), col("max_str"))
    }.reduce(_ unionAll _)
}
