package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline / Pareto frontier (E-78): the points not dominated in
  * (minimize x, maximize y) — "best y seen so far" as x grows. The
  * classic sort-filter algorithm made relational:
  *
  *  1. collapse to one candidate per x (max y — anything less at the
  *     same x is dominated by its own group);
  *  2. one ordered window over the DISTINCT x values: keep x iff its
  *     y exceeds every earlier x's y (strict — equal y is dominated
  *     by the earlier point).
  *
  * The window runs over x-cardinality rows (post-aggregation), not the
  * input: at 100 TB the frontier computation costs one group-by plus a
  * window over the distinct-x table. Higher dimensions need the
  * block-nested-loops skyline; 2-D is the common monitoring case
  * (time vs best-metric).
  */
object Skyline {

  /** @return (x, y) frontier rows, ascending x, strictly increasing y */
  def frontier2d(df: DataFrame, x: Column, y: Column): DataFrame = {
    val w = Window.orderBy("x")
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(x.as("x"), y.as("y"))
      .groupBy("x").agg(max("y").as("y"))
      .withColumn("prior", max("y").over(w))
      .filter(col("prior").isNull || col("y") > col("prior"))
      .select("x", "y")
  }
}
