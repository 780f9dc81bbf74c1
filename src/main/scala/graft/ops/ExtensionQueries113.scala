package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 extension queries, batch 113: a simplified Dickey-Fuller
  * unit-root check (is the revenue series mean-reverting or a random
  * walk?) completing the E-275 (DW) / E-366 (Ljung-Box) diagnostic
  * family. E-446 exactness split: every sufficient statistic is an
  * exact decimal(38,0) cross-multiplied sum; only the final test
  * statistic is a settled float computed by the IDENTICAL expression
  * on both engines.
  */
object ExtensionQueries113 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private val s38 = "decimal(38,0)"

  private def daily(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("dy")
    t(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("dy"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
      .withColumn("x", row_number().over(w).cast("long"))
  }

  // ---- E-454 simplified Dickey-Fuller ------------------------------------------------
  // Regress Δy_t on y_{t-1} (with intercept): slope ≈ 0 ⇒ random walk
  // (differences carry no pull-back), slope « 0 ⇒ mean reversion. The
  // slope A∕B and its t-statistic come from three exact decimal
  // sufficient statistics A = mΣzd − ΣzΣd, B = mΣz² − (Σz)²,
  // C = mΣd² − (Σd)²; t = (A∕B) ∕ sqrt((C − A²∕B)∕((m−2)·B)) as one
  // settled float. (The full ADF adds lagged-difference terms —
  // documented simplification, the DF(0) case.)
  def extDickeyFuller(s: SparkSession, dir: String): DataFrame = {
    val d = daily(s, dir)
    val pairs = d.select(col("x"), col("y").as("z"))
      .join(d.select((col("x") - 1).as("x"), col("y").as("ynext")), Seq("x"))
      .select(col("z"), (col("ynext") - col("z")).as("d"))
    val st = pairs.agg(
      count(lit(1)).cast(s38).as("m"),
      sum(col("z")).cast(s38).as("sz"),
      sum(col("d")).cast(s38).as("sd"),
      sum(col("z").cast(s38) * col("z").cast(s38)).as("szz"),
      sum(col("z").cast(s38) * col("d").cast(s38)).as("szd"),
      sum(col("d").cast(s38) * col("d").cast(s38)).as("sdd"))
    st.select(col("m").cast("long").as("n_obs"),
        expr("CAST(m * szd - sz * sd AS DOUBLE)").as("a"),
        expr("CAST(m * szz - sz * sz AS DOUBLE)").as("b"),
        expr("CAST(m * sdd - sd * sd AS DOUBLE)").as("c"),
        col("m").cast("double").as("em"))
      .select(col("n_obs"),
        round(col("a") / col("b"), 8).as("slope8"),
        round((col("a") / col("b")) /
          sqrt((col("c") - col("a") * col("a") / col("b")) /
            ((col("em") - 2) * col("b"))), 4).as("t_stat4"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_dickeyfuller" -> (extDickeyFuller _))

  private val dailySql =
    """daily as (select dy, y,
      |    cast(row_number() over (order by dy) as bigint) x from (
      |  select cast(o_orderdate as date) dy,
      |    cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint) y
      |  from orders group by 1) t)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // E-454: identical exact sufficient statistics + settled formula.
    "ext_dickeyfuller" ->
      s"""with $dailySql,
        |pairs as (select a.y z, b.y - a.y d from daily a
        |  join daily b on b.x = a.x + 1),
        |st as (select cast(count(*) as hugeint) m,
        |    cast(sum(z) as hugeint) sz, cast(sum(d) as hugeint) sd,
        |    cast(sum(cast(z as hugeint) * cast(z as hugeint)) as hugeint) szz,
        |    cast(sum(cast(z as hugeint) * cast(d as hugeint)) as hugeint) szd,
        |    cast(sum(cast(d as hugeint) * cast(d as hugeint)) as hugeint) sdd
        |  from pairs),
        |f as (select cast(m as bigint) n_obs,
        |    cast(m * szd - sz * sd as double) a,
        |    cast(m * szz - sz * sz as double) b,
        |    cast(m * sdd - sd * sd as double) c,
        |    cast(m as double) em from st)
        |select n_obs, round(a / b, 8) slope8,
        |  round((a / b) / sqrt((c - a * a / b) / ((em - 2) * b)), 4) t_stat4
        |from f""".stripMargin)
}
