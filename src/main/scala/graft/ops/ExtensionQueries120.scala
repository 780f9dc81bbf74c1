package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 extension queries, batch 120: instrumental-variables
  * estimation — the one causal-inference estimator the E-195 (CUPED) /
  * E-295 (stratified adjustment) / E-296 (DiD) family still lacked.
  * Same discipline: exact decimal cross-multiplied moments, settled
  * float estimates, every diagnostic (first-stage F, Hausman-style
  * contrast) in the same row so the estimate can't be read without its
  * validity checks.
  */
object ExtensionQueries120 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private val d38 = "decimal(38,0)"

  // ---- E-467 two-stage least squares + Hausman contrast ----------------------------------
  // Per day: y = revenue cents (outcome), x = lineitem rows shipped
  // (endogenous regressor), z = distinct ordering customers
  // (instrument — drives volume, plausibly excluded from the
  // price-per-line residual). All slopes are covariance ratios of
  // exact decimal moments settled once:
  //   b_ols = Sxy/Sxx,  b_iv = Szy/Szx  (Wald/ratio form of 2SLS),
  //   first-stage F = (n−2)·Szx² / (Szz·Sxx − Szx²)  (z → x strength;
  //     weak-instrument screen F > 10 reported),
  //   hausman_gap = b_iv − b_ols (the endogeneity contrast).
  // S·· are n-scaled centered sums (n·Σab − ΣaΣb), exact until one
  // final cast each. Day frame = three aggregates on two scans.
  def ext2sls(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("dy"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"),
        countDistinct(col("o_custkey")).as("z"),
        count(lit(1)).as("n_ord"))
    val vol = t(s, dir, "lineitem")
      .join(t(s, dir, "orders").select(col("o_orderkey"),
        col("o_orderdate").cast("date").as("dy")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("dy").agg(count(lit(1)).as("x"))
    val d = rev.join(vol, Seq("dy"))
    val m = d.agg(
      count(lit(1)).cast(d38).as("n"),
      sum(col("x")).cast(d38).as("sx"),
      sum(col("y")).cast(d38).as("sy"),
      sum(col("z")).cast(d38).as("sz"),
      sum(col("x").cast(d38) * col("x").cast(d38)).as("sxx"),
      sum(col("z").cast(d38) * col("z").cast(d38)).as("szz"),
      sum(col("x").cast(d38) * col("y").cast(d38)).as("sxy"),
      sum(col("z").cast(d38) * col("y").cast(d38)).as("szy"),
      sum(col("z").cast(d38) * col("x").cast(d38)).as("szx"))
    m.select(
        col("n").cast("long").as("n_days"),
        round(expr("cast(n * sxy - sx * sy as double) / cast(n * sxx - sx * sx as double)"), 9)
          .as("b_ols9"),
        round(expr("cast(n * szy - sz * sy as double) / cast(n * szx - sz * sx as double)"), 9)
          .as("b_iv9"),
        round(expr("""(cast(n as double) - 2) *
            (cast(n * szx - sz * sx as double) * cast(n * szx - sz * sx as double)) /
            (cast(n * szz - sz * sz as double) * cast(n * sxx - sx * sx as double) -
             cast(n * szx - sz * sx as double) * cast(n * szx - sz * sx as double))"""), 4)
          .as("fs_f4"),
        round(expr("""cast(n * szy - sz * sy as double) / cast(n * szx - sz * sx as double) -
            cast(n * sxy - sx * sy as double) / cast(n * sxx - sx * sx as double)"""), 9)
          .as("hausman_gap9"))
      .withColumn("strong_instrument", col("fs_f4") > 10.0)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_2sls" -> (ext2sls _))

  val oracleSql: Map[String, String] = Map(
    // E-467: identical exact moments + identical settled ratios.
    "ext_2sls" ->
      """with rev as (select cast(o_orderdate as date) dy,
        |    cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint) y,
        |    count(distinct o_custkey) z, count(*) n_ord
        |  from orders group by 1),
        |vol as (select cast(o.o_orderdate as date) dy, count(*) x
        |  from lineitem l join orders o on l.l_orderkey = o.o_orderkey
        |  group by 1),
        |d as (select r.dy, r.y, r.z, v.x from rev r join vol v on r.dy = v.dy),
        |m as (select cast(count(*) as hugeint) n,
        |    cast(sum(x) as hugeint) sx, cast(sum(y) as hugeint) sy,
        |    cast(sum(z) as hugeint) sz,
        |    cast(sum(cast(x as hugeint) * cast(x as hugeint)) as hugeint) sxx,
        |    cast(sum(cast(z as hugeint) * cast(z as hugeint)) as hugeint) szz,
        |    cast(sum(cast(x as hugeint) * cast(y as hugeint)) as hugeint) sxy,
        |    cast(sum(cast(z as hugeint) * cast(y as hugeint)) as hugeint) szy,
        |    cast(sum(cast(z as hugeint) * cast(x as hugeint)) as hugeint) szx
        |  from d)
        |select cast(n as bigint) n_days,
        |  round(cast(n * sxy - sx * sy as double) /
        |        cast(n * sxx - sx * sx as double), 9) b_ols9,
        |  round(cast(n * szy - sz * sy as double) /
        |        cast(n * szx - sz * sx as double), 9) b_iv9,
        |  round((cast(n as double) - 2) *
        |    (cast(n * szx - sz * sx as double) * cast(n * szx - sz * sx as double)) /
        |    (cast(n * szz - sz * sz as double) * cast(n * sxx - sx * sx as double) -
        |     cast(n * szx - sz * sx as double) * cast(n * szx - sz * sx as double)), 4)
        |    fs_f4,
        |  round(cast(n * szy - sz * sy as double) /
        |        cast(n * szx - sz * sx as double) -
        |        cast(n * sxy - sx * sy as double) /
        |        cast(n * sxx - sx * sx as double), 9) hausman_gap9,
        |  round((cast(n as double) - 2) *
        |    (cast(n * szx - sz * sx as double) * cast(n * szx - sz * sx as double)) /
        |    (cast(n * szz - sz * sz as double) * cast(n * sxx - sx * sx as double) -
        |     cast(n * szx - sz * sx as double) * cast(n * szx - sz * sx as double)), 4)
        |    > 10.0 strong_instrument
        |from m""".stripMargin)
}
