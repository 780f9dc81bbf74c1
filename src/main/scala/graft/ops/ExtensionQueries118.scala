package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 extension queries, batch 118: two named decision rules over
  * exact sufficient statistics — the Youden-J optimal operating point
  * (WHERE to cut a score, completing the eval family's AUC E-66 /
  * confusion E-44 / MRR E-231 "how good is the ranking" rows) and the
  * Grubbs maximum-deviation outlier test (a named single-outlier test
  * beside the MAD-z E-118 and 3σ screens). Counts/deviations stay
  * exact integers; each final statistic is one settled float formula
  * identical on both engines (E-446 discipline).
  */
object ExtensionQueries118 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-463 Youden-J optimal threshold --------------------------------------------------
  // Treat account balance as a score for "BUILDING-segment customer"
  // (predict positive when cents > thr) and pick the operating point
  // maximizing J = TPR − FPR over the E-458 histogram spine: 256
  // fixed-width integer bin edges from a 1-row (min, max) broadcast,
  // ONE data pass, cumulative counts over the ≤256-row histogram. TPR
  // and FPR are IEEE divisions of exact longs; tiebreak (j desc, thr
  // asc). The all-or-none edges (empty right side) are excluded like
  // E-458's.
  def extYouden(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "customer").select(
      round(col("c_acctbal") * 100).cast("long").as("x"),
      (col("c_mktsegment") === "BUILDING").cast("long").as("pos"))
    val bounds = o.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    val hist = o.crossJoin(broadcast(bounds))
      .select(expr("(x - lo) * 256 div (hi - lo + 1)").as("bin"),
        col("pos"), col("lo"), col("hi"))
      .groupBy("bin", "lo", "hi")
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("p"))
    val w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    hist
      .withColumn("nl", sum(col("n")).over(w))
      .withColumn("pl", sum(col("p")).over(w))
      .crossJoin(broadcast(o.agg(count(lit(1)).as("nt"), sum(col("pos")).as("pt"))))
      .filter(col("nl") < col("nt"))
      .select(
        expr("lo + (bin + 1) * (hi - lo + 1) div 256 - 1").as("thr"),
        (col("pt") - col("pl")).as("tp"),
        (col("nt") - col("nl") - (col("pt") - col("pl"))).as("fp"),
        col("pt"), col("nt"), col("nl"), col("pl"))
      .select(col("thr"), col("tp"), col("fp"),
        round(col("tp").cast("double") / col("pt").cast("double"), 6).as("tpr6"),
        round(col("fp").cast("double") /
          (col("nt") - col("pt")).cast("double"), 6).as("fpr6"),
        round(col("tp").cast("double") / col("pt").cast("double") -
          col("fp").cast("double") / (col("nt") - col("pt")).cast("double"), 6)
          .as("j6"))
      .orderBy(col("j6").desc, col("thr").asc)
      .limit(1)
  }

  // ---- E-464 Grubbs maximum-deviation outlier test ---------------------------------------
  // G = max |y − ȳ| / s over the daily-revenue series, argmax day
  // reported. Cross-multiplied exactness: the deviation argmax is on
  // |n·y − S| (exact decimal), and G = |n·y − S| ·
  // sqrt((n−1) / (n · (n·Q − S²))) is one settled float from three
  // exact decimal sufficient statistics (S, Q, n). flagged = G > 3.0
  // (the fixed asymptotic cut, documented — exact critical values are
  // n-dependent; 3.0 is the conventional screen).
  def extGrubbs(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("dy"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
    val st = daily.agg(count(lit(1)).cast(d38).as("n"),
      sum(col("y")).cast(d38).as("sy"),
      sum(col("y").cast(d38) * col("y").cast(d38)).as("qy"))
    val dev = daily.crossJoin(broadcast(st))
      .select(col("dy"), col("y"),
        abs(col("y").cast(d38) * col("n") - col("sy")).as("a"),
        col("n"), col("sy"), col("qy"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("a").desc, col("dy").asc)))
      .filter(col("rk") === 1)
    dev.select(col("dy").as("peak_day"), col("y").as("peak_cents"),
        col("n").cast("long").as("n_days"),
        round(col("a").cast("double") *
          sqrt((col("n") - 1).cast("double") /
            (col("n").cast("double") *
              (col("n") * col("qy") - col("sy") * col("sy")).cast("double"))), 4)
          .as("g4"))
      .withColumn("flagged", col("g4") > 3.0)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_youden" -> (extYouden _),
    "ext_grubbs" -> (extGrubbs _))

  val oracleSql: Map[String, String] = Map(
    // E-463: identical histogram spine + IEEE-exact J ranking.
    "ext_youden" ->
      """with o as (select cast(round(c_acctbal * 100) as bigint) x,
        |    cast(c_mktsegment = 'BUILDING' as bigint) pos from customer),
        |bounds as (select min(x) lo, max(x) hi from o),
        |tot as (select count(*) nt, sum(pos) pt from o),
        |hist as (select (x - lo) * 256 // (hi - lo + 1) bin,
        |    any_value(lo) lo, any_value(hi) hi, count(*) n, sum(pos) p
        |  from o cross join bounds group by 1),
        |cum as (select bin, lo, hi,
        |    sum(n) over (order by bin rows between unbounded preceding
        |      and current row) nl,
        |    sum(p) over (order by bin rows between unbounded preceding
        |      and current row) pl
        |  from hist),
        |cuts as (select lo + (bin + 1) * (hi - lo + 1) // 256 - 1 thr,
        |    cast(pt - pl as bigint) tp,
        |    cast(nt - nl - (pt - pl) as bigint) fp, pt, nt
        |  from cum cross join tot where nl < nt)
        |select thr, tp, fp,
        |  round(cast(tp as double) / cast(pt as double), 6) tpr6,
        |  round(cast(fp as double) / cast(nt - pt as double), 6) fpr6,
        |  round(cast(tp as double) / cast(pt as double) -
        |        cast(fp as double) / cast(nt - pt as double), 6) j6
        |from cuts order by j6 desc, thr asc limit 1""".stripMargin,
    // E-464: identical exact sufficient statistics + settled G.
    "ext_grubbs" ->
      """with daily as (select cast(o_orderdate as date) dy,
        |    cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint) y
        |  from orders group by 1),
        |st as (select cast(count(*) as hugeint) n,
        |    cast(sum(y) as hugeint) sy,
        |    cast(sum(cast(y as hugeint) * cast(y as hugeint)) as hugeint) qy
        |  from daily),
        |dev as (select dy, y, abs(cast(y as hugeint) * n - sy) a, n, sy, qy,
        |    row_number() over (order by abs(cast(y as hugeint) * n - sy) desc,
        |      dy asc) rk
        |  from daily cross join st)
        |select dy peak_day, y peak_cents, cast(n as bigint) n_days,
        |  round(cast(a as double) *
        |    sqrt(cast(n - 1 as double) /
        |      (cast(n as double) * cast(n * qy - sy * sy as double))), 4) g4,
        |  round(cast(a as double) *
        |    sqrt(cast(n - 1 as double) /
        |      (cast(n as double) * cast(n * qy - sy * sy as double))), 4) > 3.0
        |    flagged
        |from dev where rk = 1""".stripMargin)
}
