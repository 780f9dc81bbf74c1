package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 63: operations-research planning —
  * the newsvendor critical-fractile stocking level from the empirical
  * demand distribution (integer cross-multiplied quantile) and Erlang-C
  * call-center staffing from measured arrival rates (quantized-log
  * factorial terms). (Safety stock was dropped as a duplicate of E-268.)
  */
object ExtensionQueries63 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def dailyBrandDemand(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"),
        to_date(col("l_shipdate")).as("dy"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))

  // ---- E-340 newsvendor critical fractile ----------------------------------------
  // How much to stock when underage costs cu = 3 and overage co = 1:
  // q* = the smallest daily demand level whose empirical CDF reaches
  // cu/(cu+co) = 3/4, per brand — decided by INTEGER cross-multiply
  // (4·days_at_or_below ≥ 3·n_days) over the value-level cumulative
  // count, never a float percentile. Top-15 brands by q*.
  def extNewsvendor(s: SparkSession, dir: String): DataFrame = {
    val d = dailyBrandDemand(s, dir)
    val byLevel = d.groupBy("brand", "q").agg(count(lit(1)).as("nd"))
    val w = Window.partitionBy("brand").orderBy("q")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byLevel
      .withColumn("cum", sum("nd").over(w))
      .withColumn("n_days",
        sum("nd").over(Window.partitionBy("brand")))
    cum.filter(col("cum") * 4 >= col("n_days") * 3)
      .groupBy("brand")
      .agg(min("q").as("q_star"), max("n_days").as("n_days"))
      .orderBy(desc("q_star"), asc("brand"))
      .limit(15)
  }

  // ---- E-341 Erlang-C staffing ---------------------------------------------------
  // P(wait) for c support agents given the MEASURED event arrival rate
  // λ (events/sec over the fixture span) and a 300 s mean handle time:
  // a = λ/μ, ErlangC = (a^c/c!) / ((1−ρ)·Σ_{k<c} a^k/k! + a^c/c!).
  // The a^k/k! terms come from a cumulative quantized-log fold over
  // the k-spine (exact integer sums of 1e-9-quantized log(a/j)), so
  // both engines build bit-identical terms; ρ ≥ 1 rows report null
  // (unstable system). One row per c in 2..8.
  def extErlangc(s: SparkSession, dir: String): DataFrame = {
    val rate = t(s, dir, "events")
      .agg(count(lit(1)).as("n"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
          .as("span_us"))
      .select((col("n").cast("double") / (col("span_us") / 1e6)).as("lam"))
      .withColumn("a", col("lam") * 300.0)
    val ks = t(s, dir, "events").sparkSession.range(1, 9)
      .select(col("id").cast("long").as("k"))
    // qsum_k = Σ_{j≤k} round(log(a/j)·1e9): term_k = a^k/k! =
    // exp(qsum_k/1e9) — identical on both engines by construction
    val wk = Window.orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val terms = ks.crossJoin(broadcast(rate))
      .withColumn("qlog", round(log(col("a") / col("k")) * 1e9).cast("long"))
      .withColumn("qsum", sum("qlog").over(wk))
      .select(col("k"), col("a"), col("lam"),
        exp(col("qsum").cast("double") / 1e9).as("term"))
    // prefix sums S_{c-1} = 1 + Σ_{k≤c−1} term_k (the k=0 term is 1)
    val withPrefix = terms
      .withColumn("prefix", lit(1.0) + sum("term").over(wk) - col("term"))
    withPrefix.filter(col("k").between(2, 8))
      .select(col("k").as("servers"), col("a"),
        (col("a") / col("k")).as("rho"), col("term"), col("prefix"),
        col("lam"))
      .select(col("servers"), round(col("rho"), 4).as("rho"),
        when(col("rho") < 1,
          round(col("term") / ((lit(1.0) - col("rho")) * col("prefix") +
            col("term")), 6)).as("p_wait"),
        when(col("rho") < 1,
          round(col("term") / ((lit(1.0) - col("rho")) * col("prefix") +
            col("term")) / (col("servers") / 300.0 - col("lam")), 2))
          .as("mean_wait_sec"))
      .orderBy("servers")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_newsvendor" -> (extNewsvendor _),
    "ext_erlangc" -> (extErlangc _))

  private val demandSql =
    """d as (select p_brand brand, cast(l_shipdate as date) dy,
      |    cast(sum(cast(l_quantity as bigint)) as bigint) q
      |  from lineitem join part on l_partkey = p_partkey
      |  group by 1, 2)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // E-340: identical value-level CDF and cross-multiplied fractile.
    "ext_newsvendor" ->
      s"""with $demandSql,
        |lvl as (select brand, q, cast(count(*) as bigint) nd
        |  from d group by brand, q),
        |cum as (select brand, q, nd,
        |    cast(sum(nd) over (partition by brand order by q
        |      rows unbounded preceding) as bigint) cum,
        |    cast(sum(nd) over (partition by brand) as bigint) n_days
        |  from lvl)
        |select brand, min(q) q_star, max(n_days) n_days
        |from cum where cum * 4 >= n_days * 3
        |group by brand order by q_star desc, brand limit 15""".stripMargin,

    // E-341: identical measured rate and quantized-log factorial terms.
    "ext_erlangc" ->
      """with rate as (select
        |    cast(count(*) as double) /
        |      ((max(epoch_us(ts)) - min(epoch_us(ts))) / 1e6) lam
        |  from events),
        |a as (select lam, lam * 300.0 a from rate),
        |ks as (select cast(k as bigint) k from range(1, 9) r(k)),
        |ql as (select k, a.a, a.lam,
        |    cast(round(ln(a.a / k) * 1e9) as bigint) qlog
        |  from ks cross join a),
        |tm as (select k, a, lam,
        |    exp(cast(sum(qlog) over (order by k rows unbounded preceding)
        |      as double) / 1e9) term
        |  from ql),
        |pf as (select k, a, lam, term,
        |    1.0 + sum(term) over (order by k rows unbounded preceding)
        |      - term prefix
        |  from tm)
        |select k servers, round(a / k, 4) rho,
        |  case when a / k < 1 then
        |    round(term / ((1.0 - a / k) * prefix + term), 6) end p_wait,
        |  case when a / k < 1 then
        |    round(term / ((1.0 - a / k) * prefix + term) /
        |      (k / 300.0 - lam), 2) end mean_wait_sec
        |from pf where k between 2 and 8 order by servers""".stripMargin)
}
