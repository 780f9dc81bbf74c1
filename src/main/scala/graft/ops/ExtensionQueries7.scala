package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 extension queries, batch 7: dialect-free interpolated
  * percentiles, bipartite co-occurrence projection, and rolling trend
  * estimation — each built on exact integer rank/sum machinery so the
  * contracts pin across engines.
  */
object ExtensionQueries7 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  // ---- A-23 interpolated percentiles (engine-neutral) --------------------------
  // percentile_cont without either engine's quantile built-in (their
  // interpolation dialects differ): pos·100 = (n−1)·p stays INTEGER, so
  // lo = (n−1)p div 100 and rem = (n−1)p mod 100 are exact, and the
  // only float op is the final v_lo + rem·(v_hi−v_lo)/100 — identical
  // on both engines. One rank window per group + two positional joins.
  def extPctlCont(s: SparkSession, dir: String): DataFrame = {
    val v = t(s, dir, "orders").select(col("o_orderstatus").as("st"),
      cents(col("o_totalprice")).as("v"), col("o_orderkey").as("k"))
    val ranked = v
      .withColumn("rn", row_number().over(
        Window.partitionBy("st").orderBy("v", "k")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("st")))
    val spec = ranked.select("st", "n").distinct()
      .select(col("st"), col("n"),
        explode(array(lit(25L), lit(50L), lit(75L), lit(90L))).as("p"))
      .withColumn("lo", expr("((n - 1) * p) div 100"))
      .withColumn("rem", expr("((n - 1) * p) % 100"))
    val lo = ranked.select(col("st").as("st1"), col("rn").as("rn1"),
      col("v").as("v_lo"))
    val hi = ranked.select(col("st").as("st2"), col("rn").as("rn2"),
      col("v").as("v_hi"))
    spec
      .join(lo, col("st1") === spec("st") && col("rn1") === spec("lo") + 1)
      .join(hi, col("st2") === spec("st") && col("rn2") === spec("lo") + 2,
        "left")
      .select(spec("st").as("st"), col("p"),
        round((col("v_lo") +
          col("rem") * (coalesce(col("v_hi"), col("v_lo")) - col("v_lo"))
            / 100.0) / 100.0, 4).as("pctl"))
      .orderBy("st", "p")
  }

  // ---- E-133 bipartite co-occurrence projection ---------------------------------
  // Suppliers ranked by shared part assortment (the co-citation
  // projection of the supplier–part graph). The fan-out of the
  // part-keyed self-join is deg² per part; `maxDegree` drops hub parts
  // first — the dfCap discipline of text/SparseCosine — a no-op at
  // fixture degrees but the knob a Zipfian 100 TB graph requires.
  def extCocite(s: SparkSession, dir: String): DataFrame = {
    val edges = t(s, dir, "lineitem")
      .select(col("l_suppkey").as("s"), col("l_partkey").as("p")).distinct()
    val maxDegree = 1000L
    val deg = edges.groupBy("p").agg(count(lit(1)).as("d"))
      .filter(col("d") <= maxDegree)
    val pruned = edges.join(deg.select("p"), "p")
    val pairs = pruned.select(col("p"), col("s").as("s_a"))
      .join(pruned.select(col("p"), col("s").as("s_b")), "p")
      .filter(col("s_a") < col("s_b"))
      .groupBy("s_a", "s_b").agg(count(lit(1)).as("shared"))
    pairs.orderBy(desc("shared"), asc("s_a"), asc("s_b")).limit(20)
  }

  // ---- E-134 rolling 28-day trend -----------------------------------------------
  // Per-day OLS slope of daily revenue over the trailing 28 days — the
  // trend detector next to CUSUM's changepoint scan. x = absolute day
  // index, y = exact daily cents: all four windowed sums are integer
  // (Σxy < 2^53), the slope is one settled float expression. Windows
  // run over the 2.4k-row daily frame, never the raw table.
  def extRollTrend(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(to_date(date_trunc("day", col("o_orderdate"))).as("dy"))
      .agg(sum(cents(col("o_totalprice"))).as("y"))
      .withColumn("x", datediff(col("dy"), lit("1992-01-01")).cast("long"))
    val w = Window.orderBy("dy").rowsBetween(-27, Window.currentRow)
    val out = daily
      .withColumn("nw", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .withColumn("sxy", sum(col("x") * col("y")).over(w))
    out.filter(col("nw") === 28) // only full windows: head-of-series
      // slopes are noise and n<28 frames differ in UNBOUNDED dialects
      .select(col("dy").cast("string").as("dy"),
        round((col("nw") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("nw") * col("sxx") - col("sx") * col("sx")).cast("double"), 6)
          .as("slope"))
      .orderBy("dy")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_pctl_cont" -> (extPctlCont _),
    "ext_cocite" -> (extCocite _),
    "ext_rolltrend" -> (extRollTrend _))

  val oracleSql: Map[String, String] = Map(
    // A-23: identical integer rank/lo/rem machinery; the final
    // interpolation expression token-matches the Spark column.
    "ext_pctl_cont" ->
      """with v as (select o_orderstatus st,
        |    cast(round(o_totalprice * 100, 0) as bigint) v, o_orderkey k
        |  from orders),
        |r as (select st, v,
        |    row_number() over (partition by st order by v, k) rn,
        |    count(*) over (partition by st) n
        |  from v),
        |spec as (select st, n, p, ((n - 1) * p) // 100 lo,
        |    ((n - 1) * p) % 100 rem
        |  from (select distinct st, n from r), unnest([25, 50, 75, 90]) u(p)),
        |j as (select s.st, s.p, s.rem, a.v v_lo, b.v v_hi
        |  from spec s
        |  join r a on a.st = s.st and a.rn = s.lo + 1
        |  left join r b on b.st = s.st and b.rn = s.lo + 2)
        |select st, cast(p as bigint) p,
        |  round((v_lo + rem * (coalesce(v_hi, v_lo) - v_lo) / 100.0)
        |    / 100.0, 4) pctl
        |from j order by st, p""".stripMargin,

    // E-133: the projection spec; the degree cap is a no-op at fixture
    // scale so the oracle omits it.
    "ext_cocite" ->
      """with e as (select distinct l_suppkey s, l_partkey p from lineitem)
        |select a.s s_a, b.s s_b, cast(count(*) as bigint) shared
        |from e a join e b on a.p = b.p and a.s < b.s
        |group by a.s, b.s
        |order by shared desc, s_a, s_b limit 20""".stripMargin,

    // E-134: identical integer windowed sums over the identical daily
    // frame; full 28-row windows only.
    "ext_rolltrend" ->
      """with daily as (select cast(o_orderdate as date) dy,
        |    cast(sum(cast(round(o_totalprice * 100, 0) as bigint)) as bigint) y
        |  from orders group by 1),
        |d as (select dy, y,
        |    cast(datediff('day', date '1992-01-01', dy) as bigint) x
        |  from daily),
        |w as (select dy,
        |    cast(count(*) over win as bigint) nw,
        |    cast(sum(x) over win as bigint) sx,
        |    cast(sum(y) over win as bigint) sy,
        |    cast(sum(x * x) over win as bigint) sxx,
        |    cast(sum(x * y) over win as bigint) sxy
        |  from d
        |  window win as (order by dy rows between 27 preceding and current row))
        |select cast(dy as varchar) dy,
        |  round(cast(nw * sxy - sx * sy as double)
        |    / cast(nw * sxx - sx * sx as double), 6) slope
        |from w where nw = 28 order by dy""".stripMargin)
}
