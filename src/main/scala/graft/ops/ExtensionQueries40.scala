package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 40: pattern mining and robust
  * fitting — frequent 3-itemsets (the Apriori step above E-59's
  * pairs), a deterministic-candidate RANSAC line fit with INTEGER
  * inlier tests, two-segment regression with exact-decimal prefix
  * moments, and a periodogram on quantized trigonometric weights.
  */
object ExtensionQueries40 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def h60(c: Column) =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  /** Daily revenue in exact cents with a 0-based day index. */
  private def daySeries(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("dy"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
      .withColumn("x",
        (row_number().over(Window.orderBy("dy")) - 1).cast("long"))

  // ---- E-276 frequent 3-itemsets -------------------------------------------------
  // The Apriori extension of E-59's pair rules: brand triples
  // co-purchased within an order. Join shape: distinct (order, brand)
  // items self-joined twice under b1 < b2 < b3 — fan-out bounded by
  // the per-order basket width (≤7 lineitems), never quadratic in
  // orders. Top-15 by support with full lexical tiebreak.
  def extTriples(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("o"), col("p_brand").as("b")).distinct()
    val triples = items.select(col("o"), col("b").as("b1"))
      .join(items.select(col("o"), col("b").as("b2")), "o")
      .filter(col("b1") < col("b2"))
      .join(items.select(col("o"), col("b").as("b3")), "o")
      .filter(col("b2") < col("b3"))
      .groupBy("b1", "b2", "b3").agg(count(lit(1)).as("support"))
    triples.orderBy(desc("support"), asc("b1"), asc("b2"), asc("b3"))
      .limit(15)
  }

  // ---- E-277 deterministic RANSAC line fit ---------------------------------------
  // Robust line through the daily-revenue series: 20 candidate lines
  // from HASH-chosen point pairs (the E-125 deterministic-coin
  // discipline — no RNG, both engines pick identical pairs), each
  // scored by its inlier count under the INTEGER cross-multiplied
  // band test |(y−y₁)·Δx − (x−x₁)·Δy| ≤ tol·|Δx| — no float enters
  // the vote. Top-5 candidates by (inliers desc, k).
  def extRansac(s: SparkSession, dir: String): DataFrame = {
    val d = daySeries(s, dir)
    val n = d.agg(count(lit(1)).as("n"))
    val ks = s.range(0, 20).select(col("id").cast("long").as("k"))
    val cand = broadcast(ks).crossJoin(broadcast(n))
      .select(col("k"),
        pmod(h60(concat(lit("ra|"), col("k"))), col("n")).as("i1"),
        col("n"))
      .withColumn("i2",
        pmod(col("i1") + 1 +
          pmod(h60(concat(lit("rb|"), col("k"))), col("n") - 1), col("n")))
    val p1 = cand.join(d.select(col("x").as("i1"), col("x").as("x1"),
      col("y").as("y1")), "i1")
    val p2 = p1.join(d.select(col("x").as("i2"), col("x").as("x2"),
      col("y").as("y2")), "i2")
      .select(col("k"), col("x1"), col("y1"),
        (col("x2") - col("x1")).as("ldx"), (col("y2") - col("y1")).as("ldy"))
      // 20 candidates, x unique per day; structural cap, ordered so an
      // overflow of the candidate domain stays deterministic
      .orderBy("k").limit(20)
    val tol = 500000L // $5k band, in cents
    val votes = d.crossJoin(broadcast(p2))
      .filter(abs((col("y") - col("y1")).cast("decimal(38,0)") * col("ldx") -
        (col("x") - col("x1")).cast("decimal(38,0)") * col("ldy")) <=
        lit(tol).cast("decimal(38,0)") * abs(col("ldx")))
      .groupBy("k", "ldx", "ldy")
      .agg(count(lit(1)).as("inliers"))
    votes.select(col("k"), col("inliers"),
        round(col("ldy").cast("double") / col("ldx") / 100, 4)
          .as("slope_dollars_per_day"))
      .orderBy(desc("inliers"), asc("k")).limit(5)
  }

  // ---- E-278 two-segment regression ----------------------------------------------
  // Where does the revenue trend BREAK? For every candidate split t
  // (≥30 days each side), total RSS of two independent line fits from
  // EXACT decimal prefix moments (n·Σ−Σ·Σ cross-multiplies — no
  // cross-engine sum-order noise, so the per-candidate doubles are
  // bit-identical and the argmin needs no rounding safety margin).
  // The slope version of E-206's level binseg.
  def extSegreg(s: SparkSession, dir: String): DataFrame = {
    val d = daySeries(s, dir)
      .select(col("dy"), col("x").cast("decimal(38,0)").as("x"),
        col("y").cast("decimal(38,0)").as("y"))
    val w = Window.orderBy("dy").rowsBetween(Window.unboundedPreceding, 0)
    val pre = d
      .withColumn("i", sum(lit(1L)).over(w))
      .withColumn("px", sum("x").over(w))
      .withColumn("py", sum("y").over(w))
      .withColumn("pxx", sum(col("x") * col("x")).over(w))
      .withColumn("pxy", sum(col("x") * col("y")).over(w))
      .withColumn("pyy", sum(col("y") * col("y")).over(w))
    val tot = pre.agg(max("i").as("n"), max("px").as("tx"),
      max("py").as("ty"), max("pxx").as("txx"), max("pxy").as("txy"),
      max("pyy").as("tyy"))
    def rss(nn: Column, sx: Column, sy: Column, sxx: Column, sxy: Column,
        syy: Column): Column = {
      val cyy = (nn * syy - sy * sy).cast("double")
      val cxx = (nn * sxx - sx * sx).cast("double")
      val cxy = (nn * sxy - sx * sy).cast("double")
      (cyy - cxy * cxy / cxx) / nn.cast("double")
    }
    val scored = pre.crossJoin(broadcast(tot))
      .filter(col("i") >= 30 && col("n") - col("i") >= 30)
      .withColumn("rss_l",
        rss(col("i"), col("px"), col("py"), col("pxx"), col("pxy"),
          col("pyy")))
      .withColumn("rss_r",
        rss(col("n") - col("i"), col("tx") - col("px"),
          col("ty") - col("py"), col("txx") - col("pxx"),
          col("txy") - col("pxy"), col("tyy") - col("pyy")))
      .withColumn("rss", col("rss_l") + col("rss_r"))
    scored.orderBy(asc("rss"), asc("dy"))
      .select(col("dy").cast("string").as("break_day"),
        col("i").cast("long").as("n_left"),
        round(col("rss_l") / 1e12, 6).as("rss_left_T"),
        round(col("rss_r") / 1e12, 6).as("rss_right_T"))
      .limit(1)
  }

  // ---- E-279 periodogram ---------------------------------------------------------
  // Which cycle dominates daily revenue? Discrete periodogram at
  // periods 2–14 days with cos/sin weights QUANTIZED to the 1e-6 grid
  // (E-257 discipline): A = Σy·c and B = Σy·s are exact decimals, the
  // power (A² + B² scaled) one settled expression per period. The
  // weekly cycle should win — reported as the full spectrum with the
  // winner flagged.
  def extPeriodogram(s: SparkSession, dir: String): DataFrame = {
    val d = daySeries(s, dir)
    val periods = s.range(2, 15).select(col("id").cast("long").as("p"))
    val weighted = d.crossJoin(broadcast(periods))
      .select(col("p"), col("y").cast("decimal(38,0)").as("y"),
        round(cos(lit(2 * math.Pi) * col("x") / col("p")) * 1e6)
          .cast("long").cast("decimal(38,0)").as("c"),
        round(sin(lit(2 * math.Pi) * col("x") / col("p")) * 1e6)
          .cast("long").cast("decimal(38,0)").as("s"))
    val spec = weighted.groupBy("p")
      .agg(count(lit(1)).as("n"), sum(col("y") * col("c")).as("a"),
        sum(col("y") * col("s")).as("b"))
      .select(col("p"), round(
        (col("a").cast("double") * col("a").cast("double") +
          col("b").cast("double") * col("b").cast("double")) /
          (col("n").cast("double") * 1e24), 2).as("power"))
    val best = spec.agg(max(struct(col("power"), (-col("p")).as("np")))
      .getField("np").as("np")).select((-col("np")).as("best_p"))
    spec.crossJoin(broadcast(best))
      .select(col("p"), col("power"), (col("p") === col("best_p"))
        .as("dominant"))
      .orderBy("p")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_triples" -> (extTriples _),
    "ext_ransac" -> (extRansac _),
    "ext_segreg" -> (extSegreg _),
    "ext_periodogram" -> (extPeriodogram _))

  private val daySql =
    """daily as (select cast(o_orderdate as date) dy,
      |    cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint) y
      |  from orders group by 1),
      |d as (select dy, y,
      |    cast(row_number() over (order by dy) as bigint) - 1 x
      |  from daily)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // E-276: identical basket triple join.
    "ext_triples" ->
      """with items as (select distinct l_orderkey o, p_brand b
        |  from lineitem join part on l_partkey = p_partkey)
        |select a.b b1, c.b b2, e.b b3, cast(count(*) as bigint) support
        |from items a join items c on a.o = c.o and a.b < c.b
        |join items e on a.o = e.o and c.b < e.b
        |group by a.b, c.b, e.b
        |order by support desc, b1, b2, b3 limit 15""".stripMargin,

    // E-277: identical hash-chosen candidates and integer band votes.
    "ext_ransac" ->
      s"""with $daySql,
        |n as (select cast(count(*) as bigint) n from d),
        |cand0 as (select k,
        |    ('0x' || substr(sha256('ra|' || cast(k as varchar)), 1, 15))::bigint
        |      % n i1, n
        |  from unnest(range(0, 20)) u(k) cross join n),
        |cand as (select k, i1,
        |    (i1 + 1 + ('0x' || substr(sha256('rb|' || cast(k as varchar)),
        |      1, 15))::bigint % (n - 1)) % n i2
        |  from cand0),
        |lines as (select k, p1.x x1, p1.y y1, p2.x - p1.x ldx,
        |    p2.y - p1.y ldy
        |  from cand join d p1 on p1.x = cand.i1
        |  join d p2 on p2.x = cand.i2),
        |votes as (select k, ldx, ldy, cast(count(*) as bigint) inliers
        |  from d cross join lines
        |  where abs(cast(d.y - y1 as hugeint) * ldx
        |    - cast(d.x - x1 as hugeint) * ldy) <= 500000::hugeint * abs(ldx)
        |  group by k, ldx, ldy)
        |select cast(k as bigint) k, inliers,
        |  round(cast(ldy as double) / ldx / 100, 4) slope_dollars_per_day
        |from votes order by inliers desc, k limit 5""".stripMargin,

    // E-278: identical exact prefix moments and per-candidate RSS.
    "ext_segreg" ->
      s"""with $daySql,
        |pre as (select dy,
        |    cast(row_number() over (order by dy) as hugeint) i,
        |    sum(cast(x as hugeint)) over (order by dy
        |      rows unbounded preceding) px,
        |    sum(cast(y as hugeint)) over (order by dy
        |      rows unbounded preceding) py,
        |    sum(cast(x as hugeint) * x) over (order by dy
        |      rows unbounded preceding) pxx,
        |    sum(cast(x as hugeint) * y) over (order by dy
        |      rows unbounded preceding) pxy,
        |    sum(cast(y as hugeint) * y) over (order by dy
        |      rows unbounded preceding) pyy
        |  from d),
        |tot as (select max(i) n, max(px) tx, max(py) ty, max(pxx) txx,
        |    max(pxy) txy, max(pyy) tyy from pre),
        |scored as (select dy, i,
        |    (cast(i * pyy - py * py as double)
        |      - cast(i * pxy - px * py as double)
        |        * cast(i * pxy - px * py as double)
        |        / cast(i * pxx - px * px as double)) / cast(i as double)
        |      rss_l,
        |    (cast((n - i) * (tyy - pyy) - (ty - py) * (ty - py) as double)
        |      - cast((n - i) * (txy - pxy) - (tx - px) * (ty - py) as double)
        |        * cast((n - i) * (txy - pxy) - (tx - px) * (ty - py)
        |          as double)
        |        / cast((n - i) * (txx - pxx) - (tx - px) * (tx - px)
        |          as double)) / cast(n - i as double) rss_r
        |  from pre cross join tot
        |  where i >= 30 and n - i >= 30)
        |select strftime(dy, '%Y-%m-%d') break_day, cast(i as bigint) n_left,
        |  round(rss_l / 1e12, 6) rss_left_T,
        |  round(rss_r / 1e12, 6) rss_right_T
        |from scored order by rss_l + rss_r, dy limit 1""".stripMargin,

    // E-279: identical quantized trig weights and settled powers.
    "ext_periodogram" ->
      s"""with $daySql,
        |weighted as (select p, cast(y as hugeint) y,
        |    cast(cast(round(cos(2 * pi() * x / p) * 1e6) as bigint)
        |      as hugeint) c,
        |    cast(cast(round(sin(2 * pi() * x / p) * 1e6) as bigint)
        |      as hugeint) s
        |  from d cross join unnest(range(2, 15)) u(p)),
        |spec as (select p, round(
        |    (cast(sum(y * c) as double) * cast(sum(y * c) as double)
        |      + cast(sum(y * s) as double) * cast(sum(y * s) as double))
        |    / (cast(count(*) as double) * 1e24), 2) power
        |  from weighted group by p),
        |best as (select min(p) best_p from spec
        |  where power = (select max(power) from spec))
        |select cast(p as bigint) p, power, p = best_p dominant
        |from spec cross join best order by p""".stripMargin)
}
