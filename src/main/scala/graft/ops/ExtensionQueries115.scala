package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 extension queries, batch 115: in-plan supervised-learning
  * primitives with zero global sorts — a histogram-based decision stump
  * (the split-finding kernel of every large-scale tree learner) and a
  * truncated simple-exponential-smoothing forecast backtest whose α=1/2
  * weights are exact powers of two, so the whole smoother is integer
  * arithmetic until one final settled division.
  */
object ExtensionQueries115 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-458 histogram decision stump --------------------------------------------------
  // Best single split of order price predicting high priority, the
  // LightGBM-style histogram way: 256 fixed-width integer bin edges from
  // a 1-row (min, max) broadcast — NO global sort over distinct feature
  // values; candidate thresholds are bin upper edges, cumulated over the
  // ≤256-row histogram. Split quality = weighted Gini; the comparison
  // ratio num/den is built from exact decimal counts and settled by one
  // IEEE int→double cast + division (correctly rounded on both engines).
  // Tiebreak: gini asc, threshold asc. Right-empty splits excluded.
  def extStump(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(
      round(col("o_totalprice") * 100).cast("long").as("x"),
      (col("o_orderpriority") < "3").cast("long").as("pos"))
    val bounds = o.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    val hist = o.crossJoin(broadcast(bounds))
      .select(expr("(x - lo) * 256 div (hi - lo + 1)").as("bin"),
        col("pos"), col("lo"), col("hi"))
      .groupBy("bin", "lo", "hi")
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("p"))
    val w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    val d38 = "decimal(38,0)"
    val cuts = hist
      .withColumn("nl", sum(col("n")).over(w))
      .withColumn("pl", sum(col("p")).over(w))
      .crossJoin(broadcast(o.agg(count(lit(1)).as("nt"), sum(col("pos")).as("pt"))))
      .filter(col("nl") < col("nt")) // right side non-empty
      .select(
        // threshold = inclusive upper edge of the bin: x <= thr goes left
        expr("lo + (bin + 1) * (hi - lo + 1) div 256 - 1").as("thr"),
        col("nl").cast(d38).as("nl"), col("pl").cast(d38).as("pl"),
        (col("nt") - col("nl")).cast(d38).as("nr"),
        (col("pt") - col("pl")).cast(d38).as("pr"),
        col("nt").cast(d38).as("nt"))
      .select(col("thr"), col("nl"), col("pl"), col("nr"), col("pr"),
        (col("nr") * (col("nl") * col("nl") - col("pl") * col("pl") -
          (col("nl") - col("pl")) * (col("nl") - col("pl"))) +
         col("nl") * (col("nr") * col("nr") - col("pr") * col("pr") -
          (col("nr") - col("pr")) * (col("nr") - col("pr")))).as("num"),
        (col("nt") * col("nl") * col("nr")).as("den"))
      .select(col("thr"),
        col("nl").cast("long").as("n_left"), col("pl").cast("long").as("pos_left"),
        col("nr").cast("long").as("n_right"), col("pr").cast("long").as("pos_right"),
        round(col("num").cast("double") / col("den").cast("double"), 8).as("gini8"))
    cuts.orderBy(col("gini8").asc, col("thr").asc).limit(1)
  }

  // ---- E-459 exponential-smoothing backtest --------------------------------------------
  // One-step-ahead SES forecast of daily revenue with α = 1/2: weight of
  // lag j is 2^-(j+1), truncated at 60 lags (tail mass 2^-60 — documented
  // out), so S_t·2^60 = Σ_j y_{t-j}·2^(59-j) is an EXACT integer. The
  // lag join is an equi-join on x - off after exploding a 60-row offset
  // array (bounded 60× fan-out — never a range BNLJ). Backtest over days
  // with a full 60-lag history: SES MAE vs the naive y_t carry-forward
  // baseline, both exact decimal sums settled by one final division.
  def extSesBacktest(s: SparkSession, dir: String): DataFrame = {
    val wday = Window.orderBy("dy")
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("dy"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
      .withColumn("x", row_number().over(wday).cast("long"))
    val d38 = "decimal(38,0)"
    val lagged = daily.select(col("x"), explode(sequence(lit(0), lit(59))).as("lg"))
      .select(col("x"), col("lg"), (col("x") - col("lg")).as("xs"))
      .join(daily.select(col("x").as("xs"), col("y").as("ys")), Seq("xs"))
      .groupBy("x")
      .agg(count(lit(1)).as("k"),
        sum(col("ys").cast(d38) *
          expr("cast(shiftleft(cast(1 as bigint), cast(59 - lg as int)) as decimal(38,0))"))
          .as("s260"))
      .filter(col("k") === 60) // full history only
    val next = daily.select((col("x") - 1).as("x"), col("y").as("ynext"))
    val prev = daily.select(col("x"), col("y").as("ycur"))
    val errs = lagged.join(next, Seq("x")).join(prev, Seq("x"))
      .select(
        abs(col("ynext").cast(d38) * expr(s"cast(shiftleft(cast(1 as bigint), 60) as $d38)")
          - col("s260")).as("e_ses"),
        abs(col("ynext").cast(d38) * expr(s"cast(shiftleft(cast(1 as bigint), 60) as $d38)")
          - col("ycur").cast(d38) * expr(s"cast(shiftleft(cast(1 as bigint), 60) as $d38)"))
          .as("e_naive"))
    errs.agg(count(lit(1)).as("n_evals"),
        round(sum(col("e_ses")).cast("double") /
          (count(lit(1)) * expr("cast(shiftleft(cast(1 as bigint), 60) as double)")), 4)
          .as("mae_ses4"),
        round(sum(col("e_naive")).cast("double") /
          (count(lit(1)) * expr("cast(shiftleft(cast(1 as bigint), 60) as double)")), 4)
          .as("mae_naive4"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_histsplit" -> (extStump _),
    "ext_ses_backtest" -> (extSesBacktest _))

  val oracleSql: Map[String, String] = Map(
    // E-458: same histogram, same exact-count Gini ratio.
    "ext_histsplit" ->
      """with o as (select cast(round(o_totalprice * 100) as bigint) x,
        |    cast(o_orderpriority < '3' as bigint) pos from orders),
        |bounds as (select min(x) lo, max(x) hi from o),
        |tot as (select count(*) nt, sum(pos) pt from o),
        |hist as (select (x - lo) * 256 // (hi - lo + 1) bin,
        |    any_value(lo) lo, any_value(hi) hi,
        |    count(*) n, sum(pos) p
        |  from o cross join bounds group by 1),
        |cum as (select bin, lo, hi,
        |    sum(n) over (order by bin rows between unbounded preceding
        |      and current row) nl,
        |    sum(p) over (order by bin rows between unbounded preceding
        |      and current row) pl
        |  from hist),
        |cuts as (select
        |    lo + (bin + 1) * (hi - lo + 1) // 256 - 1 thr,
        |    cast(nl as hugeint) nl, cast(pl as hugeint) pl,
        |    cast(nt - nl as hugeint) nr, cast(pt - pl as hugeint) pr,
        |    cast(nt as hugeint) nt
        |  from cum cross join tot where nl < nt),
        |scored as (select thr,
        |    cast(nl as bigint) n_left, cast(pl as bigint) pos_left,
        |    cast(nr as bigint) n_right, cast(pr as bigint) pos_right,
        |    round(cast(nr * (nl*nl - pl*pl - (nl-pl)*(nl-pl)) +
        |               nl * (nr*nr - pr*pr - (nr-pr)*(nr-pr)) as double) /
        |          cast(nt * nl * nr as double), 8) gini8
        |  from cuts)
        |select * from scored order by gini8 asc, thr asc limit 1""".stripMargin,
    // E-459: identical dyadic-weight smoother, identical settled MAE.
    "ext_ses_backtest" ->
      """with daily as (select dy, y,
        |    cast(row_number() over (order by dy) as bigint) x from (
        |  select cast(o_orderdate as date) dy,
        |    cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint) y
        |  from orders group by 1) t),
        |offs as (select unnest(generate_series(0, 59)) lg),
        |lagged as (select d.x, count(*) k,
        |    sum(cast(s.y as hugeint) * ((1::bigint) << (59 - o.lg))) s260
        |  from daily d cross join offs o
        |  join daily s on s.x = d.x - o.lg
        |  group by 1 having count(*) = 60),
        |errs as (select
        |    abs(cast(n.y as hugeint) * ((1::bigint) << 60) - l.s260) e_ses,
        |    abs(cast(n.y as hugeint) * ((1::bigint) << 60)
        |      - cast(c.y as hugeint) * ((1::bigint) << 60)) e_naive
        |  from lagged l
        |  join daily n on n.x = l.x + 1
        |  join daily c on c.x = l.x)
        |select count(*) n_evals,
        |  round(cast(sum(e_ses) as double) /
        |    (count(*) * cast((1::bigint) << 60 as double)), 4) mae_ses4,
        |  round(cast(sum(e_naive) as double) /
        |    (count(*) * cast((1::bigint) << 60 as double)), 4) mae_naive4
        |from errs""".stripMargin)
}
