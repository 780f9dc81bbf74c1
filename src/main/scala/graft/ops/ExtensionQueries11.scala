package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 11: corpus keyness (Dunning G²),
  * cohort lifetime-value curves, week-over-week churn, leaderboard rank
  * migration, and audience-overlap Jaccard — the cohort/retention
  * analytics family next to ext_retention (day-offset actives) and
  * ext_funnel.
  *
  * House float discipline as before (SURVEY §5.2); LTV cumsums are
  * cents-exact longs end to end.
  */
object ExtensionQueries11 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-151 Dunning G² keyness --------------------------------------------------
  // Log-likelihood-ratio keywords separating the en and de token
  // streams: G² = 2·(a·ln(a/E1) + b·ln(b/E2)) with expected counts from
  // the pooled marginals. The standard corpus-comparison test where χ²
  // misbehaves on small counts; complements ext_logodds (Monroe
  // Dirichlet-prior log-odds on src0/src1). Zero-count terms drop out
  // (lim x→0 x·ln x = 0). Top 20 by keyness, token tiebreak.
  def extG2(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents").filter(col("lang").isin("en", "de"))
      .select(col("lang"),
        explode(filter(split(col("text"), " "), x => x =!= lit(""))).as("tok"))
    val cnt = toks.groupBy("tok").agg(
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("a"),
      sum(when(col("lang") === "de", 1L).otherwise(0L)).as("b"))
    val tot = cnt.agg(sum("a").cast("double").as("c"), sum("b").cast("double").as("d"))
    val e1 = col("c") * (col("a") + col("b")) / (col("c") + col("d"))
    val e2 = col("d") * (col("a") + col("b")) / (col("c") + col("d"))
    cnt.crossJoin(tot)
      .select(col("tok"), col("a"), col("b"),
        round(lit(2.0) * (
          when(col("a") > 0, col("a") * log(col("a") / e1)).otherwise(0.0) +
          when(col("b") > 0, col("b") * log(col("b") / e2)).otherwise(0.0)), 6).as("g2"),
        (col("a") / col("c") > col("b") / col("d")).as("en_overuse"))
      .orderBy(col("g2").desc, col("tok")).limit(20)
  }

  // ---- E-152 cohort LTV curve ----------------------------------------------------
  // Cumulative purchase revenue per signup cohort over week index —
  // the money view of ext_retention's presence view. Revenue is rounded
  // to cents per event and cumulated as exact longs partitioned by
  // cohort, so the whole curve is integer-exact (no float fold at all).
  def extLtv(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val first = e.groupBy("user_id").agg(to_date(min("ts")).as("cohort"))
    val weekly = e.filter(col("event_type") === "purchase")
      .join(first, "user_id")
      .select(col("cohort"),
        (datediff(to_date(col("ts")), col("cohort")).cast("long") / 7).cast("long").as("wk"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("cohort", "wk").agg(sum("cents").as("rev_cents"))
    weekly
      .withColumn("cum_rev_cents", sum("rev_cents").over(
        Window.partitionBy("cohort").orderBy("wk")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy("cohort", "wk").limit(100)
  }

  // ---- E-153 week-over-week churn ------------------------------------------------
  // Per ISO week: actives, how many return the following week, and the
  // churn rate. Retention is an EQUI self-join of the distinct
  // (user, week) table on (user, week+7d) — no window over users, no
  // rolling distinct; scales as two keyed aggregates plus one join. The
  // final (data-edge) week has no following week, so its churn reads
  // 1.0 by construction — kept, both engines agree.
  def extChurn(s: SparkSession, dir: String): DataFrame = {
    val uw = t(s, dir, "events")
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
      .distinct()
    val nxt = uw.select(col("user_id").as("uid_next"), col("wk").as("wk_next"))
    val flagged = uw.join(nxt,
        col("user_id") === col("uid_next") && col("wk_next") === date_add(col("wk"), 7),
        "left")
      .select(col("wk"), col("user_id"), col("wk_next").isNotNull.as("retained"))
    flagged.groupBy("wk")
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("retained"), 1L).otherwise(0L)).as("n_retained"))
      .select(col("wk"), col("n_active"), col("n_retained"),
        round(lit(1.0) - col("n_retained").cast("double") / col("n_active"), 6)
          .as("churn_rate"))
      .orderBy("wk")
  }

  // ---- E-154 leaderboard rank migration ------------------------------------------
  // The top-20 most-active users of the first half-month, with their
  // rank in the second half and the delta — rank-churn over a split,
  // integer-only output (absent in H2 ⇒ rank -1, delta null-free via
  // the -1 sentinel). Both halves rank with (count desc, user) total
  // order; the H2 rank table joins back by user (equi).
  def extRankChurn(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    def ranks(half: DataFrame): DataFrame = half.groupBy("user_id")
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n"),
        row_number().over(Window.orderBy(col("n").desc, col("user_id"))).as("rk"))
    val h1 = ranks(e.filter(col("ts") < lit("2024-01-16").cast("timestamp")))
    val h2 = ranks(e.filter(col("ts") >= lit("2024-01-16").cast("timestamp")))
      .select(col("user_id").as("u2"), col("rk").as("rk2"))
    h1.filter(col("rk") <= 20)
      .join(h2, col("user_id") === col("u2"), "left")
      .select(col("user_id"), col("rk").as("rank_h1"),
        coalesce(col("rk2"), lit(-1)).as("rank_h2"),
        when(col("rk2").isNotNull, col("rk2") - col("rk")).otherwise(lit(0)).as("delta"))
      .orderBy("rank_h1")
  }

  // ---- E-155 audience-overlap Jaccard --------------------------------------------
  // Jaccard similarity between the user audiences of every event-type
  // pair: intersections from one equi self-join of the distinct
  // (type, user) table on user, sizes from one aggregate — never a
  // users×users product. The segment-overlap matrix that says whether
  // "error" users are the same people as "purchase" users.
  def extUserOverlap(s: SparkSession, dir: String): DataFrame = {
    val tu = t(s, dir, "events").select(col("event_type"), col("user_id")).distinct()
    val sizes = tu.groupBy("event_type").agg(count(lit(1)).as("sz"))
    val inter = tu.select(col("event_type").as("ta"), col("user_id"))
      .join(tu.select(col("event_type").as("tb"), col("user_id")), "user_id")
      .filter(col("ta") < col("tb"))
      .groupBy("ta", "tb").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("event_type").as("ta"), col("sz").as("sza")), "ta")
      .join(sizes.select(col("event_type").as("tb"), col("sz").as("szb")), "tb")
      .select(col("ta"), col("tb"), col("n_inter"),
        round(col("n_inter").cast("double") /
          (col("sza") + col("szb") - col("n_inter")), 6).as("jaccard"))
      .orderBy("ta", "tb")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_g2" -> (extG2 _),
    "ext_ltv" -> (extLtv _),
    "ext_churn" -> (extChurn _),
    "ext_rankchurn" -> (extRankChurn _),
    "ext_useroverlap" -> (extUserOverlap _))

  val oracleSql: Map[String, String] = Map(
    "ext_g2" ->
      """with toks as (select lang,
        |    unnest(list_filter(string_split(text, ' '), w -> w <> '')) tok
        |  from documents where lang in ('en', 'de')),
        |cnt as (select tok,
        |    sum(case when lang = 'en' then 1 else 0 end) a,
        |    sum(case when lang = 'de' then 1 else 0 end) b
        |  from toks group by tok),
        |tot as (select cast(sum(a) as double) c, cast(sum(b) as double) d from cnt)
        |select tok, cast(a as bigint) a, cast(b as bigint) b,
        |  round(2 * (
        |    case when a > 0 then a * ln(a / (c * (a + b) / (c + d))) else 0 end
        |  + case when b > 0 then b * ln(b / (d * (a + b) / (c + d))) else 0 end), 6) g2,
        |  (a / c > b / d) en_overuse
        |from cnt cross join tot
        |order by g2 desc, tok limit 20""".stripMargin,

    "ext_ltv" ->
      """with first as (select user_id, cast(min(ts) as date) cohort
        |  from events group by user_id),
        |weekly as (select cohort,
        |    (cast(ts as date) - cohort) // 7 wk,
        |    cast(sum(cast(round(value * 100) as bigint)) as bigint) rev_cents
        |  from events join first using(user_id)
        |  where event_type = 'purchase'
        |  group by cohort, (cast(ts as date) - cohort) // 7)
        |select cohort, cast(wk as bigint) wk, rev_cents,
        |  cast(sum(rev_cents) over (partition by cohort order by wk
        |    rows between unbounded preceding and current row) as bigint) cum_rev_cents
        |from weekly order by cohort, wk limit 100""".stripMargin,

    "ext_churn" ->
      """with uw as (select distinct user_id,
        |    cast(date_trunc('week', ts) as date) wk from events),
        |f as (select a.wk, a.user_id,
        |    (b.user_id is not null) retained
        |  from uw a left join uw b
        |    on a.user_id = b.user_id and b.wk = a.wk + 7)
        |select wk, count(*) n_active,
        |  cast(sum(case when retained then 1 else 0 end) as bigint) n_retained,
        |  round(1 - cast(sum(case when retained then 1 else 0 end) as double)
        |    / count(*), 6) churn_rate
        |from f group by wk order by wk""".stripMargin,

    "ext_rankchurn" ->
      """with h1 as (select user_id, count(*) n,
        |    row_number() over (order by count(*) desc, user_id) rk
        |  from events where ts < timestamp '2024-01-16' group by user_id),
        |h2 as (select user_id, row_number() over (order by count(*) desc, user_id) rk2
        |  from events where ts >= timestamp '2024-01-16' group by user_id)
        |select h1.user_id, h1.rk rank_h1,
        |  coalesce(h2.rk2, -1) rank_h2,
        |  case when h2.rk2 is not null then h2.rk2 - h1.rk else 0 end delta
        |from h1 left join h2 using(user_id)
        |where h1.rk <= 20 order by rank_h1""".stripMargin,

    "ext_useroverlap" ->
      """with tu as (select distinct event_type, user_id from events),
        |sizes as (select event_type, count(*) sz from tu group by event_type),
        |inter as (select a.event_type ta, b.event_type tb, count(*) n_inter
        |  from tu a join tu b on a.user_id = b.user_id
        |  where a.event_type < b.event_type group by 1, 2)
        |select ta, tb, n_inter,
        |  round(cast(n_inter as double) / (sa.sz + sb.sz - n_inter), 6) jaccard
        |from inter join sizes sa on ta = sa.event_type
        |  join sizes sb on tb = sb.event_type
        |order by ta, tb""".stripMargin)
}
