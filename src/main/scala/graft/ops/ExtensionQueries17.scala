package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 17: association and robust
  * distribution statistics — Kendall rank correlation, revenue
  * concentration (HHI), Hellinger mixture distance, Tukey boxplot
  * profiles, and a dialect-free QQ comparison.
  */
object ExtensionQueries17 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  // ---- E-179 Kendall tau-b rank correlation --------------------------------------
  // Kendall τ-b between the daily click-count and purchase-count series:
  // concordant−discordant via sign products over all day pairs, tie
  // counts per side, τ = S / √((n0−tx)(n0−ty)). Everything up to τ is
  // an integer aggregate, so the one division is settled. The pair join
  // is O(days²) — bounded by the CALENDAR (30 fixture days, ~3.7k for a
  // decade), never by raw row count; the fact table collapses to the
  // day series before any pairing, exactly like ext_theilsen /
  // ext_mannkendall.
  /** The pre-pair day collapse for ext_kendall — public so
    * PlanQualitySpec can MEASURE that its row count equals the distinct
    * calendar days (the semantic bound that justifies the O(days²)
    * pair join in the cartesian allowlist).
    */
  def dailyClickPurchase(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))

  def extKendall(s: SparkSession, dir: String): DataFrame = {
    val daily = dailyClickPurchase(s, dir)
    val pairs = daily.as("a").join(daily.as("b"), col("a.d") < col("b.d"))
    val agg = pairs.agg(
      count(lit(1)).as("n0"),
      sum(signum(col("b.x") - col("a.x")).cast("long") *
        signum(col("b.y") - col("a.y")).cast("long")).as("s"),
      sum(when(col("a.x") === col("b.x"), 1L).otherwise(0L)).as("tx"),
      sum(when(col("a.y") === col("b.y"), 1L).otherwise(0L)).as("ty"))
    agg.select(col("n0"), col("s"), col("tx"), col("ty"),
      round(col("s") /
        sqrt((col("n0") - col("tx")).cast("double") * (col("n0") - col("ty"))),
        6).as("tau_b"))
  }

  // ---- E-180 Herfindahl–Hirschman concentration ----------------------------------
  // Per-nation HHI of customer revenue shares: Σ shareᵢ² where shareᵢ is
  // customer i's cents share of the nation's order revenue. Sums of
  // cents and of cents² run in decimal(38,0) (Spark) / HUGEINT (DuckDB)
  // so both numerator and denominator are EXACT integers at any scale —
  // HHI is one settled division, never a float fold. Two keyed
  // aggregates + one equi join on nation.
  def extHhi(s: SparkSession, dir: String): DataFrame = {
    val perCust = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").cast("long").as("nk"), col("c_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("cents0"))
      .select(col("nk"), col("cents0").cast("decimal(38,0)").as("c"))
    val perNation = perCust.groupBy("nk")
      .agg(count(lit(1)).as("n_cust"),
        sum(col("c") * col("c")).as("sum_sq"),
        sum(col("c")).as("tot"))
    perNation
      .select(col("nk"), col("n_cust"),
        round(col("sum_sq").cast("double") /
          (col("tot") * col("tot")).cast("double"), 6).as("hhi"))
      .orderBy("nk")
  }

  // ---- E-181 Hellinger mixture distance ------------------------------------------
  // Per-source Hellinger distance between the source's language mix and
  // the corpus-wide mix: H = √(½·Σ_l (√p_l − √q_l)²) over the 5-language
  // spine (sources missing a language contribute the full q_l term).
  // Counts stay integers until the 5-term per-source fold — the same
  // settled-small-fold contract as ext_jsd; the spine is the dims grid
  // (|sources|×|langs|), never row-scaled.
  def extHellinger(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // domain caps ordered: a broken closed-domain assumption yields a
    // deterministic prefix, not an arbitrary nondeterministic subset
    val spine = docs.select("source").distinct().orderBy("source").limit(64)
      .crossJoin(docs.select("lang").distinct().orderBy("lang").limit(64))
    val sl = docs.groupBy("source", "lang").agg(count(lit(1)).as("n_sl"))
    val sTot = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
    val lTot = docs.groupBy("lang").agg(count(lit(1)).as("n_l"))
    val tot = docs.agg(count(lit(1)).as("n"))
    spine
      .join(sl, Seq("source", "lang"), "left")
      .join(sTot, "source")
      .join(lTot, "lang")
      .crossJoin(tot)
      .select(col("source"),
        pow(sqrt(coalesce(col("n_sl"), lit(0L)).cast("double") / col("n_s")) -
          sqrt(col("n_l").cast("double") / col("n")), 2).as("term"))
      .groupBy("source")
      .agg(round(sqrt(sum("term") / 2.0), 6).as("hellinger"))
      .orderBy("source")
  }

  // ---- E-182 Tukey boxplot profile -----------------------------------------------
  // Per-nation five-number summary of customer balances plus Tukey-fence
  // outlier counts (1.5·IQR): quartiles are the interpolated
  // percentile ≡ quantile_cont both engines compute identically, the
  // fences broadcast back onto the customer scan (E-21 pattern), and
  // the outlier flags are count_if — no row-level float output.
  def extBoxplot(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(col("c_nationkey").cast("long").as("nk"), col("c_acctbal"))
    val q = c.groupBy("nk").agg(
      expr("percentile(c_acctbal, 0.25)").as("q1"),
      expr("percentile(c_acctbal, 0.5)").as("med"),
      expr("percentile(c_acctbal, 0.75)").as("q3"))
    c.join(broadcast(q), "nk")
      .groupBy("nk")
      .agg(count(lit(1)).as("n"),
        round(min("q1"), 4).as("q1"),
        round(min("med"), 4).as("med"),
        round(min("q3"), 4).as("q3"),
        round(min(col("q3") - col("q1")), 4).as("iqr"),
        sum(when(col("c_acctbal") <
          col("q1") - lit(1.5) * (col("q3") - col("q1")), 1L).otherwise(0L))
          .as("n_lo"),
        sum(when(col("c_acctbal") >
          col("q3") + lit(1.5) * (col("q3") - col("q1")), 1L).otherwise(0L))
          .as("n_hi"))
      .orderBy("nk")
  }

  // ---- E-183 QQ decile comparison ------------------------------------------------
  // Quantile–quantile table of en-vs-de document lengths: nine deciles
  // of each side via the dialect-free integer rank/lo/rem interpolation
  // (ext_pctl_cont machinery — no engine quantile built-in), paired on
  // the decile with the en/de ratio. Distribution-shape drift the KS
  // scalar (ext_ks) summarizes, laid out quantile by quantile.
  def extQq(s: SparkSession, dir: String): DataFrame = {
    val v = t(s, dir, "documents")
      .filter(col("lang").isin("en", "de"))
      .select(col("lang"), col("n_chars").as("v"), col("doc_id").as("k"))
    val ranked = v
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy("v", "k")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
    val spec = ranked.select("lang", "n").distinct()
      .select(col("lang"), col("n"),
        explode(array((1 to 9).map(i => lit(i * 10L)): _*)).as("p"))
      .withColumn("lo", expr("((n - 1) * p) div 100"))
      .withColumn("rem", expr("((n - 1) * p) % 100"))
    val lo = ranked.select(col("lang").as("lg1"), col("rn").as("rn1"),
      col("v").as("v_lo"))
    val hi = ranked.select(col("lang").as("lg2"), col("rn").as("rn2"),
      col("v").as("v_hi"))
    val decile = spec
      .join(lo, col("lg1") === spec("lang") && col("rn1") === spec("lo") + 1)
      .join(hi, col("lg2") === spec("lang") && col("rn2") === spec("lo") + 2,
        "left")
      .select(spec("lang").as("lang"), col("p"),
        (col("v_lo") +
          col("rem") * (coalesce(col("v_hi"), col("v_lo")) - col("v_lo"))
            / 100.0).as("q"))
    decile.filter(col("lang") === "en")
      .select(col("p"), col("q").as("q_en"))
      .join(decile.filter(col("lang") === "de")
        .select(col("p").as("p2"), col("q").as("q_de")),
        col("p") === col("p2"))
      .select(col("p"), round(col("q_en"), 4).as("q_en"),
        round(col("q_de"), 4).as("q_de"),
        round(col("q_en") / col("q_de"), 6).as("ratio"))
      .orderBy("p")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_kendall" -> (extKendall _),
    "ext_hhi" -> (extHhi _),
    "ext_hellinger" -> (extHellinger _),
    "ext_boxplot" -> (extBoxplot _),
    "ext_qq" -> (extQq _))

  val oracleSql: Map[String, String] = Map(
    "ext_kendall" ->
      """with daily as (select cast(ts as date) d,
        |    cast(sum(case when event_type = 'click' then 1 else 0 end) as bigint) x,
        |    cast(sum(case when event_type = 'purchase' then 1 else 0 end) as bigint) y
        |  from events group by 1),
        |agg as (select cast(count(*) as bigint) n0,
        |    cast(sum(cast(sign(b.x - a.x) as bigint)
        |      * cast(sign(b.y - a.y) as bigint)) as bigint) s,
        |    cast(sum(case when a.x = b.x then 1 else 0 end) as bigint) tx,
        |    cast(sum(case when a.y = b.y then 1 else 0 end) as bigint) ty
        |  from daily a join daily b on a.d < b.d)
        |select n0, s, tx, ty,
        |  round(s / sqrt(cast(n0 - tx as double) * (n0 - ty)), 6) tau_b
        |from agg""".stripMargin,

    "ext_hhi" ->
      """with pc as (select cast(c_nationkey as bigint) nk, c_custkey,
        |    cast(cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint)
        |      as hugeint) c
        |  from orders join customer on o_custkey = c_custkey
        |  group by 1, 2)
        |select nk, count(*) n_cust,
        |  round(cast(sum(c * c) as double) / cast(sum(c) * sum(c) as double), 6) hhi
        |from pc group by nk order by nk""".stripMargin,

    "ext_hellinger" ->
      """with spine as (select source, lang
        |  from (select distinct source from documents),
        |    (select distinct lang from documents)),
        |sl as (select source, lang, count(*) n_sl from documents group by 1, 2),
        |st as (select source, count(*) n_s from documents group by 1),
        |lt as (select lang, count(*) n_l from documents group by 1),
        |tot as (select count(*) n from documents)
        |select spine.source,
        |  round(sqrt(sum(pow(sqrt(cast(coalesce(n_sl, 0) as double) / n_s)
        |    - sqrt(cast(n_l as double) / n), 2)) / 2.0), 6) hellinger
        |from spine
        |left join sl using (source, lang)
        |join st using (source) join lt using (lang) cross join tot
        |group by spine.source order by source""".stripMargin,

    "ext_boxplot" ->
      """with q as (select cast(c_nationkey as bigint) nk,
        |    quantile_cont(c_acctbal, 0.25) q1,
        |    quantile_cont(c_acctbal, 0.5) med,
        |    quantile_cont(c_acctbal, 0.75) q3
        |  from customer group by 1)
        |select nk, count(*) n,
        |  round(min(q1), 4) q1, round(min(med), 4) med, round(min(q3), 4) q3,
        |  round(min(q3 - q1), 4) iqr,
        |  cast(sum(case when c_acctbal < q1 - 1.5 * (q3 - q1) then 1 else 0 end)
        |    as bigint) n_lo,
        |  cast(sum(case when c_acctbal > q3 + 1.5 * (q3 - q1) then 1 else 0 end)
        |    as bigint) n_hi
        |from customer join q on cast(c_nationkey as bigint) = nk
        |group by nk order by nk""".stripMargin,

    "ext_qq" ->
      """with v as (select lang, n_chars v, doc_id k from documents
        |  where lang in ('en', 'de')),
        |r as (select lang, v,
        |    row_number() over (partition by lang order by v, k) rn,
        |    count(*) over (partition by lang) n
        |  from v),
        |spec as (select lang, n, p, ((n - 1) * p) // 100 lo,
        |    ((n - 1) * p) % 100 rem
        |  from (select distinct lang, n from r),
        |    unnest([10, 20, 30, 40, 50, 60, 70, 80, 90]) u(p)),
        |dec as (select spec.lang, p,
        |    lo_r.v + rem * (coalesce(hi_r.v, lo_r.v) - lo_r.v) / 100.0 q
        |  from spec
        |  join r lo_r on lo_r.lang = spec.lang and lo_r.rn = spec.lo + 1
        |  left join r hi_r on hi_r.lang = spec.lang and hi_r.rn = spec.lo + 2)
        |select en.p, round(en.q, 4) q_en, round(de.q, 4) q_de,
        |  round(en.q / de.q, 6) ratio
        |from (select p, q from dec where lang = 'en') en
        |join (select p, q from dec where lang = 'de') de using (p)
        |order by p""".stripMargin)
}
