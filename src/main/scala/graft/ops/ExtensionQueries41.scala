package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 41: fraud/risk analytics —
  * transaction-velocity flags (windowed count thresholds, the
  * hour-scale sibling of ST-18's second-scale rapid-fire), round-number
  * bias, structuring (threshold-splitting) detection, and peer-group
  * balance outliers. All verdicts integer or integer-cross-multiplied.
  */
object ExtensionQueries41 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-280 transaction velocity flags ------------------------------------------
  // Users with ≥ 5 purchases inside ANY trailing 1-hour window: a
  // RANGE frame over event-time micros per user (value-bounded, so
  // same-timestamp bursts count together regardless of row order —
  // the W-12 lesson). Flags are exact integer counts; output is the
  // per-user worst-window profile.
  def extVelocityflag(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(-3600L * 1000000L, 0)
    p.withColumn("n_in_hour", count(lit(1)).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_purchases"),
        max("n_in_hour").as("max_per_hour"))
      .withColumn("flagged", col("max_per_hour") >= 5)
      .orderBy(desc("max_per_hour"), asc("user_id"))
      .limit(20)
  }

  // ---- E-281 round-number bias ---------------------------------------------------
  // Human-entered (or fabricated) amounts over-select round endings:
  // the share of purchase values ending .00 or .x0 against the 1%/10%
  // uniform baselines, with the verdict by INTEGER cross-multiply
  // (100·n_00 vs 2·n — flags at >2× expected). The classic
  // forensic-accounting screen beside Benford (E-126).
  def extRoundbias(s: SparkSession, dir: String): DataFrame = {
    val v = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(round(col("value") * 100).cast("long").as("c"))
    v.agg(count(lit(1)).as("n"),
        sum(when(pmod(col("c"), lit(100L)) === 0, 1L).otherwise(0L))
          .as("n_00"),
        sum(when(pmod(col("c"), lit(10L)) === 0, 1L).otherwise(0L))
          .as("n_x0"))
      .select(col("n"), col("n_00"), col("n_x0"),
        round(col("n_00").cast("double") / col("n"), 6).as("share_00"),
        round(col("n_x0").cast("double") / col("n"), 6).as("share_x0"),
        (col("n_00") * 100 > col("n") * 2).as("biased_00"),
        (col("n_x0") * 10 > col("n") * 2).as("biased_x0"))
  }

  // ---- E-282 structuring detection -----------------------------------------------
  // Splitting payments to stay under a $90 reporting threshold: per
  // (user, day), ≥3 sub-threshold purchases that TOGETHER cross it.
  // Exact cents throughout; the flagged-day ledger ordered worst
  // first — the AML screen beside velocity (E-280).
  def extStructuring(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("dy"),
        round(col("value") * 100).cast("long").as("c"))
    p.filter(col("c") < 9000)
      .groupBy("user_id", "dy")
      .agg(count(lit(1)).as("n_sub"), sum("c").as("cents_sub"))
      .filter(col("n_sub") >= 3 && col("cents_sub") >= 9000)
      .select(col("user_id"), col("dy").cast("string").as("dy"),
        col("n_sub"), col("cents_sub"))
      .orderBy(desc("cents_sub"), asc("user_id"), asc("dy"))
      .limit(20)
  }

  // ---- E-283 peer-group outliers -------------------------------------------------
  // Balance z-scores WITHIN each nation peer group — the peer-relative
  // view that a global z (E-46 anomaly) washes out. Group moments are
  // exact decimal cents; z is one settled expression; top deviants by
  // |z| with id tiebreak. Groups of < 5 peers are excluded (z
  // unstable; nation-level groups stay populated even at the smallest
  // fixture scale).
  def extPeerz(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey").as("nk"),
        col("c_mktsegment").as("seg"),
        round(col("c_acctbal") * 100).cast("long").cast("decimal(38,0)")
          .as("v"))
    val g = c.groupBy("nk")
      .agg(count(lit(1)).as("ng"), sum("v").as("sv"),
        sum(col("v") * col("v")).as("svv"))
      .filter(col("ng") >= 5)
    c.join(g, Seq("nk"))
      .withColumn("z",
        (col("v").cast("double") - col("sv").cast("double") / col("ng")) /
          sqrt((col("ng").cast("double") * col("svv").cast("double") -
            col("sv").cast("double") * col("sv").cast("double")) /
            (col("ng").cast("double") * col("ng").cast("double"))))
      .select(col("c_custkey"), col("nk").cast("long").as("nk"), col("seg"),
        round(col("v").cast("double") / 100, 2).as("balance"),
        round(col("z"), 4).as("z"))
      .orderBy(abs(col("z")).desc, asc("c_custkey"))
      .limit(20)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_velocityflag" -> (extVelocityflag _),
    "ext_roundbias" -> (extRoundbias _),
    "ext_structuring" -> (extStructuring _),
    "ext_peerz" -> (extPeerz _))

  val oracleSql: Map[String, String] = Map(
    // E-280: identical value-bounded range frame.
    "ext_velocityflag" ->
      """with p as (select user_id, epoch_us(ts) us from events
        |  where event_type = 'purchase'),
        |wn as (select user_id,
        |    count(*) over (partition by user_id order by us
        |      range between 3600000000 preceding and current row) n_in_hour
        |  from p)
        |select user_id, cast(count(*) as bigint) n_purchases,
        |  cast(max(n_in_hour) as bigint) max_per_hour,
        |  max(n_in_hour) >= 5 flagged
        |from wn group by user_id
        |order by max_per_hour desc, user_id limit 20""".stripMargin,

    // E-281: identical ending tests and cross-multiplied verdicts.
    "ext_roundbias" ->
      """with v as (select cast(round(value * 100) as bigint) c from events
        |  where event_type = 'purchase')
        |select cast(count(*) as bigint) n,
        |  cast(sum(case when c % 100 = 0 then 1 else 0 end) as bigint) n_00,
        |  cast(sum(case when c % 10 = 0 then 1 else 0 end) as bigint) n_x0,
        |  round(cast(sum(case when c % 100 = 0 then 1 else 0 end) as double)
        |    / count(*), 6) share_00,
        |  round(cast(sum(case when c % 10 = 0 then 1 else 0 end) as double)
        |    / count(*), 6) share_x0,
        |  sum(case when c % 100 = 0 then 1 else 0 end) * 100 > count(*) * 2
        |    biased_00,
        |  sum(case when c % 10 = 0 then 1 else 0 end) * 10 > count(*) * 2
        |    biased_x0
        |from v""".stripMargin,

    // E-282: identical sub-threshold aggregation and flags.
    "ext_structuring" ->
      """with p as (select user_id, cast(ts as date) dy,
        |    cast(round(value * 100) as bigint) c
        |  from events where event_type = 'purchase')
        |select user_id, strftime(dy, '%Y-%m-%d') dy,
        |  cast(count(*) as bigint) n_sub,
        |  cast(sum(c) as bigint) cents_sub
        |from p where c < 9000
        |group by user_id, dy
        |having count(*) >= 3 and sum(c) >= 9000
        |order by cents_sub desc, user_id, dy limit 20""".stripMargin,

    // E-283: identical exact group moments and |z| ranking.
    "ext_peerz" ->
      """with c as (select c_custkey, c_nationkey nk, c_mktsegment seg,
        |    cast(cast(round(c_acctbal * 100) as bigint) as hugeint) v
        |  from customer),
        |g as (select nk, cast(count(*) as bigint) ng, sum(v) sv,
        |    sum(v * v) svv
        |  from c group by nk having count(*) >= 5),
        |z as (select c_custkey, c.nk, c.seg,
        |    round(cast(v as double) / 100, 2) balance,
        |    round((cast(v as double) - cast(sv as double) / ng) /
        |      sqrt((cast(ng as double) * cast(svv as double) -
        |        cast(sv as double) * cast(sv as double)) /
        |        (cast(ng as double) * cast(ng as double))), 4) z
        |  from c join g on g.nk = c.nk)
        |select c_custkey, cast(nk as bigint) nk, seg, balance, z
        |from z order by abs(z) desc, c_custkey limit 20""".stripMargin)
}
