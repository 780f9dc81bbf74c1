package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 60: in-database ML and causal
  * readouts — CUPED variance-reduced experiment lift, a decision-stump
  * split search over a deterministic threshold spine, and EXACT
  * Shapley-value channel attribution over event-type presence subsets
  * (integer arithmetic ×24 until the final division).
  */
object ExtensionQueries60 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def h60(c: Column) =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  // ---- E-333 CUPED variance reduction --------------------------------------------
  // The experimentation workhorse: adjust the post-period metric by the
  // pre-period covariate, y' = y − θ(x − x̄), θ = cov(x,y)/var(x), and
  // read the lift off the adjusted metric — same expectation, less
  // variance (exactly ρ² less). Pre = days 1-15 of spend, post = days
  // 16-31, assignment = sha256 coin per user (E-125 discipline). θ and
  // x̄ from exact decimal cross-multiplied moments; adjusted values
  // QUANTIZED to 1e-2 cents before every fold (E-257) so the group
  // means and variances settle identically on both engines.
  def extCuped(s: SparkSession, dir: String): DataFrame = {
    val users = t(s, dir, "events")
      .select(col("user_id"), dayofmonth(col("ts")).as("dy"),
        round(col("value") * 100).cast("long").as("v"))
      .groupBy("user_id")
      .agg(sum(when(col("dy") <= 15, col("v")).otherwise(0L)).as("x"),
        sum(when(col("dy") > 15, col("v")).otherwise(0L)).as("y"))
      .withColumn("trt",
        pmod(h60(concat(lit("cuped|"), col("user_id"))), lit(2)))
    val xd = col("x").cast("decimal(38,0)")
    val yd = col("y").cast("decimal(38,0)")
    val mom = users.agg(count(lit(1)).as("n"),
        sum(xd).as("sx"), sum(yd).as("sy"),
        sum(xd * yd).as("sxy"), sum(xd * xd).as("sxx"))
      .select(col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("theta"),
        (col("sx").cast("double") / col("n")).as("xbar"))
    val adj = users.crossJoin(broadcast(mom))
      .withColumn("ycq",
        round((col("y") - col("theta") * (col("x") - col("xbar"))) * 100)
          .cast("long"))
    adj.agg(max("theta").as("theta_raw"),
        sum("trt").as("n_t"),
        (count(lit(1)) - sum("trt")).as("n_c"),
        sum(when(col("trt") === 1, yd).otherwise(lit(0).cast("decimal(38,0)")))
          .as("sy_t"),
        sum(when(col("trt") === 0, yd).otherwise(lit(0).cast("decimal(38,0)")))
          .as("sy_c"),
        sum(when(col("trt") === 1, col("ycq")).otherwise(0L)).as("sc_t"),
        sum(when(col("trt") === 0, col("ycq")).otherwise(0L)).as("sc_c"),
        count(lit(1)).as("n"),
        sum(yd * yd).as("syy"), sum(yd).as("sy"),
        sum(col("ycq").cast("decimal(38,0)") * col("ycq")).as("scc"),
        sum(col("ycq").cast("decimal(38,0)")).as("sc"))
      .select(col("n_t"), col("n_c"), round(col("theta_raw"), 6).as("theta"),
        round((col("sy_t").cast("double") / col("n_t") -
          col("sy_c").cast("double") / col("n_c")) / 100, 2).as("raw_lift"),
        round((col("sc_t").cast("double") / col("n_t") -
          col("sc_c").cast("double") / col("n_c")) / 10000, 2).as("cuped_lift"),
        // var ratio from cross-multiplied second moments; the 1e4
        // quantization scale on ycq cancels inside the ratio
        round(lit(1.0) -
          ((col("n") * col("scc") - col("sc") * col("sc")).cast("double") / 1e4) /
          (col("n") * col("syy") - col("sy") * col("sy")).cast("double"), 6)
          .as("var_reduction"))
  }

  // ---- E-334 decision-stump split search -----------------------------------------
  // The simplest learnable model, learned in-database: for 9 candidate
  // thresholds on order price (an equal-width spine between min and
  // max — deterministic, no percentile dialect risk), the weighted
  // Gini impurity of the (status = 'F') split. Counts are exact
  // integers per threshold; one float impurity per spine row. The
  // argmin row is the stump an external tree-builder would grow first.
  def extStump(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(round(col("o_totalprice") * 100).cast("long").as("p"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("pos"))
    val mm = o.agg(min("p").as("mn"), max("p").as("mx"),
      count(lit(1)).as("n"), sum("pos").as("npos"))
    val spine = o.sparkSession.range(1, 10)
      .select(col("id").cast("long").as("k"))
      .crossJoin(broadcast(mm))
      .select(col("k"),
        (col("mn") + floor((col("mx") - col("mn")) * col("k") / lit(10.0))
          .cast("long")).as("thr"),
        col("n"), col("npos"))
    o.crossJoin(broadcast(spine))
      .groupBy("k", "thr", "n", "npos")
      .agg(sum(when(col("p") <= col("thr"), 1L).otherwise(0L)).as("n_l"),
        sum(when(col("p") <= col("thr"), col("pos")).otherwise(0L)).as("pos_l"))
      .select(col("k"), col("thr"), col("n_l"),
        (col("n") - col("n_l")).as("n_r"),
        round(
          when(col("n_l") > 0,
            lit(2.0) * col("pos_l") * (col("n_l") - col("pos_l")) / col("n_l"))
            .otherwise(0.0) +
          when(col("n") - col("n_l") > 0,
            lit(2.0) * (col("npos") - col("pos_l")) *
              ((col("n") - col("n_l")) - (col("npos") - col("pos_l"))) /
              (col("n") - col("n_l")))
            .otherwise(0.0), 4).as("weighted_gini"))
      .orderBy(asc("weighted_gini"), asc("k"))
  }

  // ---- E-335 Shapley channel attribution -----------------------------------------
  // Which pre-purchase event types actually drive conversion? EXACT
  // Shapley values over the 4-channel presence game: v(S) = conversions
  // among users whose touch set ⊆ S (monotone coalition value from the
  // 16-mask exact-subset table), φ_t = Σ_S w(|S|)(v(S∪t) − v(S)). With
  // n = 4 the weights ×24 are the integers {6, 2, 2, 6}, so every term
  // is integer until the single ÷24 — no float fold anywhere. The
  // principled alternative to E-145's last-touch rule.
  def extShapley(s: SparkSession, dir: String): DataFrame = {
    val um = t(s, dir, "events")
      .groupBy("user_id")
      .agg((max(when(col("event_type") === "click", 1L).otherwise(0L)) +
        max(when(col("event_type") === "view", 1L).otherwise(0L)) * 2 +
        max(when(col("event_type") === "signup", 1L).otherwise(0L)) * 4 +
        max(when(col("event_type") === "error", 1L).otherwise(0L)) * 8)
          .as("mask"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
    val exact = um.groupBy("mask").agg(sum("conv").as("nconv"))
    val masks = t(s, dir, "events").sparkSession.range(16)
      .select(col("id").cast("long").as("smask"))
    val v = masks.join(exact,
        expr("(mask & smask) = mask"), "left")
      .groupBy("smask")
      .agg(coalesce(sum("nconv"), lit(0L)).as("v"))
    val channels = t(s, dir, "events").sparkSession.range(4)
      .select(expr("shiftleft(1L, cast(id as int))").as("bit"),
        element_at(array(lit("click"), lit("view"), lit("signup"),
          lit("error")), (col("id") + 1).cast("int")).as("channel"))
    channels.join(v, expr("(smask & bit) = 0"))
      .join(v.select(col("smask").as("smask2"), col("v").as("v2")),
        col("smask2") === col("smask") + col("bit"))
      .select(col("channel"),
        (element_at(array(lit(6L), lit(2L), lit(2L), lit(6L)),
          (bit_count(col("smask")) + 1).cast("int")) *
          (col("v2") - col("v"))).as("term24"))
      .groupBy("channel")
      .agg(round(sum("term24").cast("double") / 24, 4).as("shapley"))
      .orderBy("channel")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_cuped" -> (extCuped _),
    "ext_stump" -> (extStump _),
    "ext_shapley" -> (extShapley _))

  val oracleSql: Map[String, String] = Map(
    // E-333: identical coin, windows, decimal moments, quantization.
    "ext_cuped" ->
      """with u as (select user_id,
        |    cast(sum(case when date_part('day', ts) <= 15
        |      then cast(round(value * 100) as bigint) else 0 end)
        |      as bigint) x,
        |    cast(sum(case when date_part('day', ts) > 15
        |      then cast(round(value * 100) as bigint) else 0 end)
        |      as bigint) y
        |  from events group by user_id),
        |ut as (select x, y,
        |    ('0x' || substr(sha256('cuped|' || cast(user_id as varchar)),
        |      1, 15))::bigint % 2 trt
        |  from u),
        |mom as (select cast(count(*) as hugeint) n,
        |    sum(cast(x as hugeint)) sx, sum(cast(y as hugeint)) sy,
        |    sum(cast(x as hugeint) * y) sxy,
        |    sum(cast(x as hugeint) * x) sxx
        |  from ut),
        |th as (select n,
        |    cast(n * sxy - sx * sy as double) /
        |      cast(n * sxx - sx * sx as double) theta,
        |    cast(sx as double) / cast(n as double) xbar
        |  from mom),
        |adj as (select trt, x, y,
        |    cast(round((y - theta * (x - xbar)) * 100) as bigint) ycq
        |  from ut cross join th)
        |select cast(sum(trt) as bigint) n_t,
        |  cast(count(*) - sum(trt) as bigint) n_c,
        |  round(max(theta), 6) theta,
        |  round((cast(sum(case when trt = 1 then cast(y as hugeint)
        |      else 0 end) as double) / sum(trt) -
        |    cast(sum(case when trt = 0 then cast(y as hugeint)
        |      else 0 end) as double) / (count(*) - sum(trt))) / 100, 2)
        |    raw_lift,
        |  round((cast(sum(case when trt = 1 then cast(ycq as hugeint)
        |      else 0 end) as double) / sum(trt) -
        |    cast(sum(case when trt = 0 then cast(ycq as hugeint)
        |      else 0 end) as double) / (count(*) - sum(trt))) / 10000, 2)
        |    cuped_lift,
        |  round(1.0 -
        |    (cast(count(*) * sum(cast(ycq as hugeint) * ycq) -
        |      sum(cast(ycq as hugeint)) * sum(cast(ycq as hugeint))
        |      as double) / 1e4) /
        |    cast(count(*) * sum(cast(y as hugeint) * y) -
        |      sum(cast(y as hugeint)) * sum(cast(y as hugeint))
        |      as double), 6) var_reduction
        |from adj cross join th""".stripMargin,

    // E-334: identical spine and integer split counts.
    "ext_stump" ->
      """with o as (select cast(round(o_totalprice * 100) as bigint) p,
        |    case when o_orderstatus = 'F' then 1 else 0 end pos
        |  from orders),
        |mm as (select min(p) mn, max(p) mx,
        |    cast(count(*) as bigint) n, cast(sum(pos) as bigint) npos
        |  from o),
        |spine as (select cast(k as bigint) k,
        |    mn + cast(floor((mx - mn) * k / 10.0) as bigint) thr, n, npos
        |  from range(1, 10) r(k) cross join mm),
        |cells as (select k, thr, n, npos,
        |    cast(sum(case when p <= thr then 1 else 0 end) as bigint) n_l,
        |    cast(sum(case when p <= thr then pos else 0 end) as bigint)
        |      pos_l
        |  from o cross join spine group by k, thr, n, npos)
        |select k, thr, n_l, n - n_l n_r,
        |  round(
        |    (case when n_l > 0 then
        |      2.0 * pos_l * (n_l - pos_l) / n_l else 0 end) +
        |    (case when n - n_l > 0 then
        |      2.0 * (npos - pos_l) * ((n - n_l) - (npos - pos_l)) /
        |        (n - n_l) else 0 end), 4) weighted_gini
        |from cells order by weighted_gini, k""".stripMargin,

    // E-335: identical masks, subset table, and ×24 integer weights.
    "ext_shapley" ->
      """with um as (select user_id,
        |    max(case when event_type = 'click' then 1 else 0 end) +
        |    max(case when event_type = 'view' then 1 else 0 end) * 2 +
        |    max(case when event_type = 'signup' then 1 else 0 end) * 4 +
        |    max(case when event_type = 'error' then 1 else 0 end) * 8
        |      mask,
        |    max(case when event_type = 'purchase' then 1 else 0 end) conv
        |  from events group by user_id),
        |exact as (select mask, cast(sum(conv) as bigint) nconv
        |  from um group by mask),
        |masks as (select cast(smask as bigint) smask from range(16) r(smask)),
        |v as (select smask,
        |    cast(coalesce(sum(nconv), 0) as bigint) v
        |  from masks left join exact on (mask & smask) = mask
        |  group by smask),
        |channels as (select cast(1 << b as bigint) cbit,
        |    ['click', 'view', 'signup', 'error'][b + 1] channel
        |  from range(4) r(b)),
        |terms as (select channel,
        |    [6, 2, 2, 6][bit_count(v.smask) + 1] * (v2.v - v.v) term24
        |  from channels join v on (v.smask & cbit) = 0
        |  join v v2 on v2.smask = v.smask + cbit)
        |select channel,
        |  round(cast(sum(term24) as double) / 24, 4) shapley
        |from terms group by channel order by channel""".stripMargin)
}
