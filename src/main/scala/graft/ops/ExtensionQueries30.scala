package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 30: probabilistic record linkage
  * (Fellegi–Sunter agreement weights), per-source character-class
  * profiling, long-range dependence (R/S Hurst exponent), and per-type
  * event run-length statistics. The linkage weights complete the
  * entity-resolution family (SNM E-124, fuzzy E-37, Jaro X-5,
  * ER clusters E-135, canonical E-115) with the SCORING layer.
  */
object ExtensionQueries30 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-239 Fellegi–Sunter linkage weights --------------------------------------
  // The classic probabilistic-linkage weight table: for each comparison
  // field, m = P(agree | match) estimated from truth pairs (record vs
  // its perturbed twin in a synthesized second source — the E-88/E-224
  // synthetic-drift discipline), u = P(agree | non-match) from the
  // deterministic shifted pairing (custkey k vs k+1), and the log2
  // agreement / disagreement weights a linker sums per candidate pair.
  // All four probabilities are exact integer ratios; log2 is the only
  // libm call. The twin perturbs name (every 10th), segment (every
  // 7th) and balance (every 3rd, +$1000 — bucket moves only when it
  // crosses a 2000-dollar boundary, so m_bal is measured, not assumed).
  def extFellegi(s: SparkSession, dir: String): DataFrame = {
    val a = t(s, dir, "customer").select(col("c_custkey").as("k"),
      col("c_name").as("nm"), col("c_nationkey").as("nk"),
      col("c_mktsegment").as("seg"),
      floor(round(col("c_acctbal") * 100).cast("long") / lit(200000.0))
        .cast("long").as("b"))
    // the perturbed bucket is recomputed from exact cents (+$1000 is
    // half a bucket, so it crosses a boundary for half the %3 rows)
    val twin2 = t(s, dir, "customer").select(col("c_custkey").as("k"),
      when(col("c_custkey") % 10 === 0, concat(col("c_name"), lit("_x")))
        .otherwise(col("c_name")).as("nm"),
      col("c_nationkey").as("nk"),
      when(col("c_custkey") % 7 === 0, lit("ALTERED"))
        .otherwise(col("c_mktsegment")).as("seg"),
      floor((round(col("c_acctbal") * 100).cast("long") +
        when(col("c_custkey") % 3 === 0, lit(100000L)).otherwise(lit(0L))) /
        lit(200000.0)).cast("long").as("b"))
    def agreeCols(x: DataFrame, y: DataFrame) = x.join(y
        .select(col("k").as("k2"), col("nm").as("nm2"), col("nk").as("nk2"),
          col("seg").as("seg2"), col("b").as("b2")),
        col("k2") === col("k"))
    def agreeColsShift(x: DataFrame, y: DataFrame) = x.join(y
        .select(col("k").as("k2"), col("nm").as("nm2"), col("nk").as("nk2"),
          col("seg").as("seg2"), col("b").as("b2")),
        col("k2") === col("k") + 1)
    def rates(pairs: DataFrame, prefix: String) = pairs.agg(
      count(lit(1)).as(s"n_$prefix"),
      sum(when(col("nm") === col("nm2"), 1L).otherwise(0L)).as(s"name_$prefix"),
      sum(when(col("nk") === col("nk2"), 1L).otherwise(0L)).as(s"nat_$prefix"),
      sum(when(col("seg") === col("seg2"), 1L).otherwise(0L)).as(s"seg_$prefix"),
      sum(when(col("b") === col("b2"), 1L).otherwise(0L)).as(s"bal_$prefix"))
    val m = rates(agreeCols(a, twin2), "m")
    val u = rates(agreeColsShift(a, twin2), "u")
    val j = m.crossJoin(u)
    val stacked = j.select(expr(
      """stack(4,
        |'name', name_m, name_u,
        |'nation', nat_m, nat_u,
        |'segment', seg_m, seg_u,
        |'bal_bucket', bal_m, bal_u) as (field, agree_m, agree_u)""".stripMargin),
      col("n_m"), col("n_u"))
    // Jeffreys (+0.5) smoothing keeps m and u off the 0/1 poles —
    // unique names give agree_u = 0 raw, which would make the weights
    // infinite (and ANSI division throw) — the textbook F-S estimator.
    val mP = (col("agree_m").cast("double") + 0.5) / (col("n_m") + 1)
    val uP = (col("agree_u").cast("double") + 0.5) / (col("n_u") + 1)
    stacked.select(col("field"), col("agree_m"), col("n_m"),
        col("agree_u"), col("n_u"),
        round(mP, 6).as("m"), round(uP, 6).as("u"),
        round(log(2.0, mP / uP), 4).as("w_agree"),
        round(log(2.0, (lit(1.0) - mP) / (lit(1.0) - uP)), 4)
          .as("w_disagree"))
      .orderBy("field")
  }

  // ---- E-240 character-class profile ---------------------------------------------
  // Per-source byte hygiene: shares of alphabetic / digit / space /
  // other characters, from exact per-class char counts (length minus
  // regexp-stripped length — the q108 counting trick) summed per
  // source. The mojibake / binary-contamination screen a corpus intake
  // runs before any tokenizer.
  def extCharclass(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("source"),
      length(col("text")).cast("long").as("nc"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[a-zA-Z]", ""))).cast("long")
        .as("alpha"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[0-9]", ""))).cast("long")
        .as("digit"),
      (length(col("text")) -
        length(regexp_replace(col("text"), " ", ""))).cast("long")
        .as("space"))
    d.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("nc").as("n_chars"),
        sum("alpha").as("n_alpha"), sum("digit").as("n_digit"),
        sum("space").as("n_space"))
      .select(col("source"), col("n_docs"), col("n_chars"),
        round(col("n_alpha").cast("double") / col("n_chars"), 6)
          .as("alpha_share"),
        round(col("n_digit").cast("double") / col("n_chars"), 6)
          .as("digit_share"),
        round(col("n_space").cast("double") / col("n_chars"), 6)
          .as("space_share"),
        round((col("n_chars") - col("n_alpha") - col("n_digit") -
          col("n_space")).cast("double") / col("n_chars"), 6)
          .as("other_share"))
      .orderBy("source")
  }

  // ---- E-241 R/S Hurst exponent --------------------------------------------------
  // Long-range dependence of daily revenue: rescaled-range analysis at
  // block sizes 16/32/64/128 over the exact-cents day series. Within a
  // block the cumulative deviation is kept INTEGER via cross-multiply
  // (n·run_t − t·Σx), so R is exact until one division; S comes from
  // exact decimal Σx² (cents² overflow bigint at scale). H = OLS slope
  // of ln(mean R/S) on ln(w) over the 4 block sizes — H≈0.5 is the
  // random-walk pin, persistent demand pushes higher. All windows run
  // over the ~2.4k-row day series, never the fact table.
  def extHurst(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderdate").as("dy"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"))
      .withColumn("rn",
        row_number().over(Window.orderBy("dy")).cast("long") - 1)
    val ws = s.range(0, 4).select(
      (lit(16L) * pow(lit(2.0), col("id")).cast("long")).as("w"))
    val blocks = daily.crossJoin(broadcast(ws))
      .withColumn("blk", floor(col("rn") / col("w")))
      .withColumn("t",
        row_number().over(Window.partitionBy("w", "blk").orderBy("rn"))
          .cast("long"))
      .withColumn("run",
        sum("x").over(Window.partitionBy("w", "blk").orderBy("rn")))
    val per2 = blocks
      .withColumn("dev_num",
        col("run") * count(lit(1)).over(Window.partitionBy("w", "blk")) -
          col("t") * sum("x").over(Window.partitionBy("w", "blk")))
      .groupBy("w", "blk")
      .agg(count(lit(1)).as("nb"),
        sum("x").cast("decimal(38,0)").as("sx"),
        sum(col("x").cast("decimal(38,0)") * col("x").cast("decimal(38,0)"))
          .as("sxx"),
        max("dev_num").as("dmax"), min("dev_num").as("dmin"))
      .filter(col("nb") === col("w")) // complete blocks only
    val rs = per2.select(col("w"),
      ((col("dmax") - col("dmin")).cast("double") / col("nb")).as("r"),
      sqrt((col("nb").cast("double") * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double")) /
        (col("nb").cast("double") * col("nb").cast("double"))).as("sd"))
    val mean = rs.groupBy("w")
      .agg(count(lit(1)).as("n_blocks"),
        round(avg(col("r") / col("sd")), 4).as("mean_rs"))
    val fit = mean.agg(count(lit(1)).as("np"),
        sum(log(col("w").cast("double"))).as("sx"),
        sum(log(col("mean_rs"))).as("sy"),
        sum(log(col("w").cast("double")) * log(col("mean_rs"))).as("sxy"),
        sum(log(col("w").cast("double")) * log(col("w").cast("double")))
          .as("sxx"))
      .select(round((col("np") * col("sxy") - col("sx") * col("sy")) /
        (col("np") * col("sxx") - col("sx") * col("sx")), 4).as("hurst"))
    mean.crossJoin(broadcast(fit)).orderBy("w")
  }

  // ---- E-242 event run-length statistics -----------------------------------------
  // Per event type: how long are the consecutive same-type runs inside
  // each user's (ts, event_id)-ordered stream? Run anchors via the
  // gaps-and-islands lag (the E-216 discipline), run ids by anchor
  // cumsum, then exact integer run lengths — the behavioral looping
  // screen (rage-clicks, scripted repeats) beside text repetition E-48.
  def extRunlength(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val e = t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("anchor",
        when(lag("event_type", 1).over(w).isNull ||
          lag("event_type", 1).over(w) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("run_id", sum("anchor").over(w))
    val runs = e.groupBy("user_id", "run_id", "event_type")
      .agg(count(lit(1)).as("len"))
    runs.groupBy("event_type")
      .agg(count(lit(1)).as("n_runs"), sum("len").as("n_events"),
        round(sum("len").cast("double") / count(lit(1)), 4)
          .as("mean_run_len"),
        max("len").as("max_run_len"))
      .orderBy("event_type")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_fellegi" -> (extFellegi _),
    "ext_charclass" -> (extCharclass _),
    "ext_hurst" -> (extHurst _),
    "ext_runlength" -> (extRunlength _))

  val oracleSql: Map[String, String] = Map(
    // E-239: identical twin perturbation, truth join on k, non-match
    // join on k+1; exact ratios into log2.
    "ext_fellegi" ->
      """with a as (select c_custkey k, c_name nm, c_nationkey nk,
        |    c_mktsegment seg,
        |    cast(floor(cast(round(c_acctbal * 100) as bigint) / 200000.0)
        |      as bigint) b
        |  from customer),
        |tw as (select c_custkey k,
        |    case when c_custkey % 10 = 0 then c_name || '_x' else c_name end
        |      nm,
        |    c_nationkey nk,
        |    case when c_custkey % 7 = 0 then 'ALTERED' else c_mktsegment end
        |      seg,
        |    cast(floor((cast(round(c_acctbal * 100) as bigint) +
        |      case when c_custkey % 3 = 0 then 100000 else 0 end) / 200000.0)
        |      as bigint) b
        |  from customer),
        |m as (select count(*) n_m,
        |    sum(case when a.nm = tw.nm then 1 else 0 end) name_m,
        |    sum(case when a.nk = tw.nk then 1 else 0 end) nat_m,
        |    sum(case when a.seg = tw.seg then 1 else 0 end) seg_m,
        |    sum(case when a.b = tw.b then 1 else 0 end) bal_m
        |  from a join tw on tw.k = a.k),
        |u as (select count(*) n_u,
        |    sum(case when a.nm = tw.nm then 1 else 0 end) name_u,
        |    sum(case when a.nk = tw.nk then 1 else 0 end) nat_u,
        |    sum(case when a.seg = tw.seg then 1 else 0 end) seg_u,
        |    sum(case when a.b = tw.b then 1 else 0 end) bal_u
        |  from a join tw on tw.k = a.k + 1),
        |stacked as (
        |  select 'name' field, name_m agree_m, n_m, name_u agree_u, n_u
        |    from m cross join u
        |  union all select 'nation', nat_m, n_m, nat_u, n_u
        |    from m cross join u
        |  union all select 'segment', seg_m, n_m, seg_u, n_u
        |    from m cross join u
        |  union all select 'bal_bucket', bal_m, n_m, bal_u, n_u
        |    from m cross join u)
        |select field, cast(agree_m as bigint) agree_m,
        |  cast(n_m as bigint) n_m, cast(agree_u as bigint) agree_u,
        |  cast(n_u as bigint) n_u,
        |  round((cast(agree_m as double) + 0.5) / (n_m + 1), 6) m,
        |  round((cast(agree_u as double) + 0.5) / (n_u + 1), 6) u,
        |  round(log2(((cast(agree_m as double) + 0.5) / (n_m + 1))
        |    / ((cast(agree_u as double) + 0.5) / (n_u + 1))), 4) w_agree,
        |  round(log2((1.0 - (cast(agree_m as double) + 0.5) / (n_m + 1))
        |    / (1.0 - (cast(agree_u as double) + 0.5) / (n_u + 1))), 4)
        |    w_disagree
        |from stacked order by field""".stripMargin,

    // E-240: identical regex-strip char counting.
    "ext_charclass" ->
      """with d as (select source,
        |    cast(length(text) as bigint) nc,
        |    cast(length(text) - length(regexp_replace(text, '[a-zA-Z]', '',
        |      'g')) as bigint) alpha,
        |    cast(length(text) - length(regexp_replace(text, '[0-9]', '',
        |      'g')) as bigint) digit,
        |    cast(length(text) - length(regexp_replace(text, ' ', '', 'g'))
        |      as bigint) space
        |  from documents)
        |select source, cast(count(*) as bigint) n_docs,
        |  cast(sum(nc) as bigint) n_chars,
        |  round(cast(sum(alpha) as double) / sum(nc), 6) alpha_share,
        |  round(cast(sum(digit) as double) / sum(nc), 6) digit_share,
        |  round(cast(sum(space) as double) / sum(nc), 6) space_share,
        |  round(cast(sum(nc) - sum(alpha) - sum(digit) - sum(space)
        |    as double) / sum(nc), 6) other_share
        |from d group by source order by source""".stripMargin,

    // E-241: identical integer cumulative-deviation cross-multiply,
    // HUGEINT Σx², complete blocks only, identical OLS fold.
    "ext_hurst" ->
      """with daily as (select o_orderdate dy,
        |    cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint) x
        |  from orders group by 1),
        |d as (select dy, x,
        |    cast(row_number() over (order by dy) as bigint) - 1 rn
        |  from daily),
        |blocks as (select w, rn // w blk, x,
        |    cast(row_number() over (partition by w, rn // w order by rn)
        |      as bigint) t,
        |    sum(x) over (partition by w, rn // w order by rn
        |      rows unbounded preceding) run,
        |    count(*) over (partition by w, rn // w) nb,
        |    sum(x) over (partition by w, rn // w) sxb
        |  from d cross join unnest([16, 32, 64, 128]) u(w)),
        |per as (select w, blk, max(nb) nb,
        |    sum(cast(x as hugeint)) sx,
        |    sum(cast(x as hugeint) * cast(x as hugeint)) sxx,
        |    max(run * nb - t * sxb) dmax, min(run * nb - t * sxb) dmin
        |  from blocks group by w, blk having max(nb) = w),
        |rs as (select w,
        |    cast(dmax - dmin as double) / nb r,
        |    sqrt((cast(nb as double) * cast(sxx as double) -
        |      cast(sx as double) * cast(sx as double)) /
        |      (cast(nb as double) * cast(nb as double))) sd
        |  from per),
        |mean as (select cast(w as bigint) w,
        |    cast(count(*) as bigint) n_blocks,
        |    round(avg(r / sd), 4) mean_rs from rs group by w),
        |fit as (select round((count(*) * sum(ln(cast(w as double)) *
        |      ln(mean_rs)) - sum(ln(cast(w as double))) * sum(ln(mean_rs)))
        |    / (count(*) * sum(ln(cast(w as double)) * ln(cast(w as double)))
        |      - sum(ln(cast(w as double))) * sum(ln(cast(w as double)))), 4)
        |    hurst from mean)
        |select w, n_blocks, mean_rs, hurst
        |from mean cross join fit order by w""".stripMargin,

    // E-242: identical gaps-and-islands run construction under the
    // (ts, event_id) total order.
    "ext_runlength" ->
      """with e as (select user_id, ts, event_id, event_type,
        |    case when lag(event_type) over
        |        (partition by user_id order by ts, event_id) is distinct
        |        from event_type then 1 else 0 end anchor
        |  from events),
        |r as (select user_id, event_type,
        |    sum(anchor) over (partition by user_id order by ts, event_id
        |      rows unbounded preceding) run_id
        |  from e),
        |runs as (select user_id, run_id, event_type,
        |    cast(count(*) as bigint) len
        |  from r group by user_id, run_id, event_type)
        |select event_type, cast(count(*) as bigint) n_runs,
        |  cast(sum(len) as bigint) n_events,
        |  round(cast(sum(len) as double) / count(*), 4) mean_run_len,
        |  cast(max(len) as bigint) max_run_len
        |from runs group by event_type order by event_type""".stripMargin)
}
