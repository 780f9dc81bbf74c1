package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 78: preference aggregation — Borda
  * rank fusion of the three document-quality signals, the Condorcet
  * pairwise-majority check over the fused top-10, and in-database
  * Bradley-Terry supplier strengths from price contests (two unrolled
  * MM iterations).
  */
object ExtensionQueries78 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Per-doc quality metrics (the E-350 trio) ranked ACROSS docs per
    * metric — rank 1 = best (metric desc, doc_id tiebreak). The doc
    * frame is corpus-collapsed, so the three unpartitioned rank
    * windows sort thousands of rows, not the raw text table.
    */
  private def docRanks(s: SparkSession, dir: String): DataFrame = {
    val toksAll = filter(split(col("text"), " "), x => x =!= "")
    val stops = array(Seq("the", "a", "of", "and", "to", "in", "is",
      "on", "for", "with").map(lit): _*)
    val m = t(s, dir, "documents")
      .select(col("doc_id"),
        size(toksAll).cast("double").as("nt"),
        size(filter(toksAll, x => array_contains(stops, x)))
          .cast("double").as("nstop"),
        size(array_distinct(toksAll)).cast("double").as("nd"),
        length(regexp_replace(col("text"), "[^a-z0-9]", ""))
          .cast("double").as("nalnum"),
        length(col("text")).cast("double").as("nc"))
      .filter(col("nt") > 0 && col("nc") > 0)
      .select(col("doc_id"),
        (col("nstop") / col("nt")).as("m1"),
        (col("nd") / col("nt")).as("m2"),
        (col("nalnum") / col("nc")).as("m3"))
    m.select(col("doc_id"),
        explode(array(
          struct(col("m1").as("v"), lit(1L).as("j")),
          struct(col("m2").as("v"), lit(2L).as("j")),
          struct(col("m3").as("v"), lit(3L).as("j")))).as("e"))
      .select(col("doc_id"), col("e.j").as("j"), col("e.v").as("v"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("j").orderBy(desc("v"), asc("doc_id")))
        .cast("long"))
  }

  // ---- E-382 Borda rank fusion ---------------------------------------------------
  // One quality ranking from three: Borda points = N − rank summed
  // over the three metric rankings (exact integers end to end) — the
  // simplest positional rank-aggregation rule, robust to any metric's
  // scale. Top-15 fused docs with their per-metric ranks.
  def extBorda(s: SparkSession, dir: String): DataFrame = {
    val ranked = docRanks(s, dir)
    val n = ranked.groupBy().agg((count(lit(1)) / 3).cast("long").as("nd")).limit(1)
    ranked.crossJoin(broadcast(n))
      .groupBy("doc_id")
      .agg(sum(col("nd") - col("rk")).as("borda"),
        max(when(col("j") === 1, col("rk"))).as("rank_m1"),
        max(when(col("j") === 2, col("rk"))).as("rank_m2"),
        max(when(col("j") === 3, col("rk"))).as("rank_m3"))
      .orderBy(desc("borda"), asc("doc_id"))
      .limit(15)
  }

  // ---- E-383 Condorcet pairwise majority -----------------------------------------
  // Does the Borda winner survive head-to-head? Over the fused top-10,
  // a beats b when a ranks better in ≥2 of the 3 metrics; the
  // Condorcet winner beats all 9 rivals. Majorities are integer
  // counts over a 10×10 bounded pair join — rank-aggregation theory's
  // classic disagreement (Borda ≠ Condorcet) made inspectable.
  def extCondorcet(s: SparkSession, dir: String): DataFrame = {
    val ranked = docRanks(s, dir)
    val n = ranked.groupBy().agg((count(lit(1)) / 3).cast("long").as("nd")).limit(1)
    val top = ranked.crossJoin(broadcast(n))
      .groupBy("doc_id").agg(sum(col("nd") - col("rk")).as("borda"))
      .orderBy(desc("borda"), asc("doc_id"))
      .limit(10)
    val tr = ranked.join(top.select("doc_id"), Seq("doc_id"))
      .select(col("doc_id"), col("j"), col("rk")).limit(30)
    val duels = tr.select(col("doc_id").as("a"), col("j"),
        col("rk").as("ra"))
      .join(tr.select(col("doc_id").as("b"), col("j"),
        col("rk").as("rb")), Seq("j"))
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b")
      .agg(sum(when(col("ra") < col("rb"), 1L).otherwise(0L)).as("wins"))
      .groupBy("a")
      .agg(sum(when(col("wins") >= 2, 1L).otherwise(0L))
        .as("majorities"))
    duels.join(top, col("a") === col("doc_id"))
      .select(col("doc_id"), col("borda"), col("majorities"),
        (col("majorities") === 9L).as("condorcet_winner"))
      .orderBy(desc("majorities"), desc("borda"), asc("doc_id"))
  }

  // ---- E-384 Bradley-Terry supplier strengths ------------------------------------
  // Latent price-competitiveness from pairwise contests: suppliers
  // sharing a part duel on unit price, the winner decided by INTEGER
  // cross-multiply (cents_a·qty_b < cents_b·qty_a — no division),
  // exact ties dropped. Two unrolled MM iterations of the
  // Bradley-Terry likelihood — π_i ← W_i ∕ Σ_j n_ij∕(π_i+π_j) — with
  // π re-quantized to 1e-9 after each step so both engines walk
  // identical integer states. Parts with > 20 suppliers are excluded
  // (the E-133 hub-cap discipline: bounds the pair fan-out under
  // Zipfian supply at corpus scale). Top-15 by strength.
  def extBradleyterry(s: SparkSession, dir: String): DataFrame = {
    val ps = t(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"),
        sum(col("l_quantity").cast("long")).as("qty"))
    val deg = ps.groupBy("pk").agg(count(lit(1)).as("nsup"))
      .filter(col("nsup") <= 20 && col("nsup") >= 2)
    val capped = ps.join(deg.select("pk"), Seq("pk"))
    val duels = capped.select(col("pk"), col("sk").as("sa"),
        col("cents").as("ca"), col("qty").as("qa"))
      .join(capped.select(col("pk"), col("sk").as("sb"),
        col("cents").as("cb"), col("qty").as("qb")), Seq("pk"))
      .filter(col("sa") =!= col("sb"))
      .filter(col("ca") * col("qb") =!= col("cb") * col("qa"))
      .select(col("sa"), col("sb"),
        when(col("ca") * col("qb") < col("cb") * col("qa"), 1L)
          .otherwise(0L).as("win"))
    val pairs = duels.groupBy("sa", "sb")
      .agg(sum("win").as("w"), count(lit(1)).as("nij"))
    val wins = pairs.groupBy(col("sa").as("sk")).agg(sum("w").as("wtot"))
    def iterate(pi: DataFrame): DataFrame = {
      val terms = pairs
        .join(pi.select(col("sk").as("sa"), col("piq").as("pa")),
          Seq("sa"))
        .join(pi.select(col("sk").as("sb"), col("piq").as("pb")),
          Seq("sb"))
        .select(col("sa"),
          round(col("nij").cast("double") * 1e15 /
            (col("pa") + col("pb")).cast("double")).cast("long").as("tq"))
        .groupBy(col("sa").as("sk"))
        .agg(sum(col("tq").cast("decimal(38,0)")).as("ti"))
      wins.join(terms, Seq("sk"))
        .select(col("sk"),
          greatest(round(col("wtot").cast("double") * 1e15 /
            col("ti").cast("double")).cast("long"), lit(1L)).as("piq"))
    }
    val pi0 = wins.select(col("sk"), lit(1000000000L).as("piq"))
    val pi2 = iterate(iterate(pi0))
    pi2.join(wins, Seq("sk"))
      .join(pairs.groupBy(col("sa").as("sk"))
        .agg(sum("nij").as("contests")), Seq("sk"))
      .select(col("sk").as("supplier"), col("contests"),
        col("wtot").as("wins"),
        round(col("piq").cast("double") / 1e9, 6).as("bt_strength"))
      .orderBy(desc("bt_strength"), asc("supplier"))
      .limit(15)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_borda" -> (extBorda _),
    "ext_condorcet" -> (extCondorcet _),
    "ext_bradleyterry" -> (extBradleyterry _))

  private val ranksSql =
    """m as (select doc_id,
      |    cast(len(list_filter(string_split(text, ' '), x -> x <> ''))
      |      as double) nt,
      |    cast(len(list_filter(string_split(text, ' '),
      |      x -> list_contains(['the', 'a', 'of', 'and', 'to', 'in',
      |        'is', 'on', 'for', 'with'], x))) as double) nstop,
      |    cast(len(list_distinct(list_filter(string_split(text, ' '),
      |      x -> x <> ''))) as double) nd,
      |    cast(len(regexp_replace(text, '[^a-z0-9]', '', 'g'))
      |      as double) nalnum,
      |    cast(len(text) as double) nc
      |  from documents),
      |mm as (select doc_id, nstop / nt m1, nd / nt m2, nalnum / nc m3
      |  from m where nt > 0 and nc > 0),
      |ranked as (select doc_id, j, v,
      |    cast(row_number() over (partition by j
      |      order by v desc, doc_id asc) as bigint) rk
      |  from (select doc_id, 1 j, m1 v from mm
      |    union all select doc_id, 2, m2 from mm
      |    union all select doc_id, 3, m3 from mm)),
      |n as (select cast(count(*) // 3 as bigint) nd from ranked)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // E-382: identical metric trio, per-metric ranks, Borda sum.
    "ext_borda" ->
      s"""with $ranksSql
        |select doc_id, cast(sum(nd - rk) as bigint) borda,
        |  max(case when j = 1 then rk end) rank_m1,
        |  max(case when j = 2 then rk end) rank_m2,
        |  max(case when j = 3 then rk end) rank_m3
        |from ranked cross join n
        |group by doc_id
        |order by borda desc, doc_id asc limit 15""".stripMargin,

    // E-383: identical top-10 slice and pairwise-majority counts.
    "ext_condorcet" ->
      s"""with $ranksSql,
        |top as (select doc_id, cast(sum(nd - rk) as bigint) borda
        |  from ranked cross join n
        |  group by doc_id
        |  order by borda desc, doc_id asc limit 10),
        |tr as (select ranked.doc_id, j, rk
        |  from ranked join top using (doc_id)),
        |duelwins as (select a.doc_id a, b.doc_id b,
        |    cast(sum(case when a.rk < b.rk then 1 else 0 end)
        |      as bigint) wins
        |  from tr a join tr b on a.j = b.j and a.doc_id <> b.doc_id
        |  group by 1, 2),
        |maj as (select a,
        |    cast(sum(case when wins >= 2 then 1 else 0 end) as bigint)
        |      majorities
        |  from duelwins group by 1)
        |select doc_id, borda, majorities,
        |  (majorities = 9) condorcet_winner
        |from maj join top on top.doc_id = maj.a
        |order by majorities desc, borda desc, doc_id asc""".stripMargin,

    // E-384: identical contests, hub cap, two quantized MM steps.
    "ext_bradleyterry" ->
      """with ps as (select l_partkey pk, l_suppkey sk,
        |    cast(sum(cast(round(l_extendedprice * 100) as bigint))
        |      as bigint) cents,
        |    cast(sum(cast(l_quantity as bigint)) as bigint) qty
        |  from lineitem group by 1, 2),
        |deg as (select pk from ps group by pk
        |  having count(*) <= 20 and count(*) >= 2),
        |capped as (select ps.* from ps join deg using (pk)),
        |duels as (select a.sk sa, b.sk sb,
        |    case when a.cents * b.qty < b.cents * a.qty then 1 else 0 end
        |      win
        |  from capped a join capped b
        |    on a.pk = b.pk and a.sk <> b.sk
        |  where a.cents * b.qty <> b.cents * a.qty),
        |pairs as (select sa, sb, cast(sum(win) as bigint) w,
        |    cast(count(*) as bigint) nij
        |  from duels group by 1, 2),
        |wins as (select sa sk, cast(sum(w) as bigint) wtot
        |  from pairs group by 1),
        |pi0 as (select sk, cast(1000000000 as bigint) piq from wins),
        |t1 as (select pairs.sa sk,
        |    sum(cast(cast(round(cast(nij as double) * 1e15 /
        |      cast(a.piq + b.piq as double)) as bigint) as hugeint)) ti
        |  from pairs
        |  join pi0 a on a.sk = pairs.sa
        |  join pi0 b on b.sk = pairs.sb
        |  group by 1),
        |pi1 as (select wins.sk,
        |    greatest(cast(round(cast(wtot as double) * 1e15 /
        |      cast(ti as double)) as bigint), 1) piq
        |  from wins join t1 on t1.sk = wins.sk),
        |t2 as (select pairs.sa sk,
        |    sum(cast(cast(round(cast(nij as double) * 1e15 /
        |      cast(a.piq + b.piq as double)) as bigint) as hugeint)) ti
        |  from pairs
        |  join pi1 a on a.sk = pairs.sa
        |  join pi1 b on b.sk = pairs.sb
        |  group by 1),
        |pi2 as (select wins.sk,
        |    greatest(cast(round(cast(wtot as double) * 1e15 /
        |      cast(ti as double)) as bigint), 1) piq
        |  from wins join t2 on t2.sk = wins.sk),
        |cont as (select sa sk, cast(sum(nij) as bigint) contests
        |  from pairs group by 1)
        |select pi2.sk supplier, contests, wtot wins,
        |  round(cast(piq as double) / 1e9, 6) bt_strength
        |from pi2 join wins on wins.sk = pi2.sk
        |join cont on cont.sk = pi2.sk
        |order by bt_strength desc, supplier asc limit 15""".stripMargin)
}
