package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 extension queries, batch 99: seeded and attenuated
  * centralities — personalized PageRank (proximity to a seed
  * portfolio) and Katz centrality (attenuated walk counts), both on
  * the supplier–part co-purchase graph, both fixed-iteration power
  * forms whose oracles replay the identical unrolled algebra.
  */
object ExtensionQueries99 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // long-encoded node ids (SpIds): every per-iteration shuffle/hash in
  // PageRank.personalized/katz keys on an 8-byte long instead of a
  // "S123"/"P456" string; ids decode to the contract strings only at
  // the output boundary, so results (incl. string tiebreaks) are
  // identical
  private def supplierPartEdges(s: SparkSession, dir: String): DataFrame = {
    val pairs = t(s, dir, "lineitem")
      .select(SpIds.s(col("l_suppkey")).as("sn"),
        SpIds.p(col("l_partkey")).as("pn"))
      .distinct()
    pairs.select(col("sn").as("src"), col("pn").as("dst"))
      .unionAll(pairs.select(col("pn").as("src"), col("sn").as("dst")))
  }

  // ---- E-431 personalized PageRank ------------------------------------------------
  // "What is CLOSE to this supplier portfolio?" — teleport mass
  // restricted to seeds S1..S5, 3 power iterations on the ext_pagerank
  // graph (E-32's machinery + a broadcast seed flag). Scores measure
  // seed proximity, not global authority: parts supplied by the
  // portfolio surface first, then second-hop suppliers sharing those
  // parts. Same per-iteration cost as PageRank (measured in the
  // BASELINE graph curve).
  def extPpr(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val seeds = Seq(2L, 4L, 6L, 8L, 10L).toDF("id") // S1..S5 encoded
    PageRank.personalized(supplierPartEdges(s, dir), seeds, iterations = 3)
      .select(SpIds.decode(col("id")).as("id"), round(col("pr"), 6).as("pr"))
      .orderBy(desc("pr"), asc("id"))
      .limit(20)
  }

  // ---- E-432 Katz centrality ------------------------------------------------------
  // Attenuated walk counts (α = 1/20, β = 1, 3 iterations): the
  // centrality that still separates nodes where raw degree ties — a
  // part's score folds in its suppliers' OTHER parts at α², which
  // degree cannot see. Computed via the EXACT integer recurrence
  // z_{k+1} = 20^{k+1} + Σ z_k (see PageRank.katz: the float form
  // rounds on the 1.25e-4 half-grid — a measured cross-engine flip at
  // round-4), output both as the integer z and the terminating
  // 6-decimal score z/8000.
  def extKatz(s: SparkSession, dir: String): DataFrame =
    PageRank.katz(supplierPartEdges(s, dir), iterations = 3)
      .select(SpIds.decode(col("id")).as("id"), col("katz_z"),
        round(col("katz"), 6).as("katz"))
      .orderBy(desc("katz_z"), asc("id"))
      .limit(20)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_ppr" -> (extPpr _),
    "ext_katz" -> (extKatz _))

  val oracleSql: Map[String, String] = Map(
    // E-431: identical unrolled restart-vector iterations.
    "ext_ppr" ->
      """with pairs as (select distinct 'S' || l_suppkey sn, 'P' || l_partkey pn
        |  from lineitem),
        |edges as (select sn src, pn dst from pairs
        |          union all select pn, sn from pairs),
        |nodes as (select distinct src id from edges),
        |seeds as (select unnest(['S1','S2','S3','S4','S5']) id),
        |r as (select n.id,
        |    case when s.id is not null then cast(0.2 as double)
        |         else cast(0.0 as double) end rv
        |  from nodes n left join seeds s using (id)),
        |outdeg as (select src, count(*) d from edges group by src),
        |p0 as (select id, rv pr from r),
        |p1 as (select r.id, cast(0.15 as double) * r.rv + cast(0.85 as double)
        |         * coalesce(sum(p.pr / o.d), 0) pr
        |       from r left join edges e on e.dst = r.id
        |       left join p0 p on p.id = e.src left join outdeg o on o.src = e.src
        |       group by r.id, r.rv),
        |p2 as (select r.id, cast(0.15 as double) * r.rv + cast(0.85 as double)
        |         * coalesce(sum(p.pr / o.d), 0) pr
        |       from r left join edges e on e.dst = r.id
        |       left join p1 p on p.id = e.src left join outdeg o on o.src = e.src
        |       group by r.id, r.rv),
        |p3 as (select r.id, cast(0.15 as double) * r.rv + cast(0.85 as double)
        |         * coalesce(sum(p.pr / o.d), 0) pr
        |       from r left join edges e on e.dst = r.id
        |       left join p2 p on p.id = e.src left join outdeg o on o.src = e.src
        |       group by r.id, r.rv)
        |select id, round(pr, 6) pr from p3
        |order by pr desc, id limit 20""".stripMargin,

    // E-432: identical unrolled INTEGER attenuated-walk iterations.
    "ext_katz" ->
      """with pairs as (select distinct 'S' || l_suppkey sn, 'P' || l_partkey pn
        |  from lineitem),
        |edges as (select sn src, pn dst from pairs
        |          union all select pn, sn from pairs),
        |nodes as (select distinct src id from edges),
        |x0 as (select id, cast(1 as bigint) z from nodes),
        |x1 as (select n.id, cast(20 + coalesce(sum(x.z), 0) as bigint) z
        |       from nodes n left join edges e on e.dst = n.id
        |       left join x0 x on x.id = e.src group by n.id),
        |x2 as (select n.id, cast(400 + coalesce(sum(x.z), 0) as bigint) z
        |       from nodes n left join edges e on e.dst = n.id
        |       left join x1 x on x.id = e.src group by n.id),
        |x3 as (select n.id, cast(8000 + coalesce(sum(x.z), 0) as bigint) z
        |       from nodes n left join edges e on e.dst = n.id
        |       left join x2 x on x.id = e.src group by n.id)
        |select id, z katz_z, round(cast(z as double) / 8000, 6) katz from x3
        |order by katz_z desc, id limit 20""".stripMargin)
}
