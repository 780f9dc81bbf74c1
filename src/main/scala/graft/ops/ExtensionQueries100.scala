package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 extension queries, batch 100: weighted shortest paths and
  * label-propagation communities on the supplier–part co-purchase
  * graph — the cost-aware and density-aware companions to the hop
  * (E-51) and reachability (E-22) primitives. Both oracles are
  * GENERATED unrolled round CTEs (the ext_ppr/ext_katz pattern) so
  * the DuckDB side replays the identical round algebra.
  */
object ExtensionQueries100 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def supplierPartEdges(s: SparkSession, dir: String): DataFrame = {
    val pairs = t(s, dir, "lineitem")
      .select(concat(lit("S"), col("l_suppkey")).as("sn"),
        concat(lit("P"), col("l_partkey")).as("pn"))
      .distinct()
    pairs.select(col("sn").as("src"), col("pn").as("dst"))
      .unionAll(pairs.select(col("pn").as("src"), col("sn").as("dst")))
  }

  // ---- E-433 weighted single-source shortest paths --------------------------------
  // Cheapest-route distances from supplier S1 (the E-51 BFS seed) with
  // edge cost = the cheapest lineitem price ever quoted on that
  // supplier–part link, in EXACT cents — "what is the cheapest chain
  // of substitutions from this supplier to that part?". 4 Bellman-Ford
  // rounds (the bipartite graph alternates S/P sides, so 4 edges reach
  // everything BFS's 3 hops saw plus cheaper detours BFS cannot see:
  // a 4-edge path can undercut a 2-edge one on price). Distances stay
  // long cents end-to-end — no float in the min-plus fold.
  def extSssp(s: SparkSession, dir: String): DataFrame = {
    // long-encoded node ids (SpIds): the min-cost edge groupBy and every
    // Bellman-Ford round shuffle key on longs; decode at the output
    // boundary only (before the dist/id-tiebreak order, so string
    // ordering is preserved)
    val pe = t(s, dir, "lineitem")
      .groupBy(SpIds.s(col("l_suppkey")).as("sn"),
        SpIds.p(col("l_partkey")).as("pn"))
      .agg(min(round(col("l_extendedprice") * 100).cast("long")).as("w"))
    val edges = pe.select(col("sn").as("src"), col("pn").as("dst"), col("w"))
      .unionAll(pe.select(col("pn").as("src"), col("sn").as("dst"), col("w")))
    val spark = s
    import spark.implicits._
    val sources = Seq(2L).toDF("id") // S1
    Sssp.distances(edges, sources, rounds = 4)
      .select(SpIds.decode(col("id")).as("id"), col("dist"))
      .orderBy(asc("dist"), asc("id"))
      .limit(20)
  }

  // ---- E-434 label-propagation communities ----------------------------------------
  // Density-seeking communities via 3 synchronous modal-vote rounds
  // (self-vote damping, min-label ties — see LabelProp); output is the
  // community size table, the corpus-curation "which dense cluster
  // does this belong to" precompute. Deterministic by construction, so
  // the oracle replays the identical unrolled vote/pick rounds.
  def extLabelprop(s: SparkSession, dir: String): DataFrame =
    LabelProp.communities(supplierPartEdges(s, dir), rounds = 3)
      .groupBy(col("lbl").as("community"))
      .agg(count(lit(1)).as("members"))
      .orderBy(desc("members"), asc("community"))
      .limit(20)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_sssp" -> (extSssp _),
    "ext_labelprop" -> (extLabelprop _))

  // E-433 oracle: identical unrolled min-plus rounds over the same
  // exact-cent edge weights.
  private def ssspOracle(rounds: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """with pe as (select 'S' || l_suppkey sn, 'P' || l_partkey pn,
        |    min(cast(round(l_extendedprice * 100, 0) as bigint)) w
        |  from lineitem group by 1, 2),
        |edges as (select sn src, pn dst, w from pe
        |          union all select pn, sn, w from pe),
        |d0 as (select 'S1' id, cast(0 as bigint) dist),
        |""".stripMargin)
    for (k <- 1 to rounds) {
      sb.append(s"d$k as (select id, cast(min(dist) as bigint) dist from (")
      sb.append(s"select id, dist from d${k - 1} union all ")
      sb.append(s"select e.dst id, d.dist + e.w dist from d${k - 1} d ")
      sb.append(s"join edges e on e.src = d.id) t group by id)")
      sb.append(if (k < rounds) ",\n" else "\n")
    }
    sb.append(s"select id, dist from d$rounds order by dist, id limit 20")
    sb.toString
  }

  // E-434 oracle: identical unrolled vote/pick rounds (lbl, not the
  // DuckDB-reserved `label`).
  private def labelpropOracle(rounds: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """with pairs as (select distinct 'S' || l_suppkey sn, 'P' || l_partkey pn
        |  from lineitem),
        |edges as (select sn src, pn dst from pairs
        |          union all select pn, sn from pairs),
        |nodes as (select distinct src id from edges),
        |l0 as (select id, id lbl from nodes),
        |""".stripMargin)
    for (k <- 1 to rounds) {
      sb.append(s"v$k as (select id, lbl, count(*) n from (")
      sb.append(s"select e.dst id, l.lbl lbl from edges e ")
      sb.append(s"join l${k - 1} l on l.id = e.src ")
      sb.append(s"union all select id, lbl from l${k - 1}) t group by id, lbl),\n")
      sb.append(s"l$k as (select id, lbl from (select id, lbl, ")
      sb.append(s"row_number() over (partition by id order by n desc, lbl) rk ")
      sb.append(s"from v$k) t where rk = 1)")
      sb.append(if (k < rounds) ",\n" else "\n")
    }
    sb.append(s"select lbl community, count(*) members from l$rounds ")
    sb.append("group by lbl order by members desc, community limit 20")
    sb.toString
  }

  val oracleSql: Map[String, String] = Map(
    "ext_sssp" -> ssspOracle(4),
    "ext_labelprop" -> labelpropOracle(3))
}
