package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 extension queries, batch 116: truncated multi-seed
  * betweenness centrality over the co-purchase graph — the brokerage
  * member of the centrality family (PageRank E-23 importance, harmonic
  * closeness E-436 reach, eccentricity E-51); see [[Betweenness]] for
  * the two-pass Brandes machinery. Oracle = generated unrolled
  * forward-σ / backward-δ CTEs (the ext_closeness pattern extended to
  * both passes).
  */
object ExtensionQueries116 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-460 truncated betweenness centrality ------------------------------------------
  // Brandes from probe seeds S1..S10, depth 4, over the supplier–part
  // co-purchase graph (the E-436 graph, so the centrality family is
  // comparable on one structure). Forward σ = exact decimal shortest-
  // path counts along level(v) = level(u)+1 edges; backward δ terms
  // (σu/σv)·(1+δv) quantized 1e-9 before each exact fold. Output: the
  // 15 strongest brokers (btw desc, id asc), seeds excluded, with
  // their per-node dependency settled to 4 dp.
  def extBetweenness(s: SparkSession, dir: String): DataFrame = {
    // long-encoded node ids (SpIds): every forward-σ/backward-δ shuffle
    // of the ~2·maxHops Brandes rounds keys on (seed LONG, id LONG)
    // instead of strings; decode at the output boundary only
    val pairs = t(s, dir, "lineitem")
      .select(SpIds.s(col("l_suppkey")).as("sn"),
        SpIds.p(col("l_partkey")).as("pn"))
      .distinct()
    val edges = pairs.select(col("sn").as("src"), col("pn").as("dst"))
      .unionAll(pairs.select(col("pn").as("src"), col("sn").as("dst")))
    val spark = s
    import spark.implicits._
    val sources = (1 to 10).map(i => (2L * i, 2L * i)).toDF("seed", "id")
    Betweenness.truncated(edges, sources, maxHops = 4)
      .select(SpIds.decode(col("id")).as("id"),
        round(col("btw").cast("double"), 4).as("btw4"))
      .orderBy(col("btw4").desc, col("id").asc)
      .limit(15)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_betweenness" -> (extBetweenness _))

  // E-460 oracle: labeled BFS rounds (min-hop fold), forward σ per
  // level restricted to shortest-path edges, backward δ with the same
  // 1e-9 term quantization, exact decimal folds throughout.
  private def betweennessOracle(rounds: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """with pairs as materialized (select distinct 'S' || l_suppkey sn, 'P' || l_partkey pn
        |  from lineitem),
        |edges as materialized (select sn src, pn dst from pairs
        |          union all select pn, sn from pairs),
        |h0 as materialized (select 'S' || g id, 'S' || g seed, 0 hops
        |  from generate_series(1, 10) t(g)),
        |""".stripMargin)
    for (k <- 1 to rounds) {
      sb.append(s"h$k as materialized (select seed, id, min(hops) hops from (")
      sb.append(s"select seed, id, hops from h${k - 1} union all ")
      sb.append(s"select f.seed, e.dst id, $k hops from ")
      sb.append(s"(select seed, id from h${k - 1} where hops = ${k - 1}) f ")
      sb.append(s"join edges e on e.src = f.id) t group by seed, id),\n")
    }
    sb.append("s0 as materialized (select seed, id, cast(1 as decimal(38,0)) sig from h0),\n")
    for (k <- 1 to rounds) {
      sb.append(s"s$k as materialized (select p.seed, e.dst id, ")
      sb.append(s"cast(sum(p.sig) as decimal(38,0)) sig ")
      sb.append(s"from s${k - 1} p join edges e on e.src = p.id ")
      sb.append(s"join h$rounds l on l.seed = p.seed and l.id = e.dst ")
      sb.append(s"and l.hops = $k group by 1, 2),\n")
    }
    sb.append(s"d$rounds as materialized (select seed, id, ")
    sb.append(s"cast(0 as decimal(38,9)) delta from s$rounds),\n")
    for (k <- (rounds - 1) to 1 by -1) {
      sb.append(s"d$k as materialized (select u.seed, u.id, cast(coalesce(sum(")
      sb.append("cast(round(cast(u.sig as double) / cast(v.sig as double) * ")
      sb.append("(1 + cast(dd.delta as double)), 9) as decimal(38,9))), ")
      sb.append(s"cast(0 as decimal(38,9))) as decimal(38,9)) delta ")
      sb.append(s"from s$k u ")
      sb.append("left join edges e on e.src = u.id ")
      sb.append(s"left join s${k + 1} v on v.seed = u.seed and v.id = e.dst ")
      sb.append(s"left join d${k + 1} dd on dd.seed = v.seed and dd.id = v.id ")
      sb.append("group by 1, 2),\n")
    }
    val levels = (1 until rounds).map(k => s"select * from d$k")
      .mkString("alld as (", " union all ", "),\n")
    sb.append(levels)
    sb.append(
      """tot as (select id, cast(sum(delta) as decimal(38,9)) btw
        |  from alld group by 1)
        |select id, round(cast(btw as double), 4) btw4 from tot
        |order by btw4 desc, id asc limit 15""".stripMargin)
    sb.toString
  }

  val oracleSql: Map[String, String] = Map(
    "ext_betweenness" -> betweennessOracle(4))
}
