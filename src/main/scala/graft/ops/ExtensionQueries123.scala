package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 extension queries, batch 123: the Louvain LOCAL-MOVE kernel —
  * greedy modularity ASCENT, the member of the community family the
  * engine still lacked (E-131 label propagation is plurality voting
  * with no objective; E-322 scores a GIVEN partition; this one MOVES
  * nodes to improve Q). One deterministic synchronous round from the
  * singleton partition over the weighted brand co-order graph, then the
  * resulting partition is scored with the E-322 modularity formula — so
  * the row both performs the optimization step and audits what it
  * bought.
  */
object ExtensionQueries123 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-470 Louvain move phase (greedy modularity ascent) -------------------------
  // Weighted graph: nodes = part brands, edge weight w_ij = number of
  // orders containing both brands. From singleton communities, node i
  // joining singleton {j} changes modularity by
  //   ΔQ = w_ij/m − k_i·k_j/(2m²),
  // which is positive iff 2m·w_ij − k_i·k_j > 0 — an EXACT LONG, so
  // both the move filter and the argmax (gain desc, j asc) are integer
  // decisions, bit-stable on any engine (no float modularity in the
  // loop). Synchronous adoption is made acyclic the hash-min way:
  // nodes may only move to a SMALLER-id neighbor, so a swap cycle
  // cannot oscillate and one round yields a valid partition
  // (label(i) = best smaller neighbor, else i). The round ends by
  // scoring the partition: Q = Σ_c (w_in(c)/m − (deg(c)/(2m))²) — the
  // Louvain objective, settled once per community from exact sums and
  // reported per community row (top-10 by size desc, label asc)
  // together with the global q6, so the move's value is visible in the
  // same relation. All joins are keyed on node/community ids; the
  // move table is one row per node — at 100 TB rounds repeat with the
  // same two keyed joins per round (the E-131/E-22 iteration shape).
  def extLouvain(s: SparkSession, dir: String): DataFrame = {
    val pres = t(s, dir, "lineitem")
      .join(t(s, dir, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("o"), col("p_brand").as("b"))
      .distinct()
    val e = pres.select(col("o"), col("b").as("ba"))
      .join(pres.select(col("o"), col("b").as("bb")), "o")
      .filter(col("ba") < col("bb"))
      .groupBy("ba", "bb").agg(count(lit(1)).as("w"))
    val deg = e.select(col("ba").as("n"), col("w"))
      .unionAll(e.select(col("bb").as("n"), col("w")))
      .groupBy("n").agg(sum("w").as("k"))
    val mTot = e.agg(sum("w").as("m"))
    // candidate moves: i → its smaller-id neighbors j (ba < bb ⇒ j=ba)
    val gains = e
      .join(deg.select(col("n").as("bb"), col("k").as("ki")), "bb")
      .join(deg.select(col("n").as("ba"), col("k").as("kj")), "ba")
      .crossJoin(broadcast(mTot))
      .select(col("bb").as("i"), col("ba").as("j"),
        (lit(2) * col("m") * col("w") - col("ki") * col("kj"))
          .as("gain2m2"))
      .filter(col("gain2m2") > 0)
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy("i").orderBy(col("gain2m2").desc, col("j").asc)
    val moves = gains.withColumn("rk", row_number().over(w2))
      .filter(col("rk") === 1).select(col("i").as("n"), col("j").as("lbl"))
    val labels = deg.select(col("n"))
      .join(moves, Seq("n"), "left")
      .select(col("n"), coalesce(col("lbl"), col("n")).as("lbl"))
    // score the resulting partition: w_in per community + degree sums
    val win = e
      .join(labels.select(col("n").as("ba"), col("lbl").as("la")), "ba")
      .join(labels.select(col("n").as("bb"), col("lbl").as("lb")), "bb")
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("lbl")).agg(sum("w").as("w_in"))
    val comm = labels.groupBy("lbl")
      .agg(count(lit(1)).as("n_nodes"))
      .join(labels.join(deg, "n").groupBy("lbl")
        .agg(sum("k").as("k_c")), Seq("lbl"))
      .join(win, Seq("lbl"), "left")
      .select(col("lbl"), col("n_nodes"), col("k_c"),
        coalesce(col("w_in"), lit(0L)).as("w_in"))
    val q = comm.crossJoin(broadcast(mTot))
      .select((col("w_in").cast("double") / col("m") -
        (col("k_c").cast("double") / (lit(2) * col("m"))) *
        (col("k_c").cast("double") / (lit(2) * col("m")))).as("qc"))
      .agg(round(sum("qc"), 6).as("q6"))
    comm.crossJoin(broadcast(q))
      .select(col("lbl"), col("n_nodes"), col("w_in"), col("k_c"), col("q6"))
      .orderBy(col("n_nodes").desc, col("lbl").asc)
      .limit(10)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_louvain" -> (extLouvain _))

  // E-470 oracle: the same integer-gain move round and partition score.
  val oracleSql: Map[String, String] = Map(
    "ext_louvain" ->
      """with pres as materialized (
        |  select distinct l_orderkey o, p_brand b
        |  from lineitem join part on l_partkey = p_partkey),
        |e as materialized (
        |  select a.b ba, b.b bb, cast(count(*) as bigint) w
        |  from pres a join pres b on a.o = b.o and a.b < b.b
        |  group by 1, 2),
        |deg as materialized (select n, cast(sum(w) as bigint) k from
        |  (select ba n, w from e union all select bb, w from e)
        |  group by n),
        |mt as (select cast(sum(w) as bigint) m from e),
        |gains as (
        |  select e.bb i, e.ba j,
        |    2 * mt.m * e.w - di.k * dj.k gain2m2
        |  from e, mt
        |  join deg di on di.n = e.bb
        |  join deg dj on dj.n = e.ba
        |  where 2 * mt.m * e.w - di.k * dj.k > 0),
        |moves as (
        |  select i n, j lbl from (
        |    select i, j, row_number() over (partition by i
        |      order by gain2m2 desc, j asc) rk from gains)
        |  where rk = 1),
        |labels as materialized (
        |  select deg.n, coalesce(moves.lbl, deg.n) lbl
        |  from deg left join moves on moves.n = deg.n),
        |win as (
        |  select la.lbl, cast(sum(e.w) as bigint) w_in
        |  from e join labels la on la.n = e.ba
        |  join labels lb on lb.n = e.bb
        |  where la.lbl = lb.lbl group by 1),
        |comm as materialized (
        |  select l.lbl, cast(count(*) as bigint) n_nodes,
        |    cast(sum(deg.k) as bigint) k_c
        |  from labels l join deg on deg.n = l.n group by 1),
        |full_c as materialized (
        |  select comm.lbl, comm.n_nodes, comm.k_c,
        |    coalesce(win.w_in, 0) w_in
        |  from comm left join win on win.lbl = comm.lbl),
        |q as (select round(sum(
        |    cast(w_in as double) / mt.m -
        |    (cast(k_c as double) / (2 * mt.m)) *
        |    (cast(k_c as double) / (2 * mt.m))), 6) q6
        |  from full_c, mt)
        |select lbl, n_nodes, w_in, k_c, q.q6
        |from full_c, q
        |order by n_nodes desc, lbl asc limit 10""".stripMargin)
}
