package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 extension queries, batch 124: k-truss PEELING — the
  * decomposition step E-230 stops short of. The support histogram says
  * how cohesive edges are; the truss itself requires iteratively
  * DELETING edges with support < k−2 and recomputing (removing an edge
  * destroys triangles through it, which can drop its neighbors' support
  * below the bar). This is also the at-scale pre-filter discipline for
  * the whole triangle family: each peel round shrinks the graph before
  * the next wedge enumeration pays for it.
  */
object ExtensionQueries124 {

  // ---- E-471 k-truss peel (k = 4, 3 bounded rounds) --------------------------------
  // Round r: per-edge support on the CURRENT subgraph (the wedge-
  // bounded enumeration of [[Triangles.edgeSupportBounded]] — degrees
  // and orientation recomputed on survivors, exactly like the oracle's
  // unrolled rounds), keep edges with support ≥ k−2 = 2. Three rounds
  // bound the contract (full decomposition iterates to fixpoint; the
  // per-round trace IS the convergence evidence). Output: one row per
  // round — edges entering the round, edges surviving it, triangles in
  // the entering graph — all exact longs; the counts are assembled
  // driver-side from three bounded actions (3 rows by construction).
  def extKtruss(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val k = 4
    var edges = ExtensionQueries27.coOrderEdges(s, dir).localCheckpoint()
    val trace = new scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Long)]
    for (r <- 0 until 3) {
      // ONE wedge enumeration per round: the support pass carries both
      // census quantities — sup has exactly one row per edge, and
      // Σ support = 3·T (each triangle credits its three edges)
      val sup = Triangles.edgeSupportBounded(edges)
      val census = sup.agg(count(lit(1)).as("n"),
        coalesce(sum("support"), lit(0L)).as("s3")).head()
      val kept = sup.filter(col("support") >= k - 2)
        .select("u", "v")
        .localCheckpoint()
      trace += ((r, census.getLong(0), census.getLong(1) / 3, kept.count()))
      edges = kept
    }
    trace.toSeq.toDF("round", "n_edges", "n_tri", "n_kept")
      .orderBy("round")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_ktruss" -> (extKtruss _))

  /** E-471 oracle: the three peel rounds unrolled — each round re-derives
    * degrees/orientation on the survivors (matching the Spark side's
    * re-orientation per round), enumerates triangles once, credits the
    * three edges, and keeps support ≥ 2.
    */
  private val ktrussOracleSql: String = {
    val sb = new StringBuilder
    sb.append(
      """with e_0 as materialized (
        |  select distinct a.l_partkey u, b.l_partkey v
        |  from lineitem a join lineitem b
        |  on a.l_orderkey = b.l_orderkey and a.l_partkey < b.l_partkey),
        |""".stripMargin)
    for (r <- 0 until 3) {
      sb.append(
        s"""deg_$r as materialized (select kk, count(*) d from
           |  (select u kk from e_$r union all select v from e_$r) group by kk),
           |o_$r as materialized (select
           |    case when da.d < db.d or (da.d = db.d and u < v) then u else v end s,
           |    case when da.d < db.d or (da.d = db.d and u < v) then v else u end t
           |  from e_$r join deg_$r da on da.kk = u join deg_$r db on db.kk = v),
           |tri_$r as materialized (select e1.s a, e1.t b, e2.t c
           |  from o_$r e1 join o_$r e2 on e1.t = e2.s
           |  join o_$r e3 on e3.s = e1.s and e3.t = e2.t),
           |sup_$r as materialized (select u, v, cast(count(*) as bigint) sup from (
           |    select least(a, b) u, greatest(a, b) v from tri_$r
           |    union all select least(b, c), greatest(b, c) from tri_$r
           |    union all select least(a, c), greatest(a, c) from tri_$r)
           |  group by u, v),
           |e_${r + 1} as materialized (
           |  select e.u, e.v from e_$r e join sup_$r s
           |  on s.u = e.u and s.v = e.v where s.sup >= 2),
           |""".stripMargin)
    }
    sb.setLength(sb.length - 2) // drop the trailing ",\n" after the last CTE
    sb.append("\n")
    sb.append(
      (0 until 3).map { r =>
        s"""select $r as round,
           |  (select cast(count(*) as bigint) from e_$r) n_edges,
           |  (select cast(count(*) as bigint) from tri_$r) n_tri,
           |  (select cast(count(*) as bigint) from e_${r + 1}) n_kept""".stripMargin
      }.mkString("\nunion all\n"))
    sb.append("\norder by round")
    sb.toString
  }

  val oracleSql: Map[String, String] = Map("ext_ktruss" -> ktrussOracleSql)
}
