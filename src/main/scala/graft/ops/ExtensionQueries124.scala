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

  /** Round budget of the GATED instance. Measured peel-to-fixpoint
    * depths: sf0.01 flags fixpoint on round 2 (115,729 → 115,662 →
    * 115,660 → stable), sf0.1 on round 7 (1,196,000 → … → 1,109,228 →
    * stable, deltas 61,909 / 22,380 / 1,719 / 658 / 81 / 21 / 4 / 0),
    * so 9 gives one round of headroom; the operator itself takes
    * maxRounds as a parameter. Each unrolled oracle round is one full
    * DuckDB triangle enumeration, measured ~1.5 s at sf0.1 — cheap
    * enough to unroll past the measured depth.
    */
  val MaxRounds = 9

  // ---- E-471 k-truss peel to FIXPOINT (k = 4, bounded rounds) ----------------------
  // Round r: per-edge support on the CURRENT subgraph (the wedge-
  // bounded enumeration of [[Triangles.edgeSupportBounded]] — degrees
  // and orientation recomputed on survivors, exactly like the oracle's
  // unrolled rounds), keep edges with support ≥ k−2 = 2. Peeling stops
  // at the first round that deletes nothing — n_kept = n_edges, the
  // round's own census, flagged fixpoint=true in its trace row (no
  // extra enumeration: a no-op peel is absorbing, so the stabilized
  // graph IS the 4-truss) — or at maxRounds. Output: one row per
  // EXECUTED round — edges entering the round, triangles in the
  // entering graph, edges surviving, fixpoint flag — all exact longs,
  // assembled driver-side from ≤ maxRounds bounded actions.
  def extKtruss(s: SparkSession, dir: String): DataFrame =
    ktrussTrace(s, dir, maxRounds = MaxRounds)

  def ktrussTrace(s: SparkSession, dir: String, maxRounds: Int,
      k: Int = 4): DataFrame = {
    val spark = s
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel
    var edges = ExtensionQueries27.coOrderEdges(s, dir)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val trace =
      new scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Long, Boolean)]
    var r = 0
    var done = false
    while (r < maxRounds && !done) {
      // ONE wedge enumeration per round: the support pass carries both
      // census quantities — sup has exactly one row per edge, and
      // Σ support = 3·T (each triangle credits its three edges).
      // edgeSupportBounded returns an eagerly-checkpointed O(m) frame,
      // so `kept` is a constant-depth filter over it: persist + count
      // here, and the PREVIOUS round's edges unpersist as soon as the
      // new survivors are materialized (round-9 advisor note — no O(m)
      // block set outlives its round).
      val sup = Triangles.edgeSupportBounded(edges)
      val census = sup.agg(count(lit(1)).as("n"),
        coalesce(sum("support"), lit(0L)).as("s3")).head()
      val kept = sup.filter(col("support") >= k - 2)
        .select("u", "v")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nKept = kept.count()
      edges.unpersist(blocking = false)
      val nEdges = census.getLong(0)
      trace += ((r, nEdges, census.getLong(1) / 3, nKept, nKept == nEdges))
      edges = kept
      done = nKept == nEdges
      r += 1
    }
    edges.unpersist(blocking = false)
    trace.toSeq.toDF("round", "n_edges", "n_tri", "n_kept", "fixpoint")
      .orderBy("round")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_ktruss" -> (extKtruss _))

  /** E-471 oracle: the peel rounds unrolled to MaxRounds — each round
    * re-derives degrees/orientation on the survivors (matching the
    * Spark side's re-orientation per round), enumerates triangles once,
    * credits the three edges, and keeps support ≥ 2. Emission of round
    * r is guarded on "no earlier round was a no-op peel", mirroring the
    * Spark side's early stop; the fixpoint flag is the round's own
    * n_kept = n_edges comparison.
    */
  private val ktrussOracleSql: String = {
    val R = MaxRounds
    val sb = new StringBuilder
    sb.append(
      """with e_0 as materialized (
        |  select distinct a.l_partkey u, b.l_partkey v
        |  from lineitem a join lineitem b
        |  on a.l_orderkey = b.l_orderkey and a.l_partkey < b.l_partkey),
        |""".stripMargin)
    for (r <- 0 until R) {
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
      (0 until R).map { r =>
        val guard =
          if (r == 0) ""
          else "\nwhere " + (0 until r)
            .map(p => s"(select count(*) from e_${p + 1}) <> " +
              s"(select count(*) from e_$p)")
            .mkString(" and ")
        s"""select $r as round,
           |  (select cast(count(*) as bigint) from e_$r) n_edges,
           |  (select cast(count(*) as bigint) from tri_$r) n_tri,
           |  (select cast(count(*) as bigint) from e_${r + 1}) n_kept,
           |  (select count(*) from e_${r + 1}) =
           |    (select count(*) from e_$r) fixpoint$guard""".stripMargin
      }.mkString("\nunion all\n"))
    sb.append("\norder by round")
    sb.toString
  }

  val oracleSql: Map[String, String] = Map("ext_ktruss" -> ktrussOracleSql)
}
