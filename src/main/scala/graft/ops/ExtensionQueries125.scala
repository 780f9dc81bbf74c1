package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 extension queries, batch 125: FULL Louvain — the round-9
  * judge's directive #2. E-470 ran one greedy move round from
  * singletons; E-472 runs the whole algorithm shape on the weighted
  * brand co-order graph: integer-exact local-move rounds iterated to a
  * FIXPOINT (bounded), then one COARSENING (communities → super-nodes,
  * intra-community weight → self-loops) and one more move round on the
  * contracted graph — the phase that makes Louvain the standard
  * community detector at scale. Kernels live in [[Louvain]].
  */
object ExtensionQueries125 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Phase-A round budget of the GATED instance. Measured fixpoints:
    * sf0.01 at round 8, sf0.1 at round 3 (the end-state trickle is
    * single-node moves whose gain only turns positive as Σ_c shifts —
    * genuine modularity dynamics, not a bug), so 10 gives one round of
    * headroom; smaller-label-only adoption guarantees termination —
    * every mover's label strictly decreases — so the bound is a safety
    * valve, not the semantics.
    */
  val MaxRounds = 10

  // ---- E-472 full Louvain: move-to-fixpoint + coarsen + move -----------------------
  // Trace contract (one row per EXECUTED round, the E-471 pattern):
  //   (stage, round, n_moved, n_comms, q_num, q6, fixpoint)
  // stage 0 = local-move rounds from singletons on the brand graph,
  // emitted until the first round with n_moved = 0 (flagged
  // fixpoint=true) or MaxRounds; stage 1 = the single move round on the
  // COARSENED graph. Q is exact: q_num = Σ_c (4m·w_in(c) − Σ_c²) is a
  // long (no float accumulation), q6 = q_num/(4m²) rounded 6dp — one
  // IEEE division, engine-stable. A zero-mover round is ABSORBING
  // (same inputs → same empty move set), which is what lets the
  // unrolled oracle run all MaxRounds statically and filter emission:
  // its lab_MaxRounds equals the Spark side's early-stopped labels.
  //
  // What the trace shows on THIS fixture: the brand co-order graph is
  // near-uniform (hash-assigned brands), so its true modularity optimum
  // is the single community (Q = 0) and the measured trace is a strict
  // monotone ascent to it (sf0.01: −0.0369 → … → 0 with fixpoint at
  // round 8). The coarse stage then contracts to one super-node whose
  // self-loop carries all of m — its round moves nothing (fixpoint
  // immediately) and reproduces q_num = 0 exactly, pinning the weight-
  // preservation invariant of the contraction. A lift-filtered variant
  // (keep 2m·w > k_u·k_v edges) was measured and REJECTED: at sf0.01 its
  // synchronous rounds produce a Q dip (275.9M → 130.7M in q_num) — the
  // classic synchronous-Louvain interference — and at sf0.1 the filter
  // keeps all 300 edges anyway.
  def extLouvain2(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val pres = t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("o"), col("p_brand").as("b"))
      .distinct()
    val e = pres.select(col("o"), col("b").as("u"))
      .join(pres.select(col("o"), col("b").as("v")), "o")
      .filter(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("w"))
      .localCheckpoint()
    // the simple graph has no self-loops; moveRound/scorePartition take
    // the (n, sw) frame anyway so the coarse stage reuses the same code
    val selfw0 = e.select(col("u").as("n"), col("w").as("sw"))
      .filter(lit(false))
    val m = e.agg(coalesce(sum("w"), lit(0L))).head().getLong(0)
    val nodes = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .distinct()
    val denom = lit(4L * m * m).cast("double")

    var labels = Louvain.pin(nodes.select(col("n"), col("n").as("lbl")))
    val trace =
      new scala.collection.mutable.ArrayBuffer[(Int, Int, Long, Long, Long, Boolean)]
    var r = 0
    var done = false
    while (r < MaxRounds && !done) {
      val nl = Louvain.pin(Louvain.moveRound(e, selfw0, labels, m))
      val nMoved = nl
        .join(labels.withColumnRenamed("lbl", "old"), "n")
        .filter(col("lbl") =!= col("old")).count()
      val sc = Louvain.scorePartition(e, selfw0, nl, m).head()
      trace += ((0, r, nMoved, sc.getLong(1), sc.getLong(0), nMoved == 0L))
      labels = nl
      done = nMoved == 0L
      r += 1
    }

    // coarsen from the stage-A fixpoint labels and run one more round
    val (ce0, cs0, cn0) = Louvain.coarsen(e, selfw0, labels)
    val ce = Louvain.pin(ce0)
    val cs = Louvain.pin(cs0)
    val cLabels = cn0.select(col("n"), col("n").as("lbl"))
    val nl2 = Louvain.pin(Louvain.moveRound(ce, cs, cLabels, m))
    val nMoved2 = nl2
      .join(cLabels.withColumnRenamed("lbl", "old"), "n")
      .filter(col("lbl") =!= col("old")).count()
    val sc2 = Louvain.scorePartition(ce, cs, nl2, m).head()
    trace += ((1, 0, nMoved2, sc2.getLong(1), sc2.getLong(0), nMoved2 == 0L))

    trace.toSeq
      .toDF("stage", "round", "n_moved", "n_comms", "q_num", "fixpoint")
      .withColumn("q6", round(col("q_num").cast("double") / denom, 6))
      .select(col("stage"), col("round"), col("n_moved"), col("n_comms"),
        col("q_num"), col("q6"), col("fixpoint"))
      .orderBy("stage", "round")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_louvain2" -> (extLouvain2 _))

  /** E-472 oracle: every move round unrolled (the tables are tiny —
    * ~25 brand nodes — so running all MaxRounds statically is cheap);
    * emission of round r is filtered on "no earlier round was a
    * fixpoint", and the coarse stage always contracts lab_MaxRounds,
    * which equals the Spark side's early-stopped labels because a
    * zero-mover round is absorbing.
    */
  private val louvain2OracleSql: String = {
    val R = MaxRounds
    val sb = new StringBuilder
    sb.append(
      """with pres as materialized (
        |  select distinct l_orderkey o, p_brand b
        |  from lineitem join part on l_partkey = p_partkey),
        |e as materialized (
        |  select a.b u, b.b v, cast(count(*) as bigint) w
        |  from pres a join pres b on a.o = b.o and a.b < b.b
        |  group by 1, 2),
        |mt as materialized (select cast(sum(w) as bigint) m from e),
        |dir as materialized (
        |  select u i, v j, w from e union all select v, u, w from e),
        |nodes as materialized (select u n from e union select v from e),
        |k as materialized (
        |  select i n, cast(sum(w) as bigint) k from dir group by 1),
        |lab_0 as materialized (select n, n lbl from nodes),
        |""".stripMargin)
    for (r <- 0 until R) {
      sb.append(
        s"""sig_$r as materialized (
           |  select l.lbl, cast(sum(k.k) as bigint) sig
           |  from lab_$r l join k on k.n = l.n group by 1),
           |wic_$r as materialized (
           |  select d.i, l.lbl c, cast(sum(d.w) as bigint) wic
           |  from dir d join lab_$r l on l.n = d.j group by 1, 2),
           |cur_$r as materialized (
           |  select l.n i, l.lbl a, k.k ki, s.sig siga,
           |    cast(coalesce(w.wic, 0) as bigint) wia
           |  from lab_$r l join k on k.n = l.n
           |  join sig_$r s on s.lbl = l.lbl
           |  left join wic_$r w on w.i = l.n and w.c = l.lbl),
           |gains_$r as (
           |  select c.i, w.c,
           |    2 * mt.m * (w.wic - c.wia) - c.ki * (s2.sig - c.siga + c.ki)
           |      gain2m2
           |  from wic_$r w join cur_$r c on c.i = w.i
           |  join sig_$r s2 on s2.lbl = w.c, mt
           |  where w.c < c.a
           |    and 2 * mt.m * (w.wic - c.wia)
           |      - c.ki * (s2.sig - c.siga + c.ki) > 0),
           |mv_$r as materialized (
           |  select i n, c newlbl from (
           |    select i, c, row_number() over (partition by i
           |      order by gain2m2 desc, c asc) rk from gains_$r)
           |  where rk = 1),
           |lab_${r + 1} as materialized (
           |  select l.n, coalesce(m2.newlbl, l.lbl) lbl
           |  from lab_$r l left join mv_$r m2 on m2.n = l.n),
           |nm_$r as materialized (
           |  select cast(count(*) as bigint) nm
           |  from lab_$r a join lab_${r + 1} b on a.n = b.n
           |  where a.lbl <> b.lbl),
           |win_$r as (
           |  select la.lbl, cast(sum(e.w) as bigint) w_in
           |  from e join lab_${r + 1} la on la.n = e.u
           |  join lab_${r + 1} lb on lb.n = e.v
           |  where la.lbl = lb.lbl group by 1),
           |score_$r as materialized (
           |  select cast(sum(4 * mt.m * coalesce(w.w_in, 0)
           |      - s.sig * s.sig) as bigint) q_num,
           |    cast(count(*) as bigint) n_comms
           |  from (select l.lbl, cast(sum(k.k) as bigint) sig
           |        from lab_${r + 1} l join k on k.n = l.n group by 1) s
           |  left join win_$r w on w.lbl = s.lbl, mt),
           |""".stripMargin)
    }
    // coarse stage: contract lab_R, singleton-seed one more move round
    sb.append(
      s"""ce as materialized (
         |  select least(la.lbl, lb.lbl) u, greatest(la.lbl, lb.lbl) v,
         |    cast(sum(e.w) as bigint) w
         |  from e join lab_$R la on la.n = e.u
         |  join lab_$R lb on lb.n = e.v
         |  where la.lbl <> lb.lbl group by 1, 2),
         |cself as materialized (
         |  select la.lbl n, cast(sum(e.w) as bigint) sw
         |  from e join lab_$R la on la.n = e.u
         |  join lab_$R lb on lb.n = e.v
         |  where la.lbl = lb.lbl group by 1),
         |cnodes as materialized (select distinct lbl n from lab_$R),
         |cdir as materialized (
         |  select u i, v j, w from ce union all select v, u, w from ce),
         |ck as materialized (
         |  select cn.n, cast(coalesce(adj.ka, 0) + 2 * coalesce(cs.sw, 0)
         |      as bigint) k
         |  from cnodes cn
         |  left join (select i nn, sum(w) ka from cdir group by 1) adj
         |    on adj.nn = cn.n
         |  left join cself cs on cs.n = cn.n),
         |clab_0 as materialized (select n, n lbl from cnodes),
         |csig as materialized (
         |  select l.lbl, cast(sum(ck.k) as bigint) sig
         |  from clab_0 l join ck on ck.n = l.n group by 1),
         |cwic as materialized (
         |  select d.i, l.lbl c, cast(sum(d.w) as bigint) wic
         |  from cdir d join clab_0 l on l.n = d.j group by 1, 2),
         |ccur as materialized (
         |  select l.n i, l.lbl a, ck.k ki, s.sig siga,
         |    cast(coalesce(w.wic, 0) as bigint) wia
         |  from clab_0 l join ck on ck.n = l.n
         |  join csig s on s.lbl = l.lbl
         |  left join cwic w on w.i = l.n and w.c = l.lbl),
         |cgains as (
         |  select c.i, w.c,
         |    2 * mt.m * (w.wic - c.wia) - c.ki * (s2.sig - c.siga + c.ki)
         |      gain2m2
         |  from cwic w join ccur c on c.i = w.i
         |  join csig s2 on s2.lbl = w.c, mt
         |  where w.c < c.a
         |    and 2 * mt.m * (w.wic - c.wia)
         |      - c.ki * (s2.sig - c.siga + c.ki) > 0),
         |cmv as materialized (
         |  select i n, c newlbl from (
         |    select i, c, row_number() over (partition by i
         |      order by gain2m2 desc, c asc) rk from cgains)
         |  where rk = 1),
         |clab_1 as materialized (
         |  select l.n, coalesce(m2.newlbl, l.lbl) lbl
         |  from clab_0 l left join cmv m2 on m2.n = l.n),
         |cnm as materialized (
         |  select cast(count(*) as bigint) nm
         |  from clab_0 a join clab_1 b on a.n = b.n where a.lbl <> b.lbl),
         |cwin as (
         |  select lbl, cast(sum(we) as bigint) w_in from (
         |    select la.lbl, ce.w we
         |    from ce join clab_1 la on la.n = ce.u
         |    join clab_1 lb on lb.n = ce.v where la.lbl = lb.lbl
         |    union all
         |    select l.lbl, cs.sw from cself cs join clab_1 l on l.n = cs.n)
         |  group by 1),
         |cscore as materialized (
         |  select cast(sum(4 * mt.m * coalesce(w.w_in, 0)
         |      - s.sig * s.sig) as bigint) q_num,
         |    cast(count(*) as bigint) n_comms
         |  from (select l.lbl, cast(sum(ck.k) as bigint) sig
         |        from clab_1 l join ck on ck.n = l.n group by 1) s
         |  left join cwin w on w.lbl = s.lbl, mt)
         |""".stripMargin)
    // emission arms: round r emitted iff no earlier round was a fixpoint
    val arms = (0 until R).map { r =>
      val guard =
        if (r == 0) ""
        else "where " + (0 until r)
          .map(p => s"(select nm from nm_$p) > 0").mkString(" and ")
      s"""select 0 stage, $r "round", (select nm from nm_$r) n_moved,
         |  (select n_comms from score_$r) n_comms,
         |  (select q_num from score_$r) q_num,
         |  round(cast((select q_num from score_$r) as double) /
         |    cast(4 * (select m from mt) * (select m from mt) as double), 6)
         |    q6,
         |  (select nm from nm_$r) = 0 fixpoint
         |$guard""".stripMargin
    } :+
      s"""select 1 stage, 0 "round", (select nm from cnm) n_moved,
         |  (select n_comms from cscore) n_comms,
         |  (select q_num from cscore) q_num,
         |  round(cast((select q_num from cscore) as double) /
         |    cast(4 * (select m from mt) * (select m from mt) as double), 6)
         |    q6,
         |  (select nm from cnm) = 0 fixpoint""".stripMargin
    sb.append(arms.mkString("\nunion all\n"))
    sb.append("\norder by stage, \"round\"")
    sb.toString
  }

  val oracleSql: Map[String, String] = Map(
    "ext_louvain2" -> louvain2OracleSql)
}
