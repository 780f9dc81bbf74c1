package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 27: graph analytics II — link
  * prediction (Adamic–Adar and Jaccard neighborhood scores over the
  * supplier–part bipartite graph) and local structure (per-node
  * clustering coefficient and k-truss edge support over the co-order
  * part graph). All four ride the degree-capped / degree-oriented join
  * shapes of E-38/E-133 — never an uncapped hub fan-out.
  */
object ExtensionQueries27 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Distinct supplier–part edges (the E-133 bipartite graph). */
  private def supplierPartEdges(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_suppkey").as("s"), col("l_partkey").as("p")).distinct()

  /** Distinct co-ordered part pairs (the E-38 undirected graph, u < v).
    * Public so [[graft.tools.ScaleProbe]] measures cardinalities on the
    * exact graph the trussup/clustcoef queries run on.
    */
  def coOrderEdges(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
    li.select(col("l_orderkey").as("o"), col("l_partkey").as("u"))
      .join(li.select(col("l_orderkey").as("o"), col("l_partkey").as("v")), "o")
      .filter(col("u") < col("v"))
      .select("u", "v")
      .distinct()
  }

  // ---- E-227 Adamic–Adar link prediction -----------------------------------------
  // Which supplier pairs SHOULD be connected? Σ 1/ln(deg(p)) over shared
  // parts — rare shared parts count more than popular ones (the classic
  // common-neighbor weighting). Parts with degree 1 contribute no pair;
  // degree-2 up to the 1000 hub cap (the E-133 dfCap discipline — a
  // no-op at fixture degrees, mandatory on a Zipfian 100 TB graph,
  // because pair fan-out is deg² per part). Ranked on the ROUNDED score
  // with pair tiebreak so the top-20 cut never rides a float ULP.
  def extAdamic(s: SparkSession, dir: String): DataFrame = {
    val edges = supplierPartEdges(s, dir)
    val deg = edges.groupBy("p").agg(count(lit(1)).as("d"))
      .filter(col("d").between(2L, 1000L))
      .withColumn("w", lit(1.0) / log(col("d").cast("double")))
    // both sides of the self-join below — pin so the edges⋈deg prune
    // runs once, not twice
    val pruned = edges.join(deg, "p").localCheckpoint()
    val pairs = pruned.select(col("p"), col("w"), col("s").as("s_a"))
      .join(pruned.select(col("p"), col("s").as("s_b")), "p")
      .filter(col("s_a") < col("s_b"))
      .groupBy("s_a", "s_b")
      .agg(count(lit(1)).as("shared"), round(sum("w"), 6).as("aa_score"))
    pairs.orderBy(desc("aa_score"), asc("s_a"), asc("s_b")).limit(20)
  }

  // ---- E-228 Jaccard neighborhood link prediction --------------------------------
  // The set-overlap companion to E-227: |N(a)∩N(b)| / |N(a)∪N(b)| with
  // the union by inclusion–exclusion (da + db − shared) — every term an
  // exact integer, one settled division at the end, so the ranking is
  // fully deterministic (no libm in the loop). Same capped p-join.
  def extJacclink(s: SparkSession, dir: String): DataFrame = {
    val edges = supplierPartEdges(s, dir)
    val pdeg = edges.groupBy("p").agg(count(lit(1)).as("d"))
      .filter(col("d").between(2L, 1000L)).select("p")
    val sdeg = edges.groupBy("s").agg(count(lit(1)).as("ds"))
    val pruned = edges.join(pdeg, "p")
    val pairs = pruned.select(col("p"), col("s").as("s_a"))
      .join(pruned.select(col("p"), col("s").as("s_b")), "p")
      .filter(col("s_a") < col("s_b"))
      .groupBy("s_a", "s_b").agg(count(lit(1)).as("shared"))
    // NOTE: degrees join back on the FULL edge list — the cap prunes
    // which parts may generate pairs, not what a neighborhood contains.
    pairs
      .join(sdeg.select(col("s").as("s_a"), col("ds").as("da")), "s_a")
      .join(sdeg.select(col("s").as("s_b"), col("ds").as("db")), "s_b")
      .select(col("s_a"), col("s_b"), col("shared"), col("da"), col("db"),
        round(col("shared").cast("double") /
          (col("da") + col("db") - col("shared")), 6).as("jaccard"))
      .orderBy(desc("jaccard"), asc("s_a"), asc("s_b")).limit(20)
  }

  // ---- E-229 local clustering coefficient ----------------------------------------
  // Per-node C = 2·T / (d·(d−1)) on the co-order part graph: how close
  // each part's neighborhood is to a clique — the node-level cohesion
  // signal the global E-38 count averages away. T and d are exact
  // integers from the degree-oriented triangle join; C is one settled
  // division. Nodes with d < 2 have no defined coefficient and are
  // excluded. Top-20 under (coef desc, id) — integer-derived, no ULP.
  def extClustcoef(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // The co-order derivation (lineitem self-join + distinct) ran once
    // per consumer here — deg AND perNodeBounded each re-derived it, and
    // at battery scale the 32-partition distinct/deg hash aggregates sat
    // exactly at the execution-pool edge (m100v failed nondeterministically
    // at the default heap). Round-12 shape: derive + persist the edge
    // list ONCE, under partitions sized to the lineitem row count (the
    // same thresholded discipline as Triangles.joinConfs — empty at
    // fixture scale, so fixture plans stay byte-identical), and release
    // it once the 20-row result is pinned.
    val liRows = t(s, dir, "lineitem").count()
    val minParts = s.conf.getOption("spark.sql.shuffle.partitions")
      .fold(32)(_.toInt)
    // co-order edges ≈ 1.5 × lineitem rows on this schema; 256k-row
    // tasks keep every hash map ~10-20 MB
    val sizeConfs: Seq[(String, String)] =
      if (liRows * 2 <= 256000L * minParts) Seq.empty
      else Seq(
        "spark.sql.shuffle.partitions" -> (liRows * 2 / 256000L).toString,
        "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    Plans.withConf(s, sizeConfs: _*) {
      val edges = coOrderEdges(s, dir).persist(StorageLevel.MEMORY_AND_DISK_SER)
      val deg = edges.select(col("u").as("id"))
        .unionAll(edges.select(col("v").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val out = deg.filter(col("deg") >= 2)
        .join(Triangles.perNodeBounded(edges)
          .withColumnRenamed("n_triangles", "tri"), Seq("id"), "left")
        .select(col("id"), col("deg"),
          coalesce(col("tri"), lit(0L)).as("tri"))
        .withColumn("coef",
          round(col("tri").cast("double") * 2 /
            (col("deg") * (col("deg") - 1)), 6))
        .orderBy(desc("coef"), desc("deg"), asc("id")).limit(20)
        .localCheckpoint()
      edges.unpersist(blocking = false)
      out
    }
  }

  // ---- E-230 k-truss edge support histogram --------------------------------------
  // Support(u,v) = triangles through the edge — step 1 of truss
  // decomposition (the community-core peel: the k-truss keeps edges
  // with support ≥ k−2). Each oriented triangle credits its three
  // edges; zero-support edges surface via the left join. Reported as
  // the support histogram — the curve a planner peels against. Runs
  // the wedge-BOUNDED form (shuffle-hash joins so the W-row wedge
  // stream is never sorted, hash-sliced when W outgrows one pass) —
  // same rows bit-for-bit, no spill cliff at sf3 (see
  // [[Triangles.edgeSupportBounded]]).
  def extTrussup(s: SparkSession, dir: String): DataFrame =
    Triangles.edgeSupportBounded(coOrderEdges(s, dir))
      .groupBy("support").agg(count(lit(1)).as("n_edges"))
      .orderBy("support")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_adamic" -> (extAdamic _),
    "ext_jacclink" -> (extJacclink _),
    "ext_clustcoef" -> (extClustcoef _),
    "ext_trussup" -> (extTrussup _))

  val oracleSql: Map[String, String] = Map(
    // E-227: the degree cap is live (2..1000); ln is natural log in both
    // engines; ranking on the rounded score mirrors the Spark side.
    "ext_adamic" ->
      """with e as (select distinct l_suppkey s, l_partkey p from lineitem),
        |deg as (select p, count(*) d from e group by p
        |  having count(*) between 2 and 1000),
        |pe as (select e.s, e.p, 1.0 / ln(deg.d) w from e join deg using (p))
        |select a.s s_a, b.s s_b, cast(count(*) as bigint) shared,
        |  round(sum(a.w), 6) aa_score
        |from pe a join pe b on a.p = b.p and a.s < b.s
        |group by a.s, b.s
        |order by aa_score desc, s_a, s_b limit 20""".stripMargin,

    // E-228: union via inclusion–exclusion on FULL degrees; cap only
    // gates pair generation.
    "ext_jacclink" ->
      """with e as (select distinct l_suppkey s, l_partkey p from lineitem),
        |pk as (select p from e group by p having count(*) between 2 and 1000),
        |sd as (select s, cast(count(*) as bigint) ds from e group by s),
        |pe as (select e.s, e.p from e join pk using (p)),
        |pairs as (select a.s s_a, b.s s_b, cast(count(*) as bigint) shared
        |  from pe a join pe b on a.p = b.p and a.s < b.s group by a.s, b.s)
        |select s_a, s_b, shared, da.ds da, db.ds db,
        |  round(cast(shared as double) / (da.ds + db.ds - shared), 6) jaccard
        |from pairs join sd da on da.s = s_a join sd db on db.s = s_b
        |order by jaccard desc, s_a, s_b limit 20""".stripMargin,

    // E-229: identical degree-oriented triangle enumeration as the
    // ext_triangles oracle, joined to full degrees.
    "ext_clustcoef" ->
      """with e0 as (select distinct a.l_partkey u, b.l_partkey v
        |  from lineitem a join lineitem b
        |  on a.l_orderkey = b.l_orderkey and a.l_partkey < b.l_partkey),
        |deg as (select k id, cast(count(*) as bigint) deg from
        |  (select u k from e0 union all select v from e0) group by k),
        |e as (select
        |    case when da.deg < db.deg or (da.deg = db.deg and u < v)
        |      then u else v end s,
        |    case when da.deg < db.deg or (da.deg = db.deg and u < v)
        |      then v else u end t
        |  from e0 join deg da on da.id = u join deg db on db.id = v),
        |tri as (select e1.s a, e1.t b, e2.t c
        |  from e e1 join e e2 on e1.t = e2.s
        |  join e e3 on e3.s = e1.s and e3.t = e2.t),
        |tn as (select id, cast(count(*) as bigint) tri from
        |  (select unnest([a, b, c]) id from tri) group by id)
        |select deg.id, deg.deg, coalesce(tn.tri, 0) tri,
        |  round(cast(coalesce(tn.tri, 0) as double) * 2
        |    / (deg.deg * (deg.deg - 1)), 6) coef
        |from deg left join tn using (id)
        |where deg.deg >= 2
        |order by coef desc, deg.deg desc, id limit 20""".stripMargin,

    // E-230: triangles credit three edges each, canonicalized u < v;
    // support-0 edges kept by the left join.
    "ext_trussup" ->
      """with e0 as (select distinct a.l_partkey u, b.l_partkey v
        |  from lineitem a join lineitem b
        |  on a.l_orderkey = b.l_orderkey and a.l_partkey < b.l_partkey),
        |deg as (select k, count(*) d from
        |  (select u k from e0 union all select v from e0) group by k),
        |e as (select
        |    case when da.d < db.d or (da.d = db.d and u < v) then u else v end s,
        |    case when da.d < db.d or (da.d = db.d and u < v) then v else u end t
        |  from e0 join deg da on da.k = u join deg db on db.k = v),
        |tri as (select e1.s a, e1.t b, e2.t c
        |  from e e1 join e e2 on e1.t = e2.s
        |  join e e3 on e3.s = e1.s and e3.t = e2.t),
        |tedges as (
        |  select least(a, b) u, greatest(a, b) v from tri
        |  union all select least(b, c), greatest(b, c) from tri
        |  union all select least(a, c), greatest(a, c) from tri),
        |sup as (select u, v, cast(count(*) as bigint) sup
        |  from tedges group by u, v)
        |select coalesce(sup.sup, 0) support, cast(count(*) as bigint) n_edges
        |from e0 left join sup using (u, v)
        |group by 1 order by support""".stripMargin)
}
