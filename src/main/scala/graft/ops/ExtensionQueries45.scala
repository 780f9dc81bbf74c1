package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 45: graph structure III and
  * survey sampling — rich-club coefficients, multi-seed eccentricity
  * (BFS-based diameter lower bound), the Horvitz–Thompson PPS
  * estimator with an integer cross-multiplied inclusion coin, and
  * Neyman allocation for stratified sampling.
  */
object ExtensionQueries45 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def h60(c: Column) =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  // ---- E-291 rich-club coefficient -----------------------------------------------
  // Do the hubs stick together? For degree thresholds k ∈ {2,4,8,16}:
  // φ(k) = 2·E_k / (N_k·(N_k−1)) over the subgraph of nodes with
  // degree > k on the co-order part graph — integer edge/node counts,
  // one division per k. Rising φ(k) = an elite core (the broker
  // structure E-199's assortativity summarizes in one number).
  def extRichclub(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
    val edges = li.select(col("l_orderkey").as("o"), col("l_partkey").as("u"))
      .join(li.select(col("l_orderkey").as("o"), col("l_partkey").as("v")), "o")
      .filter(col("u") < col("v")).select("u", "v").distinct()
    val deg = edges.select(col("u").as("id"))
      .unionAll(edges.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val ks = s.range(1, 5)
      .select(pow(lit(2.0), col("id")).cast("long").as("k"))
    val nk = broadcast(ks).join(deg, col("d") > col("k"))
      .groupBy("k").agg(count(lit(1)).as("n_nodes"))
    val ek = edges
      .join(deg.select(col("id").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("d").as("dv")), "v")
      .crossJoin(broadcast(ks))
      .filter(col("du") > col("k") && col("dv") > col("k"))
      .groupBy("k").agg(count(lit(1)).as("n_edges"))
    nk.join(ek, Seq("k"), "left")
      .select(col("k"), col("n_nodes"),
        coalesce(col("n_edges"), lit(0L)).as("n_edges"),
        round(coalesce(col("n_edges"), lit(0L)).cast("double") * 2 /
          (col("n_nodes").cast("double") * (col("n_nodes") - 1)), 6)
          .as("phi"))
      .orderBy("k")
  }

  // ---- E-292 multi-seed eccentricity ---------------------------------------------
  // Per-seed BFS depth on the supplier–part bipartite graph (E-51's
  // edges): eccentricity = max hop within 6, the classic diameter
  // lower bound from a handful of seeds — exact integer distances
  // from the iterative frontier expansion, recursive-CTE oracle.
  def extEccentricity(s: SparkSession, dir: String): DataFrame = {
    // long-encoded node ids (SpIds): the 6 labeled-BFS rounds shuffle
    // (seed LONG, id LONG); seeds decode at the output boundary only
    val pairs = t(s, dir, "lineitem")
      .select(SpIds.s(col("l_suppkey")).as("sn"),
        SpIds.p(col("l_partkey")).as("pn"))
      .distinct()
    val edges = pairs.select(col("sn").as("src"), col("pn").as("dst"))
      .unionAll(pairs.select(col("pn").as("src"), col("sn").as("dst")))
    // one labeled sweep for all three probes: 6 frontier joins, not 18
    val sources = pairs.sparkSession.range(3)
      .select(element_at(array(lit(2L), lit(10L), lit(18L)), // S1, S5, S9
        (col("id") + 1).cast("int")).as("seed"))
      .withColumn("id", col("seed"))
    Bfs.labeledHops(edges, sources, maxHops = 6)
      .groupBy("seed")
      .agg(max(col("hops")).cast("long").as("eccentricity"),
        count(lit(1)).as("n_reached"))
      .select(SpIds.decode(col("seed")).as("seed"), col("eccentricity"),
        col("n_reached"))
      .orderBy("seed")
  }

  // ---- E-293 Horvitz–Thompson PPS estimator --------------------------------------
  // Estimate total revenue from a probability-proportional-to-size
  // sample: π_i = min(1, 200·yᵢ/S); inclusion decided by the INTEGER
  // cross-multiply h·S < 2⁶⁰·200·yᵢ on the portable coin (no float in
  // the sample membership), estimate Σ yᵢ/πᵢ — which for PPS collapses
  // to n_uncapped·S/200 + Σ_capped yᵢ, a settled closed form. Reported
  // with the truth and the realized sample size: the unequal-
  // probability design every "sample the big orders more" pipeline is
  // secretly using, made honest.
  def extHt(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_orderkey").as("k"),
        round(col("o_totalprice") * 100).cast("long")
          .cast("decimal(38,0)").as("y"))
      .withColumn("h", h60(col("k").cast("string")).cast("decimal(38,0)"))
    val tot = o.agg(sum("y").as("s_all"), count(lit(1)).as("n_all"))
    val flagged = o.crossJoin(broadcast(tot))
      .withColumn("capped", lit(200) * col("y") >= col("s_all"))
      .withColumn("sampled",
        col("capped") ||
          col("h") * col("s_all") <
            lit(200) * col("y") * lit(1152921504606846976L).cast("decimal(38,0)"))
    flagged.agg(max("s_all").as("s_all"), max("n_all").as("n_all"),
        sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sample"),
        sum(when(col("sampled") && !col("capped"), 1L).otherwise(0L))
          .as("n_uncapped"),
        sum(when(col("capped"), col("y")).otherwise(lit(0).cast("decimal(38,0)")))
          .as("y_capped"))
      .select(
        round(col("s_all").cast("double") / 100, 2).as("true_total"),
        col("n_all"), col("n_sample"),
        round((col("n_uncapped").cast("double") *
          col("s_all").cast("double") / 200 +
          col("y_capped").cast("double")) / 100, 2).as("ht_estimate"),
        round((col("n_uncapped").cast("double") *
          col("s_all").cast("double") / 200 +
          col("y_capped").cast("double")) /
          col("s_all").cast("double") - 1, 6).as("rel_err"))
  }

  // ---- E-294 Neyman allocation ---------------------------------------------------
  // How should a 100-unit sample spread over the 5 segments? Neyman:
  // n_h ∝ N_h·σ_h (σ from exact decimal cents moments) vs the naive
  // proportional N_h/N — the design table that shows where variance
  // actually lives. Allocations reported as settled doubles (no
  // integer rounding races).
  def extNeyman(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(col("c_mktsegment").as("seg"),
        round(col("c_acctbal") * 100).cast("long").cast("decimal(38,0)")
          .as("v"))
    val per = c.groupBy("seg")
      .agg(count(lit(1)).as("nh"), sum("v").as("sv"),
        sum(col("v") * col("v")).as("svv"))
      .withColumn("sd",
        sqrt((col("nh").cast("double") * col("svv").cast("double") -
          col("sv").cast("double") * col("sv").cast("double")) /
          (col("nh").cast("double") * col("nh").cast("double"))))
    val tot = per.agg(sum("nh").as("n_tot"),
      sum(col("nh") * col("sd")).as("sum_nsd"))
    per.crossJoin(broadcast(tot))
      .select(col("seg"), col("nh"),
        round(col("sd") / 100, 2).as("sd_dollars"),
        round(lit(100.0) * col("nh") * col("sd") / col("sum_nsd"), 4)
          .as("neyman_n"),
        round(lit(100.0) * col("nh") / col("n_tot"), 4)
          .as("proportional_n"))
      .orderBy("seg")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_richclub" -> (extRichclub _),
    "ext_eccentricity" -> (extEccentricity _),
    "ext_ht" -> (extHt _),
    "ext_neyman" -> (extNeyman _))

  val oracleSql: Map[String, String] = Map(
    // E-291: identical degree-thresholded subgraph counts.
    "ext_richclub" ->
      """with e0 as (select distinct a.l_partkey u, b.l_partkey v
        |  from lineitem a join lineitem b
        |  on a.l_orderkey = b.l_orderkey and a.l_partkey < b.l_partkey),
        |deg as (select nd, cast(count(*) as bigint) d from
        |  (select u nd from e0 union all select v from e0) group by nd),
        |ks as (select cast(pow(2, i) as bigint) k
        |  from unnest(range(1, 5)) u(i)),
        |nk as (select k, cast(count(*) as bigint) n_nodes
        |  from ks join deg on d > k group by k),
        |ek as (select ks.k, cast(count(*) as bigint) n_edges
        |  from e0 join deg du on du.nd = e0.u
        |  join deg dv on dv.nd = e0.v
        |  cross join ks
        |  where du.d > ks.k and dv.d > ks.k
        |  group by ks.k)
        |select nk.k, n_nodes, coalesce(n_edges, 0) n_edges,
        |  round(cast(coalesce(n_edges, 0) as double) * 2 /
        |    (cast(n_nodes as double) * (n_nodes - 1)), 6) phi
        |from nk left join ek on ek.k = nk.k order by nk.k""".stripMargin,

    // E-292: the E-51 recursive walk per seed.
    "ext_eccentricity" ->
      """with recursive pairs as (select distinct
        |    'S' || l_suppkey sn, 'P' || l_partkey pn from lineitem),
        |edges as (select sn src, pn dst from pairs
        |  union all select pn, sn from pairs),
        |walk(seed, id, hops) as (
        |  select s.seed, s.seed, 0 from (values ('S1'), ('S5'), ('S9'))
        |    s(seed)
        |  union
        |  select w.seed, e.dst, w.hops + 1 from walk w
        |  join edges e on e.src = w.id where w.hops < 6),
        |d as (select seed, id, min(hops) hops from walk
        |  group by seed, id)
        |select seed, cast(max(hops) as bigint) eccentricity,
        |  cast(count(*) as bigint) n_reached
        |from d group by seed order by seed""".stripMargin,

    // E-293: identical cross-multiplied coin and closed-form estimate.
    "ext_ht" ->
      """with o as (select o_orderkey k,
        |    cast(cast(round(o_totalprice * 100) as bigint) as hugeint) y,
        |    cast(('0x' || substr(sha256(cast(o_orderkey as varchar)), 1,
        |      15))::bigint as hugeint) h
        |  from orders),
        |tot as (select sum(y) s_all, cast(count(*) as bigint) n_all from o),
        |f as (select k, y, h, s_all, n_all,
        |    200 * y >= s_all capped,
        |    (200 * y >= s_all) or
        |      (h * s_all < 200 * y * 1152921504606846976::hugeint) sampled
        |  from o cross join tot),
        |agg as (select max(s_all) s_all, max(n_all) n_all,
        |    cast(sum(case when sampled then 1 else 0 end) as bigint)
        |      n_sample,
        |    cast(sum(case when sampled and not capped then 1 else 0 end)
        |      as bigint) n_uncapped,
        |    sum(case when capped then y else 0::hugeint end) y_capped
        |  from f)
        |select round(cast(s_all as double) / 100, 2) true_total,
        |  n_all, n_sample,
        |  round((cast(n_uncapped as double) * cast(s_all as double) / 200
        |    + cast(y_capped as double)) / 100, 2) ht_estimate,
        |  round((cast(n_uncapped as double) * cast(s_all as double) / 200
        |    + cast(y_capped as double)) / cast(s_all as double) - 1, 6)
        |    rel_err
        |from agg""".stripMargin,

    // E-294: identical exact-moment σ and allocation forms.
    "ext_neyman" ->
      """with c as (select c_mktsegment seg,
        |    cast(cast(round(c_acctbal * 100) as bigint) as hugeint) v
        |  from customer),
        |per as (select seg, cast(count(*) as bigint) nh, sum(v) sv,
        |    sum(v * v) svv from c group by seg),
        |sdv as (select seg, nh,
        |    sqrt((cast(nh as double) * cast(svv as double) -
        |      cast(sv as double) * cast(sv as double)) /
        |      (cast(nh as double) * cast(nh as double))) sd
        |  from per),
        |tot as (select cast(sum(nh) as bigint) n_tot,
        |    sum(nh * sd) sum_nsd from sdv)
        |select seg, nh, round(sd / 100, 2) sd_dollars,
        |  round(100.0 * nh * sd / sum_nsd, 4) neyman_n,
        |  round(100.0 * nh / n_tot, 4) proportional_n
        |from sdv cross join tot order by seg""".stripMargin)
}
