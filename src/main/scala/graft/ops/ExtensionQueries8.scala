package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-4 extension queries, batch 8: end-to-end entity resolution
  * (blocking → match → cluster → canonical list), pre-flight join
  * cardinality auditing, and weight-of-evidence feature binning.
  */
object ExtensionQueries8 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-135 entity resolution end-to-end ---------------------------------------
  // The full ER pipeline over part names: sorted-neighborhood
  // candidates ([[Blocking]]), Jaro-Winkler match at 0.95, transitive
  // closure into entities ([[ConnectedComponents]] — entity id = min
  // member id), members emitted as a sorted CSV so the whole cluster
  // membership is hash-gated, not just its size.
  def extErEntities(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val pairs = Blocking.sortedNeighborhood(t(s, dir, "part"), col("p_brand"),
        col("p_name"), col("p_partkey"), w = 4)
      .withColumn("jw",
        round(call_function("jaro_winkler", col("key_a"), col("key_b")), 4))
      .filter(col("jw") >= 0.95)
    val comps = ConnectedComponents.components(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
    comps.groupBy(col("component").as("entity"))
      .agg(count(lit(1)).as("n_members"),
        concat_ws(",", sort_array(collect_list(col("node")))).as("members"))
      .orderBy("entity")
  }

  // ---- E-136 join-cardinality pre-flight ------------------------------------------
  // Estimate a join's output size BEFORE running it, from the two
  // sides' key histograms: |A ⋈ B| = Σ_k cnt_A(k)·cnt_B(k), plus the
  // single worst key and its share — the explosion check that, at
  // 100 TB, costs two cheap keyed aggregates instead of one blown-up
  // shuffle. Complements ext_skewstats (one-sided skew): the product
  // term is what actually detonates.
  def extJoinCard(s: SparkSession, dir: String): DataFrame = {
    val ca = t(s, dir, "lineitem").groupBy(col("l_orderkey").as("k"))
      .agg(count(lit(1)).as("ca"))
    val cb = t(s, dir, "orders").filter(col("o_orderstatus") === "O")
      .groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("cb"))
    val prod = ca.join(cb, "k")
      .select(col("k"), (col("ca") * col("cb")).as("contrib"))
    prod.agg(sum("contrib").as("est_rows"),
        count(lit(1)).as("n_keys"),
        max(struct(col("contrib"), col("k"))).as("top"))
      .select(col("est_rows"), col("n_keys"),
        col("top.k").as("top_key"), col("top.contrib").as("top_contrib"))
  }

  // ---- E-137 weight-of-evidence binning --------------------------------------------
  // The credit-scoring view of a feature: per $50 value band, WOE =
  // ln((pos_b/P)/(neg_b/N)) with +0.5 smoothing, and the information
  // value IV = Σ (pos_b/P − neg_b/N)·WOE_b as a constant column.
  // Integer cell counts; the float chain mirrors the oracle
  // token-for-token, folded over ≤10 bins.
  def extWoe(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(
        greatest(least(floor(col("value") / 50), lit(9L)), lit(0L)).as("bin"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("p"))
    val per = e.groupBy("bin")
      .agg(sum(col("p")).as("n_pos"),
        sum(lit(1L) - col("p")).as("n_neg"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val pr = (col("n_pos") + 0.5) / (sum(col("n_pos")).over(wAll) + 0.5)
    val nr = (col("n_neg") + 0.5) / (sum(col("n_neg")).over(wAll) + 0.5)
    per.select(col("bin"), col("n_pos"), col("n_neg"),
        pr.as("__pr"), nr.as("__nr"))
      .withColumn("woe", log(col("__pr") / col("__nr")))
      .withColumn("iv", sum((col("__pr") - col("__nr")) * col("woe")).over(wAll))
      .select(col("bin"), col("n_pos"), col("n_neg"),
        round(col("woe"), 6).as("woe"), round(col("iv"), 6).as("iv"))
      .orderBy("bin")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_er_entities" -> (extErEntities _),
    "ext_joincard" -> (extJoinCard _),
    "ext_woe" -> (extWoe _))

  val oracleSql: Map[String, String] = Map(
    // E-135: SNM pairs recomputed (ext_snm's SQL at 0.95), recursive
    // transitive closure (ext_canonical's pattern), sorted member CSV.
    "ext_er_entities" ->
      """with recursive r0 as (select p_partkey id, p_name nm, p_brand blk,
        |    row_number() over (partition by p_brand
        |      order by p_name, p_partkey) rn
        |  from part),
        |pr as (select a.id u, b.id v
        |  from r0 a join r0 b on a.blk = b.blk
        |    and b.rn between a.rn + 1 and a.rn + 3
        |  where round(jaro_winkler_similarity(a.nm, b.nm), 4) >= 0.95),
        |edges as (select u, v from pr union select v, u from pr),
        |r(a, b) as (select u, v from edges
        |  union
        |  select r.a, e.v from r join edges e on r.b = e.u),
        |comp as (select a id, least(a, min(b)) component from r group by a)
        |select component entity, cast(count(*) as bigint) n_members,
        |  string_agg(id, ',' order by id) members
        |from comp group by component order by entity""".stripMargin,

    // E-136: identical histogram product; top key via a scalar subquery
    // ordered (contrib desc, k desc) ≡ Spark's max(struct(contrib, k))
    // tiebreak. (DuckDB 1.0.0 rejects max_by with a list second arg.)
    "ext_joincard" ->
      """with ca as (select l_orderkey k, cast(count(*) as bigint) ca
        |  from lineitem group by 1),
        |cb as (select o_orderkey k, cast(count(*) as bigint) cb
        |  from orders where o_orderstatus = 'O' group by 1),
        |p as (select ca.k, ca.ca * cb.cb contrib from ca join cb using (k))
        |select cast(sum(contrib) as bigint) est_rows,
        |  cast(count(*) as bigint) n_keys,
        |  (select k from p order by contrib desc, k desc limit 1) top_key,
        |  cast(max(contrib) as bigint) top_contrib
        |from p""".stripMargin,

    // E-137: identical smoothing and op order; ln on settled ratios.
    "ext_woe" ->
      """with e as (select greatest(least(cast(floor(value / 50) as bigint),
        |      9), 0) bin,
        |    case when event_type = 'purchase' then 1 else 0 end p
        |  from events where event_type in ('click', 'purchase')),
        |g as (select bin, cast(sum(p) as bigint) n_pos,
        |    cast(sum(1 - p) as bigint) n_neg
        |  from e group by 1),
        |w as (select bin, n_pos, n_neg,
        |    (n_pos + 0.5) / (cast(sum(n_pos) over () as double) + 0.5) as pr,
        |    (n_neg + 0.5) / (cast(sum(n_neg) over () as double) + 0.5) as nr
        |  from g)
        |select bin, n_pos, n_neg, round(ln(pr / nr), 6) as woe,
        |  round(sum((pr - nr) * ln(pr / nr)) over (), 6) as iv
        |from w order by bin""".stripMargin)
}
