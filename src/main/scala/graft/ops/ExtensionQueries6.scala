package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 extension queries, batch 6: link analysis beyond PageRank
  * ([[Hits]]), temporal overlap joins ([[IntervalJoin]]), column
  * profiling ([[Profile]]), decile gains/lift ([[Eval.gains]]), and
  * split-conformal prediction intervals (composing [[Stats.ols2]] +
  * [[Sampling.foldAssign]]).
  */
object ExtensionQueries6 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  // ---- E-128 HITS hubs & authorities -------------------------------------------
  // Supplier→part bipartite graph, 2 iterations. Unnormalized HITS on
  // a unit-initialized graph is pure INTEGER arithmetic (sums of
  // counts), so every score is exactly representable and the ranking
  // pins across engines.
  def extHits(s: SparkSession, dir: String): DataFrame = {
    // long-encoded node ids (SpIds): both per-iteration HITS shuffles
    // key on longs; decode at the output boundary only
    val edges = t(s, dir, "lineitem")
      .select(SpIds.s(col("l_suppkey")).as("src"),
        SpIds.p(col("l_partkey")).as("dst"))
      .distinct()
    Hits.run(edges, iterations = 2)
      .select(SpIds.decode(col("id")).as("id"), round(col("hub"), 4).as("hub"),
        round(col("auth"), 4).as("auth"))
      .orderBy(desc("hub"), desc("auth"), asc("id"))
      .limit(20)
  }

  // ---- E-129 interval-overlap self-join ------------------------------------------
  // Concurrent activity windows per user: event interval = [ts,
  // ts + value minutes]; pairs of overlapping windows found via
  // 1-hour bucket registration, never a nested-loop range join.
  def extIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").filter(col("user_id") <= 50)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("s0"),
        // floor, not round: HALF_UP (Spark) vs half-even (DuckDB)
        // diverge on exact .5 products; floor of the identical IEEE
        // product is identical everywhere
        (unix_timestamp(col("ts")) + floor(col("value") * 60).cast("long")).as("e0"))
    IntervalJoin.overlapSelfJoin(e, col("user_id"), col("event_id"),
        col("s0"), col("e0"), bucketWidth = 3600L)
      .select(col("block").as("blk"), col("id_a"), col("id_b"), col("overlap"))
      .orderBy("blk", "id_a", "id_b")
  }

  // ---- E-130 column profiling -----------------------------------------------------
  // The pre-trust describe over orders; dates profiled as ISO date
  // strings, integers as decimal strings — renderings both engines
  // produce identically.
  def extProfile(s: SparkSession, dir: String): DataFrame =
    Profile.profile(
        t(s, dir, "orders").select(
          col("o_custkey").cast("string").as("o_custkey"),
          col("o_orderstatus"), col("o_orderpriority"),
          to_date(col("o_orderdate")).cast("string").as("o_orderdate")),
        Seq("o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate"))
      .orderBy("col_name")

  // ---- E-131 decile gains / lift ---------------------------------------------------
  // Targeting view of the ext_auc cosine score: capture and lift per
  // score decile, cut positionally on (score desc, vec_id).
  def extGains(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = t(s, dir, "embeddings")
    val centroid = e.filter(col("label") === 0)
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("pos").agg(avg("v").as("m"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("c"))
    val scored = e.crossJoin(broadcast(centroid))
      .select(col("vec_id"),
        round(call_function("cosine_sim", col("embedding"), col("c")), 6)
          .as("score"),
        (col("label") === 0).as("pos"))
    Eval.gains(scored, col("score"), col("pos"), col("vec_id"), nTiles = 10)
      .select(col("tile").cast("long").as("tile"), col("n"), col("pos"),
        col("cum_pos"), round(col("capture"), 6).as("capture"),
        round(col("lift"), 6).as("lift"))
      .orderBy("tile")
  }

  // ---- E-132 split-conformal prediction interval ----------------------------------
  // Distribution-free error bars for the E-113 OLS fit: train on folds
  // 1–4, take the ⌈0.95·(n+1)⌉-th smallest absolute residual on fold 0
  // (integer ceil — (19(n+1)+19) div 20) as the interval half-width.
  // Residuals are ROUNDED to 4 before ranking so the positional cut
  // never rides on sub-ulp float noise; the quantile pick is a window
  // over the calibration fold (a 1/5 sample of the analysis frame —
  // at corpus scale the same rank comes from a residual histogram).
  def extConformal(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(
        (col("l_orderkey") * 10 + col("l_linenumber")).cast("long").as("k"),
        cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("y"),
        col("l_quantity").cast("long").as("x1"),
        round(col("l_discount") * 100).cast("long").as("x2"))
      .withColumn("fold", Sampling.foldAssign(col("k"), 5))
    val fit = Stats.ols2(li.filter(col("fold") =!= 0),
        col("y"), col("x1"), col("x2"))
      .select(col("n").as("n_fit"), col("b0"), col("b1"), col("b2"))
    val cal = li.filter(col("fold") === 0).crossJoin(broadcast(fit))
      .withColumn("resid", round(
        abs(col("y") - (col("b0") + col("b1") * col("x1") +
          col("b2") * col("x2"))), 4))
    val ranked = cal.select(col("resid"), col("k"))
      .withColumn("rn", row_number().over(Window.orderBy("resid", "k")))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy()))
    val qhat = ranked
      .filter(col("rn") === least(
        (((col("cnt") + 1) * 19 + 19) / 20).cast("long"), col("cnt")))
      .select(col("resid").as("qhat"), col("cnt").as("n_cal"))
      .limit(1) // rn-equality matches exactly one row; structural cap
    cal.crossJoin(broadcast(qhat))
      .agg(max("n_fit").as("n_fit"), max("n_cal").as("n_cal"),
        max("qhat").as("qhat"),
        (sum(when(col("resid") <= col("qhat"), 1L).otherwise(0L))
          .cast("double") / max("n_cal")).as("coverage"))
      .select(col("n_fit"), col("n_cal"), col("qhat"),
        round(col("coverage"), 6).as("coverage"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_hits" -> (extHits _),
    "ext_interval_join" -> (extIntervalJoin _),
    "ext_profile" -> (extProfile _),
    "ext_gains" -> (extGains _),
    "ext_conformal" -> (extConformal _))

  val oracleSql: Map[String, String] = Map(
    // E-128: 2 unrolled iterations; every intermediate is an integer
    // in a double, so no FP-order sensitivity exists.
    "ext_hits" ->
      """with pairs as (select distinct 'S' || l_suppkey src, 'P' || l_partkey dst
        |  from lineitem),
        |nodes as (select src id from pairs union select dst from pairs),
        |a1 as (select dst, cast(count(*) as double) a from pairs group by dst),
        |h1 as (select src, sum(a1.a) h from pairs join a1 using (dst) group by src),
        |a2 as (select dst, sum(h1.h) a from pairs join h1 using (src) group by dst),
        |h2 as (select src, sum(a2.a) h from pairs join a2 using (dst) group by src)
        |select n.id, round(coalesce(h2.h, 0), 4) hub,
        |  round(coalesce(a2.a, 0), 4) auth
        |from nodes n left join h2 on h2.src = n.id
        |  left join a2 on a2.dst = n.id
        |order by hub desc, auth desc, id limit 20""".stripMargin,

    // E-129: the naive within-block range join IS the spec the bucket
    // registration must reproduce.
    "ext_interval_join" ->
      """with e as (select event_id id, user_id u,
        |    cast(floor(epoch(ts)) as bigint) s,
        |    cast(floor(epoch(ts)) as bigint) + cast(floor(value * 60) as bigint) e
        |  from events where user_id <= 50)
        |select a.u blk, a.id id_a, b.id id_b,
        |  least(a.e, b.e) - greatest(a.s, b.s) + 1 overlap
        |from e a join e b on a.u = b.u and a.id < b.id
        |  and a.s <= b.e and b.s <= a.e
        |order by blk, id_a, id_b""".stripMargin,

    // E-130: identical string casts (integer decimal, ISO date).
    "ext_profile" ->
      """with o as (select cast(o_custkey as varchar) c1, o_orderstatus c2,
        |    o_orderpriority c3, cast(cast(o_orderdate as date) as varchar) c4
        |  from orders)
        |select * from (
        |select 'o_custkey' col_name, cast(count(*) as bigint) n_rows,
        |  cast(count(c1) as bigint) non_null,
        |  cast(count(*) - count(c1) as bigint) n_nulls,
        |  cast(count(distinct c1) as bigint) n_distinct,
        |  min(c1) min_str, max(c1) max_str from o
        |union all
        |select 'o_orderstatus', cast(count(*) as bigint),
        |  cast(count(c2) as bigint), cast(count(*) - count(c2) as bigint),
        |  cast(count(distinct c2) as bigint), min(c2), max(c2) from o
        |union all
        |select 'o_orderpriority', cast(count(*) as bigint),
        |  cast(count(c3) as bigint), cast(count(*) - count(c3) as bigint),
        |  cast(count(distinct c3) as bigint), min(c3), max(c3) from o
        |union all
        |select 'o_orderdate', cast(count(*) as bigint),
        |  cast(count(c4) as bigint), cast(count(*) - count(c4) as bigint),
        |  cast(count(distinct c4) as bigint), min(c4), max(c4) from o
        |) order by col_name""".stripMargin,

    // E-131: same centroid/cosine scored set as ext_auc; identical
    // positional ntile cut and cumulative/lift arithmetic.
    "ext_gains" ->
      """with c as (select i, avg(cast(embedding[i] as double)) m
        |  from embeddings, unnest(range(1, len(embedding) + 1)) u(i)
        |  where label = 0 group by i),
        |sc as (select vec_id, label = 0 pos,
        |    round(
        |      (select sum(cast(e.embedding[c.i] as double) * c.m) from c)
        |      / (sqrt(list_sum(list_transform(e.embedding,
        |           x -> cast(x as double) * x)))
        |         * (select sqrt(sum(m * m)) from c)), 6) score
        |  from embeddings e),
        |tl as (select pos, ntile(10) over (order by score desc, vec_id) as tile
        |  from sc),
        |g as (select tile, cast(count(*) as bigint) n,
        |    cast(sum(case when pos then 1 else 0 end) as bigint) pos
        |  from tl group by tile),
        |f as (select tile, n, pos,
        |    cast(sum(pos) over (order by tile
        |      rows between unbounded preceding and current row) as bigint) as cum_pos,
        |    cast(sum(pos) over () as bigint) as tot_pos,
        |    cast(sum(n) over () as bigint) as tot_n
        |  from g)
        |select cast(tile as bigint) tile, n, pos, cum_pos,
        |  round(cum_pos / cast(tot_pos as double), 6) as capture,
        |  round((pos / cast(n as double))
        |    / (tot_pos / cast(tot_n as double)), 6) as lift
        |from f order by tile""".stripMargin,

    // E-132: the ols2 oracle's centered-moment solve on folds 1–4,
    // identical rounded-residual positional cut on fold 0.
    "ext_conformal" ->
      """with li as (select l_orderkey * 10 + l_linenumber k,
        |    cast(round(l_extendedprice * (1.0 - l_discount) * 100, 0) as bigint) y,
        |    cast(l_quantity as bigint) x1,
        |    cast(round(l_discount * 100, 0) as bigint) x2,
        |    ('0x' || substr(sha256(cast(l_orderkey * 10 + l_linenumber
        |      as varchar)), 1, 4))::int % 5 fold
        |  from lineitem),
        |a as (select cast(count(*) as double) n,
        |    cast(sum(x1) as double) s1, cast(sum(x2) as double) s2,
        |    cast(sum(y) as double) sy,
        |    cast(sum(x1 * x1) as double) s11, cast(sum(x2 * x2) as double) s22,
        |    cast(sum(x1 * x2) as double) s12, cast(sum(x1 * y) as double) s1y,
        |    cast(sum(x2 * y) as double) s2y
        |  from li where fold <> 0),
        |m as (select n, s1 / n m1, s2 / n m2, sy / n my,
        |    s11, s22, s12, s1y, s2y from a),
        |c as (select n, m1, m2, my,
        |    s11 - n * m1 * m1 c11, s22 - n * m2 * m2 c22,
        |    s12 - n * m1 * m2 c12, s1y - n * m1 * my c1y,
        |    s2y - n * m2 * my c2y
        |  from m),
        |b as (select n, m1, m2, my,
        |    (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) b1,
        |    (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) b2
        |  from c),
        |bb as (select n, my - b1 * m1 - b2 * m2 b0, b1, b2 from b),
        |cal as (select li.k,
        |    round(abs(li.y - (bb.b0 + bb.b1 * li.x1 + bb.b2 * li.x2)), 4) resid
        |  from li cross join bb where li.fold = 0),
        |rk as (select resid, row_number() over (order by resid, k) as rn,
        |    count(*) over () as cnt
        |  from cal),
        |q as (select resid qhat, cnt n_cal from rk
        |  where rn = least(((cnt + 1) * 19 + 19) // 20, cnt))
        |select (select cast(n as bigint) from bb) n_fit,
        |  cast(q.n_cal as bigint) n_cal, q.qhat,
        |  round(sum(case when cal.resid <= q.qhat then 1 else 0 end)
        |    / cast(q.n_cal as double), 6) coverage
        |from cal cross join q
        |group by q.n_cal, q.qhat""".stripMargin)
}
