package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 29: data-quality II — t-closeness
  * (the distributional privacy audit k-anonymity E-53 / l-diversity
  * E-120 don't cover), null-rate drift between table versions,
  * candidate-key discovery, and KMV sketch set-algebra (union /
  * intersection estimates, extending the E-178 cardinality pin).
  */
object ExtensionQueries29 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def h60(c: org.apache.spark.sql.Column) =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  // ---- E-235 t-closeness ---------------------------------------------------------
  // Privacy audit level 3: within each quasi-identifier group
  // (nation × segment), how far is the SENSITIVE-attribute distribution
  // (2000-dollar balance buckets) from the global one? k-anonymity
  // bounds group size, l-diversity bounds distinct values — t-closeness
  // bounds the DISTRIBUTION gap, catching groups that are diverse but
  // skewed. Distance = total variation, computed EXACTLY:
  // TVD = Σ|c_i·N − C_i·n_g| / (2·n_g·N) — the numerator is an integer
  // sum (cross-multiplied, no per-bucket ratios), one settled division
  // at the end. The bucket spine is a ≤10-row broadcast per group.
  def extTclose(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"),
        // floor (not truncating) division — balances go negative, and
        // DuckDB's integer `//` truncates toward zero, so both sides
        // compute the bucket as an explicit floor over the exact cents.
        floor(round(col("c_acctbal") * 100).cast("long") / lit(200000.0))
          .cast("long").as("b"))
    val global = c.groupBy("b").agg(count(lit(1)).as("cg"))
      // acctbal in [-999.99, 9999.99] => <=7 buckets; structural cap,
      // ordered so a broken bucket-domain assumption is deterministic
      .orderBy("b").limit(16)
    val n = c.agg(count(lit(1)).as("n_all"))
    val groups = c.groupBy("nk", "seg").agg(count(lit(1)).as("ng"))
    val cells = c.groupBy("nk", "seg", "b").agg(count(lit(1)).as("ci"))
    val spine = groups.crossJoin(broadcast(global))
      .join(cells, Seq("nk", "seg", "b"), "left")
      .withColumn("ci", coalesce(col("ci"), lit(0L)))
    spine.crossJoin(broadcast(n))
      .groupBy("nk", "seg")
      .agg(max("ng").as("n_g"),
        round(sum(abs(col("ci") * col("n_all") - col("cg") * col("ng")))
          .cast("double") /
          (lit(2.0) * max("ng") * max("n_all")), 6).as("tvd"))
      .join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("nk"), col("n_name"))), "nk")
      .select(col("n_name"), col("seg"), col("n_g"), col("tvd"),
        (col("tvd") > 0.3).as("violates_t03"))
      .orderBy(desc("tvd"), asc("n_name"), asc("seg")).limit(20)
  }

  // ---- E-236 null-rate drift -----------------------------------------------------
  // The load-regression monitor: per-column null rates of snapshot A vs
  // snapshot B (B = A with every 7th segment and every 13th balance
  // nulled — the synthetic-drift discipline of E-88/E-224). Counts are
  // exact integers; the delta is flagged by integer cross-multiply
  // (20·Δ > n ⇔ Δrate > 5%) so the verdict never rides a float.
  def extNulldrift(s: SparkSession, dir: String): DataFrame = {
    val a = t(s, dir, "customer")
    val b = a.select(col("c_custkey"), col("c_name"),
      when(col("c_custkey") % 7 === 0, lit(null)).otherwise(col("c_mktsegment"))
        .as("c_mktsegment"),
      when(col("c_custkey") % 13 === 0, lit(null)).otherwise(col("c_acctbal"))
        .as("c_acctbal"))
    def nulls(df: DataFrame, suffix: String) = df.agg(
      count(lit(1)).as(s"n_$suffix"),
      sum(when(col("c_name").isNull, 1L).otherwise(0L)).as(s"name_$suffix"),
      sum(when(col("c_mktsegment").isNull, 1L).otherwise(0L)).as(s"seg_$suffix"),
      sum(when(col("c_acctbal").isNull, 1L).otherwise(0L)).as(s"bal_$suffix"))
    val j = nulls(a, "a").crossJoin(nulls(b, "b"))
    val stacked = j.select(expr(
      """stack(3,
        |'c_name', name_a, name_b,
        |'c_mktsegment', seg_a, seg_b,
        |'c_acctbal', bal_a, bal_b) as (col_name, null_a, null_b)""".stripMargin),
      col("n_a"))
    stacked.select(col("col_name"), col("n_a").as("n_rows"),
        col("null_a"), col("null_b"),
        round(col("null_a").cast("double") / col("n_a"), 6).as("rate_a"),
        round(col("null_b").cast("double") / col("n_a"), 6).as("rate_b"),
        ((col("null_b") - col("null_a")) * 20 > col("n_a")).as("flagged"))
      .orderBy("col_name")
  }

  // ---- E-237 candidate-key discovery ---------------------------------------------
  // Which column (sets) uniquely identify an orders row? Uniqueness =
  // distinct/rows per candidate — single columns plus the
  // (custkey, orderdate) composite — all exact integer counts, the
  // profiling pass schema inference and PK migration start from.
  def extKeydisc(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    def cand(name: String, c: org.apache.spark.sql.Column) = o.agg(
      lit(name).as("candidate"), count(lit(1)).as("n_rows"),
      countDistinct(c).as("n_distinct"))
    cand("o_orderkey", col("o_orderkey"))
      .unionAll(cand("o_custkey", col("o_custkey")))
      .unionAll(cand("o_orderstatus", col("o_orderstatus")))
      .unionAll(cand("o_totalprice", col("o_totalprice")))
      .unionAll(cand("o_orderdate", col("o_orderdate")))
      .unionAll(cand("o_orderpriority", col("o_orderpriority")))
      .unionAll(cand("o_custkey+o_orderdate",
        concat_ws("|", col("o_custkey"), col("o_orderdate").cast("string"))))
      .select(col("candidate"), col("n_rows"), col("n_distinct"),
        (col("n_distinct") === col("n_rows")).as("is_key"),
        round(col("n_distinct").cast("double") / col("n_rows"), 6)
          .as("uniqueness"))
      .orderBy(desc("uniqueness"), asc("candidate"))
  }

  // ---- E-238 KMV set algebra -----------------------------------------------------
  // Sketch-level union/intersection: KMV(k=64) sketches of the 1995 and
  // 1996 customer sets are MERGED (k smallest of the combined hash
  // sets), the union cardinality is (k−1)/u_k of the merged sketch, the
  // Jaccard estimate is the share of merged-sketch hashes present in
  // BOTH input sketches, and intersection = ρ·Û. Every hash is the
  // portable sha256-60bit, so sketch contents — not just estimates —
  // pin bit-identically across engines (E-178 discipline); exact
  // cardinalities sit beside the estimates as the measured error.
  def extKmvset(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    def slice(yr: Int) = o.filter(year(col("o_orderdate")) === yr)
      .select(col("o_custkey")).distinct()
    def kmin(df: DataFrame) = df
      .select(h60(col("o_custkey").cast("string")).as("h"))
      .orderBy("h").limit(64)
    val ka = kmin(slice(1995)).withColumn("in_a", lit(1L))
    val kb = kmin(slice(1996)).withColumn("in_b", lit(1L))
    val merged = ka.join(kb, Seq("h"), "full")
      .select(col("h"), coalesce(col("in_a"), lit(0L)).as("in_a"),
        coalesce(col("in_b"), lit(0L)).as("in_b"))
      .orderBy("h").limit(64)
    val est = merged.agg(count(lit(1)).as("k"),
        (max("h").cast("double") / lit(1152921504606846976.0)).as("uk"),
        sum(col("in_a") * col("in_b")).as("n_both"))
      .select(col("k"), col("n_both"),
        round((col("k") - 1) / col("uk"), 4).as("est_union"),
        round(col("n_both").cast("double") / col("k"), 4).as("est_jaccard"),
        round(col("n_both").cast("double") / col("k") *
          ((col("k") - 1) / col("uk")), 4).as("est_intersect"))
    val ea = slice(1995).agg(count(lit(1)).as("exact_a"))
    val eb = slice(1996).agg(count(lit(1)).as("exact_b"))
    val ei = slice(1995).join(slice(1996), "o_custkey")
      .agg(count(lit(1)).as("exact_intersect"))
    ea.crossJoin(eb).crossJoin(ei).crossJoin(est)
      .select(col("exact_a"), col("exact_b"),
        (col("exact_a") + col("exact_b") - col("exact_intersect"))
          .as("exact_union"),
        col("exact_intersect"), col("k"), col("n_both"),
        col("est_union"), col("est_jaccard"), col("est_intersect"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_tclose" -> (extTclose _),
    "ext_nulldrift" -> (extNulldrift _),
    "ext_keydisc" -> (extKeydisc _),
    "ext_kmvset" -> (extKmvset _))

  val oracleSql: Map[String, String] = Map(
    // E-235: identical cross-multiplied integer TVD numerator.
    "ext_tclose" ->
      """with c as (select c_nationkey nk, c_mktsegment seg,
        |    cast(floor(cast(round(c_acctbal * 100) as bigint) / 200000.0)
        |      as bigint) b
        |  from customer),
        |global as (select b, cast(count(*) as bigint) cg from c group by b),
        |n as (select cast(count(*) as bigint) n_all from c),
        |groups as (select nk, seg, cast(count(*) as bigint) ng
        |  from c group by nk, seg),
        |cells as (select nk, seg, b, cast(count(*) as bigint) ci
        |  from c group by nk, seg, b),
        |spine as (select g.nk, g.seg, g.ng, gl.b, gl.cg,
        |    coalesce(ce.ci, 0) ci
        |  from groups g cross join global gl
        |  left join cells ce on ce.nk = g.nk and ce.seg = g.seg
        |    and ce.b = gl.b),
        |tv as (select nk, seg, max(ng) n_g,
        |    round(cast(sum(abs(ci * n_all - cg * ng)) as double)
        |      / (2.0 * max(ng) * max(n_all)), 6) tvd
        |  from spine cross join n group by nk, seg)
        |select n_name, seg, n_g, tvd, tvd > 0.3 violates_t03
        |from tv join nation on n_nationkey = nk
        |order by tvd desc, n_name, seg limit 20""".stripMargin,

    // E-236: same synthetic snapshot B; integer cross-multiplied flag.
    "ext_nulldrift" ->
      """with a as (select * from customer),
        |b as (select c_custkey, c_name,
        |    case when c_custkey % 7 = 0 then null else c_mktsegment end
        |      c_mktsegment,
        |    case when c_custkey % 13 = 0 then null else c_acctbal end
        |      c_acctbal
        |  from a),
        |na as (select cast(count(*) as bigint) n_a,
        |    cast(sum(case when c_name is null then 1 else 0 end) as bigint)
        |      name_a,
        |    cast(sum(case when c_mktsegment is null then 1 else 0 end)
        |      as bigint) seg_a,
        |    cast(sum(case when c_acctbal is null then 1 else 0 end)
        |      as bigint) bal_a from a),
        |nb as (select
        |    cast(sum(case when c_name is null then 1 else 0 end) as bigint)
        |      name_b,
        |    cast(sum(case when c_mktsegment is null then 1 else 0 end)
        |      as bigint) seg_b,
        |    cast(sum(case when c_acctbal is null then 1 else 0 end)
        |      as bigint) bal_b from b),
        |stacked as (
        |  select 'c_name' col_name, name_a null_a, name_b null_b, n_a
        |    from na cross join nb
        |  union all select 'c_mktsegment', seg_a, seg_b, n_a
        |    from na cross join nb
        |  union all select 'c_acctbal', bal_a, bal_b, n_a
        |    from na cross join nb)
        |select col_name, n_a n_rows, null_a, null_b,
        |  round(cast(null_a as double) / n_a, 6) rate_a,
        |  round(cast(null_b as double) / n_a, 6) rate_b,
        |  (null_b - null_a) * 20 > n_a flagged
        |from stacked order by col_name""".stripMargin,

    // E-237: composite candidate via the same '|' concatenation.
    "ext_keydisc" ->
      """with cands as (
        |  select 'o_orderkey' candidate, cast(count(*) as bigint) n_rows,
        |    cast(count(distinct o_orderkey) as bigint) n_distinct from orders
        |  union all select 'o_custkey', count(*),
        |    count(distinct o_custkey) from orders
        |  union all select 'o_orderstatus', count(*),
        |    count(distinct o_orderstatus) from orders
        |  union all select 'o_totalprice', count(*),
        |    count(distinct o_totalprice) from orders
        |  union all select 'o_orderdate', count(*),
        |    count(distinct o_orderdate) from orders
        |  union all select 'o_orderpriority', count(*),
        |    count(distinct o_orderpriority) from orders
        |  union all select 'o_custkey+o_orderdate', count(*),
        |    count(distinct cast(o_custkey as varchar) || '|'
        |      || strftime(o_orderdate, '%Y-%m-%d')) from orders)
        |select candidate, n_rows, n_distinct,
        |  n_distinct = n_rows is_key,
        |  round(cast(n_distinct as double) / n_rows, 6) uniqueness
        |from cands order by uniqueness desc, candidate""".stripMargin,

    // E-238: identical portable-hash sketches, merged k-min, and
    // estimate expressions; exact sets beside.
    "ext_kmvset" ->
      """with sa as (select distinct o_custkey from orders
        |  where year(o_orderdate) = 1995),
        |sb as (select distinct o_custkey from orders
        |  where year(o_orderdate) = 1996),
        |ka as (select ('0x' || substr(sha256(cast(o_custkey as varchar)),
        |    1, 15))::bigint h from sa order by h limit 64),
        |kb as (select ('0x' || substr(sha256(cast(o_custkey as varchar)),
        |    1, 15))::bigint h from sb order by h limit 64),
        |merged as (select coalesce(ka.h, kb.h) h,
        |    case when ka.h is not null then 1 else 0 end in_a,
        |    case when kb.h is not null then 1 else 0 end in_b
        |  from ka full join kb on ka.h = kb.h
        |  order by 1 limit 64),
        |est as (select cast(count(*) as bigint) k,
        |    cast(max(h) as double) / 1152921504606846976.0 uk,
        |    cast(sum(in_a * in_b) as bigint) n_both from merged),
        |ea as (select cast(count(*) as bigint) exact_a from sa),
        |eb as (select cast(count(*) as bigint) exact_b from sb),
        |ei as (select cast(count(*) as bigint) exact_intersect
        |  from sa join sb using (o_custkey))
        |select exact_a, exact_b,
        |  exact_a + exact_b - exact_intersect exact_union,
        |  exact_intersect, k, n_both,
        |  round((k - 1) / uk, 4) est_union,
        |  round(cast(n_both as double) / k, 4) est_jaccard,
        |  round(cast(n_both as double) / k * ((k - 1) / uk), 4)
        |    est_intersect
        |from ea cross join eb cross join ei cross join est""".stripMargin)
}
