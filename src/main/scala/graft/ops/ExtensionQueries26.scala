package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 26: distributed-systems plumbing —
  * pinned Bloom-filter FPR, consistent-hash ring placement, Merkle
  * bucket reconciliation, inverted-index statistics, and a
  * Simpson's-paradox screen on exact regression sums.
  */
object ExtensionQueries26 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def h60(c: org.apache.spark.sql.Column) =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  // ---- E-222 Bloom-filter FPR, pinned --------------------------------------------
  // m=1024 bits, k=4 salted portable hashes over supplier keys, probed
  // with customer keys NOT in the build set — the measured false-positive
  // rate both engines reproduce bit-for-bit (the E-178/E-191 sketch-pin
  // discipline), reported beside the n/m/k theoretical rate. Positive ⇔
  // every probe position is set: a min-flag aggregate over one equi join
  // on the bit position.
  def extBloomfpr(s: SparkSession, dir: String): DataFrame = {
    val rs = Seq(0, 1, 2, 3)
    def positions(keys: DataFrame, keyCol: String) = keys
      .select(col(keyCol).cast("string").as("k"))
      .select(col("k"), explode(array(rs.map(r =>
        pmod(h60(concat(lit(r.toString), lit("|"), col("k"))), lit(1024L))
          .as(s"p$r")): _*)).as("pos"))
    val build = t(s, dir, "supplier").select(col("s_suppkey"))
    val bits = positions(build, "s_suppkey").select("pos").distinct()
      .withColumn("hit", lit(1L))
    val probes = t(s, dir, "customer")
      .join(build, col("c_custkey") === col("s_suppkey"), "left_anti")
      .select(col("c_custkey"))
    val verdicts = positions(probes, "c_custkey")
      .join(broadcast(bits), Seq("pos"), "left")
      .groupBy("k")
      .agg(min(coalesce(col("hit"), lit(0L))).as("all_set"))
    val nb = build.agg(countDistinct("s_suppkey").as("n_build"))
    val bitCount = bits.agg(count(lit(1)).as("n_bits_set"))
    verdicts.agg(count(lit(1)).as("n_probe"),
        sum("all_set").as("n_false_pos"))
      .crossJoin(nb).crossJoin(bitCount)
      .select(col("n_build"), col("n_bits_set"), col("n_probe"),
        col("n_false_pos"),
        round(col("n_false_pos").cast("double") / col("n_probe"), 6)
          .as("fpr"),
        round(pow(lit(1.0) -
          pow(lit(1.0) - lit(1.0) / 1024.0, col("n_build") * 4), 4), 6)
          .as("fpr_theory"))
  }

  // ---- E-223 consistent-hash ring ------------------------------------------------
  // 16 shards × 8 virtual nodes on the 60-bit ring; every key owned by
  // the first vnode clockwise (min position ≥ key position, wrapping to
  // the ring minimum). Both engines derive identical placements from
  // the portable hash; the report is per-shard load + skew vs ideal —
  // the rebalance-friendly alternative to E-168's modulo sharding
  // (adding a shard moves ~1/17 of keys, not all of them). The ring is
  // a 128-row broadcast; ownership is one min-aggregate per key + one
  // equi join back on the winning position.
  def extConsistenthash(s: SparkSession, dir: String): DataFrame = {
    val vnodes = (0 until 16).flatMap(sh => (0 until 8).map(v => (sh, v)))
    val ring = s.createDataFrame(vnodes).toDF("shard", "vn")
      .select(col("shard").cast("long").as("shard"),
        h60(concat(col("shard").cast("string"), lit("#"),
          col("vn").cast("string"))).as("vpos"))
    val ringMin = ring.agg(min("vpos").as("wrap_pos"))
    val keys = t(s, dir, "customer")
      .select(h60(col("c_custkey").cast("string")).as("kpos"))
    val owner = keys.crossJoin(broadcast(ring))
      .groupBy("kpos")
      .agg(min(when(col("vpos") >= col("kpos"), col("vpos"))).as("nxt"))
      .crossJoin(broadcast(ringMin))
      .select(coalesce(col("nxt"), col("wrap_pos")).as("vpos"))
      .join(broadcast(ring), "vpos")
    val loads = owner.groupBy("shard").agg(count(lit(1)).as("n_keys"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    loads
      .withColumn("total", sum("n_keys").over(wAll))
      .select(col("shard"), col("n_keys"),
        round(col("n_keys").cast("double") * 16 / col("total"), 4)
          .as("load_vs_ideal"))
      .orderBy("shard")
  }

  // ---- E-224 Merkle bucket reconciliation ----------------------------------------
  // Locate WHERE two table versions differ without comparing rows:
  // 16 hash buckets, digest = bit_xor of the portable row hash —
  // order-independent, mergeable, exact. Version B is version A with
  // every 500th customer's balance bumped; only the buckets holding
  // those keys may flag. At 100 TB this is the shape that reconciles
  // replicas by exchanging 16 digests instead of the table (E-119
  // tablediff then drills into the flagged buckets only).
  def extMerkle(s: SparkSession, dir: String): DataFrame = {
    def digest(df: DataFrame, suffix: String) = df
      .select(pmod(h60(col("c_custkey").cast("string")), lit(16L)).as("bucket"),
        h60(concat_ws("|", col("c_custkey"), col("c_nationkey"),
          col("c_mktsegment"), col("balc"))).as("rh"))
      .groupBy("bucket")
      .agg(count(lit(1)).as(s"n_$suffix"),
        expr("bit_xor(rh)").as(s"digest_$suffix"))
    val a = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long").as("balc"))
    val b = a.withColumn("balc",
      when(col("c_custkey") % 500 === 0, col("balc") + 1).otherwise(col("balc")))
    digest(a, "a").join(digest(b, "b"), "bucket")
      .select(col("bucket"), col("n_a"), col("n_b"),
        (col("digest_a") =!= col("digest_b")).as("differs"))
      .orderBy("bucket")
  }

  // ---- E-225 inverted-index statistics -------------------------------------------
  // Posting-list profile of the corpus index: vocabulary size, median
  // and max document frequency, singleton share, total postings — the
  // stats an index planner sizes bands and df-caps from (the
  // SparseCosine dfCap discipline, measured).
  def extInvstats(s: SparkSession, dir: String): DataFrame = {
    val df = t(s, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(filter(split(col("text"), " "),
          x => x =!= ""))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("dfreq"))
    df.agg(count(lit(1)).as("vocab"),
        sum("dfreq").as("total_postings"),
        round(expr("percentile(dfreq, 0.5)"), 4).as("p50_df"),
        max("dfreq").as("max_df"),
        sum(when(col("dfreq") === 1, 1L).otherwise(0L)).as("n_singletons"))
      .withColumn("singleton_share",
        round(col("n_singletons").cast("double") / col("vocab"), 6))
  }

  // ---- E-226 Simpson's-paradox screen --------------------------------------------
  // Does the discount→quantity slope flip sign inside brands vs the
  // pooled fit? Slopes computed from EXACT integer sums (basis-point
  // discounts × integral quantities, decimal(38,0)/HUGEINT Σx Σy Σxy
  // Σx²) — the aggregation-bias audit, numerically settled where a
  // streaming regr_slope fold would not pin near zero.
  def extSimpson(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "lineitem").join(t(s, dir, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        round(col("l_discount") * 10000).cast("long").cast("decimal(38,0)")
          .as("x"),
        col("l_quantity").cast("long").cast("decimal(38,0)").as("y"))
    def slope(grouped: DataFrame) = grouped
      .withColumn("slope",
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
    val per = slope(base.groupBy("brand")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx")))
    val overall = slope(base.groupBy()
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx")))
      .select(col("slope").as("pooled"))
    per.crossJoin(overall)
      .agg(max(round(col("pooled"), 6)).as("pooled_slope"),
        count(lit(1)).as("n_groups"),
        sum(when(signum(col("slope")) =!= signum(col("pooled")), 1L)
          .otherwise(0L)).as("n_opposite"))
      .withColumn("opposite_share",
        round(col("n_opposite").cast("double") / col("n_groups"), 4))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_bloomfpr" -> (extBloomfpr _),
    "ext_consistenthash" -> (extConsistenthash _),
    "ext_merkle" -> (extMerkle _),
    "ext_invstats" -> (extInvstats _),
    "ext_simpson" -> (extSimpson _))

  val oracleSql: Map[String, String] = Map(
    "ext_bloomfpr" ->
      """with build as (select distinct s_suppkey from supplier),
        |bpos as (select distinct
        |    ('0x' || substr(sha256(cast(r as varchar) || '|'
        |      || cast(s_suppkey as varchar)), 1, 15))::bigint % 1024 pos
        |  from build, unnest([0, 1, 2, 3]) u(r)),
        |probes as (select c_custkey from customer
        |  where c_custkey not in (select s_suppkey from build)),
        |pp as (select c_custkey k,
        |    ('0x' || substr(sha256(cast(r as varchar) || '|'
        |      || cast(c_custkey as varchar)), 1, 15))::bigint % 1024 pos
        |  from probes, unnest([0, 1, 2, 3]) u(r)),
        |verd as (select k,
        |    min(case when bpos.pos is not null then 1 else 0 end) all_set
        |  from pp left join bpos using (pos) group by k),
        |agg as (select cast(count(*) as bigint) n_probe,
        |    cast(sum(all_set) as bigint) n_false_pos from verd),
        |nb as (select cast(count(*) as bigint) n_build from build),
        |bc as (select cast(count(*) as bigint) n_bits_set from bpos)
        |select n_build, n_bits_set, n_probe, n_false_pos,
        |  round(cast(n_false_pos as double) / n_probe, 6) fpr,
        |  round(pow(1.0 - pow(1.0 - 1.0 / 1024.0, n_build * 4), 4), 6)
        |    fpr_theory
        |from agg cross join nb cross join bc""".stripMargin,

    "ext_consistenthash" ->
      """with ring as (select cast(shard as bigint) shard,
        |    ('0x' || substr(sha256(cast(shard as varchar) || '#'
        |      || cast(vn as varchar)), 1, 15))::bigint vpos
        |  from unnest([0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15]) s(shard),
        |    unnest([0,1,2,3,4,5,6,7]) v(vn)),
        |rmin as (select min(vpos) wrap_pos from ring),
        |keys as (select
        |    ('0x' || substr(sha256(cast(c_custkey as varchar)), 1, 15))::bigint
        |      kpos from customer),
        |own as (select kpos,
        |    min(case when vpos >= kpos then vpos end) nxt
        |  from keys cross join ring group by kpos),
        |assigned as (select ring.shard
        |  from own cross join rmin
        |  join ring on ring.vpos = coalesce(own.nxt, rmin.wrap_pos)),
        |loads as (select shard, cast(count(*) as bigint) n_keys
        |  from assigned group by 1)
        |select shard, n_keys,
        |  round(cast(n_keys as double) * 16 / sum(n_keys) over (), 4)
        |    load_vs_ideal
        |from loads order by shard""".stripMargin,

    "ext_merkle" ->
      """with a as (select c_custkey, c_nationkey, c_mktsegment,
        |    cast(round(c_acctbal * 100) as bigint) balc from customer),
        |b as (select c_custkey, c_nationkey, c_mktsegment,
        |    case when c_custkey % 500 = 0 then balc + 1 else balc end balc
        |  from a),
        |da as (select
        |    ('0x' || substr(sha256(cast(c_custkey as varchar)), 1, 15))::bigint
        |      % 16 bucket,
        |    cast(count(*) as bigint) n_a,
        |    bit_xor(('0x' || substr(sha256(cast(c_custkey as varchar) || '|'
        |      || cast(c_nationkey as varchar) || '|' || c_mktsegment || '|'
        |      || cast(balc as varchar)), 1, 15))::bigint) digest_a
        |  from a group by 1),
        |db as (select
        |    ('0x' || substr(sha256(cast(c_custkey as varchar)), 1, 15))::bigint
        |      % 16 bucket,
        |    cast(count(*) as bigint) n_b,
        |    bit_xor(('0x' || substr(sha256(cast(c_custkey as varchar) || '|'
        |      || cast(c_nationkey as varchar) || '|' || c_mktsegment || '|'
        |      || cast(balc as varchar)), 1, 15))::bigint) digest_b
        |  from b group by 1)
        |select bucket, n_a, n_b, digest_a <> digest_b differs
        |from da join db using (bucket) order by bucket""".stripMargin,

    "ext_invstats" ->
      """with df as (select tok, cast(count(*) as bigint) dfreq from (
        |    select doc_id, unnest(list_distinct(list_filter(
        |      string_split(text, ' '), w -> w <> ''))) tok from documents)
        |  group by tok)
        |select cast(count(*) as bigint) vocab,
        |  cast(sum(dfreq) as bigint) total_postings,
        |  round(quantile_cont(dfreq, 0.5), 4) p50_df,
        |  cast(max(dfreq) as bigint) max_df,
        |  cast(sum(case when dfreq = 1 then 1 else 0 end) as bigint)
        |    n_singletons,
        |  round(cast(sum(case when dfreq = 1 then 1 else 0 end) as double)
        |    / count(*), 6) singleton_share
        |from df""".stripMargin,

    "ext_simpson" ->
      """with base as (select p_brand brand,
        |    cast(cast(round(l_discount * 10000) as bigint) as hugeint) x,
        |    cast(cast(l_quantity as bigint) as hugeint) y
        |  from lineitem join part on l_partkey = p_partkey),
        |per as (select brand, cast(count(*) as bigint) n, sum(x) sx,
        |    sum(y) sy, sum(x * y) sxy, sum(x * x) sxx
        |  from base group by 1),
        |ps as (select brand,
        |    cast(n * sxy - sx * sy as double)
        |      / cast(n * sxx - sx * sx as double) slope from per),
        |o as (select cast(count(*) as bigint) n, sum(x) sx, sum(y) sy,
        |    sum(x * y) sxy, sum(x * x) sxx from base),
        |os as (select cast(n * sxy - sx * sy as double)
        |    / cast(n * sxx - sx * sx as double) pooled from o)
        |select max(round(pooled, 6)) pooled_slope,
        |  cast(count(*) as bigint) n_groups,
        |  cast(sum(case when sign(slope) <> sign(pooled) then 1 else 0 end)
        |    as bigint) n_opposite,
        |  round(cast(sum(case when sign(slope) <> sign(pooled) then 1 else 0
        |    end) as double) / count(*), 4) opposite_share
        |from ps cross join os""".stripMargin)
}
