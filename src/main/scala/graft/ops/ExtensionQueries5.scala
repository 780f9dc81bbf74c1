package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-4 extension queries, batch 5: the exact-similarity and
  * uncertainty family — prefix-filtered exact set-similarity join
  * ([[PrefixJoin]], the deterministic complement to MinHash),
  * sorted-neighborhood entity-resolution blocking ([[Blocking]]),
  * deterministic Poisson-bootstrap confidence intervals
  * ([[Stats.bootstrapMeanCI]]), the Benford first-digit fraud screen
  * ([[Audit.benford]]), and score-calibration bins
  * ([[Eval.calibration]]).
  */
object ExtensionQueries5 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  // ---- E-123 prefix-filtered exact set-similarity join ------------------------
  // Every document pair with token-Jaccard ≥ 0.8, EXACTLY (no banding
  // miss probability) — candidates only where prefixes of rarest
  // tokens collide; the τ compare is integer cross-multiplication so
  // the 0.8 boundary never sits on a float.
  // Contract output is the top-1000 pairs by (jaccard desc, ids): the
  // fixtures' 30-word vocabulary makes the TRUE τ=0.8 pair set itself
  // ~3M rows at sf0.1, so an unbounded dump would spend 100+ s just
  // materializing the answer — the cap bounds the result (and plans as
  // TakeOrderedAndProject) while the all-pairs oracle still proves the
  // prefix+positional prune exact on every surviving pair.
  def extPrefixJoin(s: SparkSession, dir: String): DataFrame =
    PrefixJoin.selfJoin(t(s, dir, "documents"), "doc_id",
        Dedup.tokenSet(col("text")), num = 4, den = 5)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(desc("jaccard"), asc("id_a"), asc("id_b"))
      .limit(1000)

  // ---- E-124 sorted-neighborhood ER blocking ----------------------------------
  // Part names sorted within coarse brand blocks, each compared to its
  // 3 successors, verified at Jaro-Winkler ≥ 0.9 (rounded before the
  // threshold, same discipline as ext_jaro). Catches near-identical
  // names that ext_jaro's first-token equality blocks would separate.
  def extSnm(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Blocking.sortedNeighborhood(t(s, dir, "part"), col("p_brand"),
        col("p_name"), col("p_partkey"), w = 4)
      .withColumn("jw",
        round(call_function("jaro_winkler", col("key_a"), col("key_b")), 4))
      .filter(col("jw") >= 0.9)
      .select(col("id_a"), col("id_b"), col("jw"))
      .orderBy("id_a", "id_b")
  }

  // ---- E-125 Poisson bootstrap CI ---------------------------------------------
  // 95% interval for the mean customer balance from 200 deterministic
  // hash-seeded resamples. Cents fixed-point; the interval endpoints
  // are positional picks over the 200 resample means.
  def extBootstrap(s: SparkSession, dir: String): DataFrame =
    Stats.bootstrapMeanCI(
        t(s, dir, "customer").select(col("c_custkey"), cents(col("c_acctbal")).as("v")),
        col("c_custkey"), col("v"), b = 200, alpha = 0.025)
      .select(col("reps"), round(col("mean"), 4).as("mean"),
        round(col("ci_lo"), 4).as("ci_lo"), round(col("ci_hi"), 4).as("ci_hi"))

  // ---- E-126 Benford first-digit audit ----------------------------------------
  // First digit of order totals (in cents — digit extraction from the
  // DECIMAL STRING, no float log boundary) vs the Benford law shares,
  // with the Pearson chi-square as a constant column.
  def extBenford(s: SparkSession, dir: String): DataFrame =
    Audit.benford(t(s, dir, "orders"), cents(col("o_totalprice")))
      .select(col("digit"), col("n"), round(col("share"), 6).as("share"),
        round(col("expected"), 6).as("expected"),
        round(col("chi2"), 4).as("chi2"))
      .orderBy("digit")

  // ---- E-127 score calibration bins --------------------------------------------
  // Reliability diagram of the ext_auc scored set (cosine to the
  // label-0 centroid): per-bin positive rate vs mean score, plus the
  // expected calibration error. Mean scores sum fixed-point longs.
  def extCalibration(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = t(s, dir, "embeddings")
    val centroid = e.filter(col("label") === 0)
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("pos").agg(avg("v").as("m"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("c"))
    val scored = e.crossJoin(broadcast(centroid))
      .select(round(call_function("cosine_sim", col("embedding"), col("c")), 6)
          .as("score"),
        (col("label") === 0).as("pos"))
    Eval.calibration(scored, col("score"), col("pos"), nBins = 8)
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("pos_rate"), 6).as("pos_rate"),
        round(col("mean_score"), 6).as("mean_score"),
        round(col("ece"), 6).as("ece"))
      .orderBy("bin")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_prefix_join" -> (extPrefixJoin _),
    "ext_snm" -> (extSnm _),
    "ext_bootstrap" -> (extBootstrap _),
    "ext_benford" -> (extBenford _),
    "ext_calibration" -> (extCalibration _))

  val oracleSql: Map[String, String] = Map(
    // E-123: the exact all-pairs formulation IS the spec the prefix
    // filter must reproduce; integer cross-multiplied τ boundary.
    "ext_prefix_join" ->
      """with d as (select doc_id,
        |    list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) s
        |  from documents),
        |p as (select a.doc_id id_a, b.doc_id id_b,
        |    cast(len(list_intersect(a.s, b.s)) as bigint) i,
        |    cast(len(list_distinct(list_concat(a.s, b.s))) as bigint) u
        |  from d a join d b on a.doc_id < b.doc_id)
        |select id_a, id_b, round(cast(i as double) / u, 4) jaccard
        |from p where i * 5 >= u * 4
        |order by jaccard desc, id_a, id_b limit 1000""".stripMargin,

    // E-124: identical rank windows + offset pairing; DuckDB's
    // jaro_winkler_similarity is the same classic variant (ext_jaro).
    "ext_snm" ->
      """with r as (select p_partkey id, p_name nm, p_brand blk,
        |    row_number() over (partition by p_brand
        |      order by p_name, p_partkey) rn
        |  from part),
        |c as (select a.id id_a, b.id id_b, a.nm na, b.nm nb
        |  from r a join r b on a.blk = b.blk
        |    and b.rn between a.rn + 1 and a.rn + 3)
        |select id_a, id_b, round(jaro_winkler_similarity(na, nb), 4) jw
        |from c where round(jaro_winkler_similarity(na, nb), 4) >= 0.9
        |order by id_a, id_b""".stripMargin,

    // E-125: identical sha256-seeded Poisson multiplicities (first 32
    // hash bits / 2^32 against the exact Poisson(1) CDF literals),
    // identical positional percentile picks.
    "ext_bootstrap" ->
      """with rows_ as (select cast(c_custkey as varchar) k,
        |    cast(round(c_acctbal * 100, 0) as bigint) v from customer),
        |reps as (select k, v, b from rows_, range(200) t(b)),
        |m as (select b, v,
        |    cast(('0x' || substr(sha256(k || ':' || cast(b as varchar)),
        |      1, 8))::bigint as double) / 4294967296.0 u
        |  from reps),
        |mm as (select b, v, case
        |    when u < 0.36787944117144233 then 0
        |    when u < 0.7357588823428847 then 1
        |    when u < 0.9196986029286058 then 2
        |    when u < 0.9810118431238462 then 3
        |    when u < 0.9963401531726563 then 4
        |    when u < 0.9994058151824183 then 5
        |    when u < 0.9999167588507119 then 6
        |    else 7 end mlt
        |  from m),
        |ag as (select b, cast(sum(mlt) as bigint) n,
        |    cast(sum(mlt * v) as bigint) s from mm group by b),
        |rk as (select cast(s as double) / n mean_b,
        |    row_number() over (order by cast(s as double) / n, b) r from ag),
        |f as (select cast(sum(v) as double) / count(*) mean from rows_)
        |select cast(200 as bigint) reps, round(mean, 4) mean,
        |  round(sum(case when r = 5 then mean_b end), 4) ci_lo,
        |  round(sum(case when r = 195 then mean_b end), 4) ci_hi
        |from f cross join rk group by mean""".stripMargin,

    // E-126: digit from the decimal string of exact cents; expected =
    // log10(1 + 1/d); chi2 = N·Σ(share−exp)²/exp over ALL 9 digits —
    // the 1–9 spine keeps absent digits' N·p_d terms in the statistic,
    // mirroring Audit.benford's spine join.
    "ext_benford" ->
      """with d as (select cast(substr(cast(cast(round(o_totalprice * 100, 0)
        |      as bigint) as varchar), 1, 1) as bigint) digit
        |  from orders where round(o_totalprice * 100, 0) > 0),
        |g0 as (select digit, cast(count(*) as bigint) n from d group by 1),
        |sp as (select unnest(range(1, 10)) digit),
        |g as (select sp.digit, cast(coalesce(g0.n, 0) as bigint) n
        |  from sp left join g0 using (digit)),
        |e as (select digit, n,
        |    n / cast(sum(n) over () as double) as share,
        |    log10(1 + 1.0 / digit) as expected,
        |    cast(sum(n) over () as double) as total
        |  from g)
        |select digit, n, round(share, 6) as share,
        |  round(expected, 6) as expected,
        |  round(sum(total * (share - expected) * (share - expected)
        |    / expected) over (), 4) as chi2
        |from e order by digit""".stripMargin,

    // E-127: same centroid/cosine scored set as ext_auc; bins over
    // [−1,1]; mean score from exact 1e6 fixed-point sums; ECE folds
    // the ≤8 bins.
    "ext_calibration" ->
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
        |b as (select greatest(least(cast(floor((score + 1.0) / 2.0 * 8)
        |      as bigint), 7), 0) bin,
        |    cast(round(score * 1000000, 0) as bigint) s6,
        |    case when pos then 1 else 0 end p
        |  from sc),
        |g as (select bin, cast(count(*) as bigint) n,
        |    cast(sum(p) as bigint) n_pos, cast(sum(s6) as bigint) ss6
        |  from b group by 1),
        |e as (select bin, n, n_pos,
        |    n_pos / cast(n as double) pos_rate,
        |    cast(ss6 as double) / n / 1000000.0 mean_score,
        |    n / cast(sum(n) over () as double) w
        |  from g)
        |select bin, n, n_pos, round(pos_rate, 6) pos_rate,
        |  round(mean_score, 6) mean_score,
        |  round(sum(w * abs(pos_rate - (mean_score + 1.0) / 2.0)) over (), 6) ece
        |from e order by bin""".stripMargin)
}
