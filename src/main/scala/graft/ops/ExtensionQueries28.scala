package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 28: retrieval-evaluation II and
  * multiple-testing control — MRR/hit-rate, the precision/recall@k
  * curve, rank-biased overlap between two rankings, and a
  * Benjamini–Hochberg FDR pass over per-nation mean tests. Completes
  * the eval family (recall E-25, confusion E-44, AUC E-66, NDCG E-67,
  * calibration E-127, gains E-131).
  */
object ExtensionQueries28 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** The E-67 probe-retrieval frame: every (probe, candidate) scored by
    * ROUNDED cosine and ranked under (cos desc, vec_id) — ranks are
    * identical on both engines because ties settle on the integer id.
    * Probes are the `vec_id % 97` slice; the probe side is broadcast,
    * so the scan stays a single narrow pass over embeddings.
    */
  private def rankedRetrieval(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = t(s, dir, "embeddings")
    val probes = e.filter(col("vec_id") % 97 === 0)
      .orderBy("vec_id").limit(128) // deterministic probe cap: first 128 by
      // vec_id (>= the slice size at every gated SF, so results are
      // unchanged there); at corpus scale this bounds the broadcast side
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
        col("label").as("plabel"))
    val w = Window.partitionBy("probe_id").orderBy(desc("cos"), asc("vec_id"))
    e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(call_function("cosine_sim", col("embedding"), col("pv")), 4)
          .as("cos"),
        when(col("label") === col("plabel"), 1L).otherwise(0L).as("rel"))
      .withColumn("rk", row_number().over(w).cast("long"))
  }

  // ---- E-231 mean reciprocal rank + hit rates ------------------------------------
  // Where does the FIRST relevant neighbor land? MRR = mean 1/rank of
  // the first same-label hit (0 for probes with none), plus hit@1/5/10
  // counts — the single-number retrieval summary beside NDCG's graded
  // one. First-rank is an integer min per probe; only the final mean
  // is float (rounded).
  def extMrr(s: SparkSession, dir: String): DataFrame = {
    val ranked = rankedRetrieval(s, dir)
    val first = ranked.filter(col("rel") === 1L)
      .groupBy("probe_id").agg(min("rk").as("fr"))
    ranked.select("probe_id").distinct()
      .join(first, Seq("probe_id"), "left")
      .agg(count(lit(1)).as("n_probes"),
        round(avg(coalesce(lit(1.0) / col("fr"), lit(0.0))), 6).as("mrr"),
        sum(when(col("fr") <= 1, 1L).otherwise(0L)).as("hit1"),
        sum(when(col("fr") <= 5, 1L).otherwise(0L)).as("hit5"),
        sum(when(col("fr") <= 10, 1L).otherwise(0L)).as("hit10"))
  }

  // ---- E-232 precision/recall@k curve --------------------------------------------
  // Macro-averaged P@k and R@k at k ∈ {1,5,10,20}: hits@k are exact
  // integers per (probe, k) from one pass over the ranked frame crossed
  // with the 4-row k-spine; the averages are the only floats. Probes
  // with zero relevant candidates are excluded from recall (undefined)
  // but kept in precision — the standard macro convention.
  def extPreck(s: SparkSession, dir: String): DataFrame = {
    val ranked = rankedRetrieval(s, dir)
    val ks = s.range(0, 4).select(
      element_at(array(lit(1L), lit(5L), lit(10L), lit(20L)),
        (col("id") + 1).cast("int")).as("k"))
    val perProbe = ranked.crossJoin(broadcast(ks))
      .groupBy("probe_id", "k")
      .agg(sum(when(col("rk") <= col("k"), col("rel")).otherwise(0L))
          .as("hits"),
        sum("rel").as("n_rel"))
    perProbe.groupBy("k")
      .agg(count(lit(1)).as("n_probes"),
        round(avg(col("hits").cast("double") / col("k")), 6).as("p_at_k"),
        round(avg(when(col("n_rel") > 0,
          col("hits").cast("double") / col("n_rel"))), 6).as("r_at_k"))
      .orderBy("k")
  }

  // ---- E-233 rank-biased overlap -------------------------------------------------
  // How much do the BM25 ranking and the LM-quality ranking (the two
  // lists E-58 fuses) actually agree? Truncated RBO at depth 50 with
  // persistence p = 0.9: overlap X_d at each depth is an exact integer
  // (count of docs whose max(rank_a, rank_b) ≤ d — prefix intersection
  // by inclusion of the later rank), and the weighted sum
  // (1−p)·Σ p^(d−1)·X_d/d is the one float fold, rounded. Both ranks
  // settle on rounded scores with doc_id tiebreak (E-58 discipline).
  def extRbo(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val bm = graft.text.TextAnalysis.bm25(docs, Seq("spark", "table", "hash"))
      .select(col("doc_id"), round(col("bm25"), 4).as("s"))
    val lm = graft.text.TextAnalysis.unigramLogScore(docs)
      .join(bm.select("doc_id"), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), round(col("lm_score"), 4).as("s"))
    val ra = bm.select(col("doc_id"),
      row_number().over(Window.orderBy(desc("s"), asc("doc_id")))
        .cast("long").as("ra"))
    val rb = lm.select(col("doc_id"),
      row_number().over(Window.orderBy(asc("s"), asc("doc_id")))
        .cast("long").as("rb"))
    val mx = ra.join(rb, "doc_id")
      .select(greatest(col("ra"), col("rb")).as("m"))
      .filter(col("m") <= 50)
    val depths = s.range(1, 51).select(col("id").as("d"))
    val xd = broadcast(depths).join(mx, col("m") <= col("d"), "left")
      .groupBy("d").agg(count(col("m")).as("x_d"))
    xd.agg(
        max(when(col("d") === 10, col("x_d"))).as("x10"),
        max(when(col("d") === 50, col("x_d"))).as("x50"),
        round(sum(pow(lit(0.9), col("d") - 1) * col("x_d") / col("d"))
          * 0.1, 6).as("rbo"))
  }

  // ---- E-234 Benjamini–Hochberg FDR ----------------------------------------------
  // 25 simultaneous hypotheses — does nation i's mean customer balance
  // differ from the global mean? — controlled at FDR α = 0.05. Means
  // and the pooled variance come from EXACT decimal cents sums; z is
  // one settled expression; Φ uses the logistic approximation
  // Φ(z) ≈ 1/(1+e^(−1.702z)) (documented — both engines evaluate the
  // identical closed form, no erf dependency). BH: rank p ascending,
  // reject ranks ≤ argmax{i : p_(i) ≤ α·i/m}. The step-up scan is a
  // window over the 25-row hypothesis frame, never the fact table.
  def extBhfdr(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").cast("decimal(38,0)")
          .as("v"))
    val g = c.agg(count(lit(1)).as("n"), sum("v").as("sx"),
      sum(col("v") * col("v")).as("sxx"))
    val per = c.groupBy("c_nationkey")
      .agg(count(lit(1)).as("ni"), sum("v").as("sxi"))
    val z = per.crossJoin(broadcast(g))
      .join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nationkey"), col("n_name"))),
        "c_nationkey")
      .select(col("n_name"), col("ni"),
        ((col("sxi").cast("double") / col("ni") -
          col("sx").cast("double") / col("n")) /
          sqrt((col("n").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")) /
            (col("n").cast("double") * col("n").cast("double")) /
            col("ni"))).as("z"))
      .withColumn("p", lit(2.0) / (lit(1.0) + exp(lit(1.702) * abs(col("z")))))
    val m = 25L
    val ranked = z.withColumn("rk",
        row_number().over(Window.orderBy(asc("p"), asc("n_name")))
          .cast("long"))
      .withColumn("bh_thresh", lit(0.05) * col("rk") / m)
      .withColumn("passes", col("p") <= col("bh_thresh"))
    val cut = ranked.agg(
      coalesce(max(when(col("passes"), col("rk"))), lit(0L)).as("k_cut"))
    ranked.crossJoin(broadcast(cut))
      .select(col("n_name"), col("ni"), round(col("z"), 4).as("z"),
        round(col("p"), 6).as("p"), col("rk"),
        round(col("bh_thresh"), 6).as("bh_thresh"),
        (col("rk") <= col("k_cut")).as("rejected"))
      .orderBy("rk")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_mrr" -> (extMrr _),
    "ext_preck" -> (extPreck _),
    "ext_rbo" -> (extRbo _),
    "ext_bhfdr" -> (extBhfdr _))

  private val rankedSql =
    """n as (select vec_id, label, embedding e,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> cast(x as double) * x))) nrm
      |  from embeddings),
      |pr as (select vec_id probe_id, label plabel, e pv, nrm pnrm
      |  from n where vec_id % 97 = 0 order by vec_id limit 128),
      |sc as (select probe_id, vec_id, plabel, label,
      |    round(list_sum(list_transform(n.e,
      |      (x, i) -> cast(x as double) * pv[i])) / (nrm * pnrm), 4) cos
      |  from n cross join pr where vec_id <> probe_id),
      |rk as (select probe_id, vec_id,
      |    case when label = plabel then 1 else 0 end rel,
      |    row_number() over (partition by probe_id
      |      order by cos desc, vec_id) rk
      |  from sc)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // E-231: identical ranked frame as the E-67 oracle; first-rank min
    // per probe, mean of 1/rank with absent-hit probes at 0.
    "ext_mrr" ->
      s"""with $rankedSql,
        |fr as (select probe_id, min(rk) fr from rk where rel = 1
        |  group by probe_id),
        |pp as (select distinct probe_id from rk)
        |select cast(count(*) as bigint) n_probes,
        |  round(avg(coalesce(1.0 / fr, 0.0)), 6) mrr,
        |  cast(sum(case when fr <= 1 then 1 else 0 end) as bigint) hit1,
        |  cast(sum(case when fr <= 5 then 1 else 0 end) as bigint) hit5,
        |  cast(sum(case when fr <= 10 then 1 else 0 end) as bigint) hit10
        |from pp left join fr using (probe_id)""".stripMargin,

    // E-232: exact integer hits@k per (probe, k); probes with n_rel = 0
    // drop out of the recall average via NULL.
    "ext_preck" ->
      s"""with $rankedSql,
        |per as (select probe_id, k,
        |    cast(sum(case when rk.rk <= k then rel else 0 end) as bigint)
        |      hits,
        |    cast(sum(rel) as bigint) n_rel
        |  from rk cross join unnest([1, 5, 10, 20]) u(k)
        |  group by probe_id, k)
        |select cast(k as bigint) k, cast(count(*) as bigint) n_probes,
        |  round(avg(cast(hits as double) / k), 6) p_at_k,
        |  round(avg(case when n_rel > 0
        |    then cast(hits as double) / n_rel end), 6) r_at_k
        |from per group by k order by k""".stripMargin,

    // E-233: the two rankings are the E-58 oracle's bm/lmc CTEs
    // verbatim (rounded scores, doc_id tiebreaks); X_d by inclusion of
    // max(ra, rb); the final fold mirrors the Spark column.
    "ext_rbo" ->
      """with toks as (select doc_id,
        |    unnest(list_filter(string_split(text, ' '), w -> w <> '')) w
        |  from documents),
        |dl as (select doc_id, count(*) dl from toks group by doc_id),
        |corpus as (select count(*) n_docs, avg(dl) avgdl from dl),
        |tf as (select doc_id, w, count(*) tf from toks
        |  where w in ('spark', 'table', 'hash') group by doc_id, w),
        |dfreq as (select w, count(*) df from tf group by w),
        |bm as (select doc_id, round(sum(
        |    ln(1 + (n_docs - df + cast(0.5 as double)) / (df + cast(0.5 as double)))
        |    * (tf * (cast(1.2 as double) + 1))
        |    / (tf + cast(1.2 as double)
        |       * (cast(0.25 as double) + cast(0.75 as double) * dl / avgdl))), 4) s
        |  from tf join dfreq using(w) join dl using(doc_id) cross join corpus
        |  group by doc_id),
        |cnt as (select w, count(*) c from toks group by w),
        |tot as (select cast(sum(c) as double) n from cnt),
        |lmc as (select t.doc_id, round(avg(-ln(cast(c as double) / n)), 4) s
        |  from toks t join cnt using(w) cross join tot
        |  where t.doc_id in (select doc_id from bm)
        |  group by t.doc_id),
        |ra as (select doc_id,
        |    row_number() over (order by s desc, doc_id) ra from bm),
        |rb as (select doc_id,
        |    row_number() over (order by s asc, doc_id) rb from lmc),
        |mx as (select greatest(ra, rb) m from ra join rb using (doc_id)
        |  where greatest(ra, rb) <= 50),
        |xd as (select d, cast(count(m) as bigint) x_d
        |  from unnest(range(1, 51)) u(d) left join mx on m <= d group by d)
        |select max(case when d = 10 then x_d end) x10,
        |  max(case when d = 50 then x_d end) x50,
        |  round(sum(pow(0.9, d - 1) * x_d / d) * 0.1, 6) rbo
        |from xd""".stripMargin,

    // E-234: exact HUGEINT sums; identical z / logistic-p / step-up
    // expressions; rank ties settle on nation name.
    "ext_bhfdr" ->
      """with c as (select c_nationkey,
        |    cast(cast(round(c_acctbal * 100) as bigint) as hugeint) v
        |  from customer),
        |g as (select cast(count(*) as bigint) n, sum(v) sx,
        |    sum(v * v) sxx from c),
        |per as (select c_nationkey, cast(count(*) as bigint) ni,
        |    sum(v) sxi from c group by c_nationkey),
        |z0 as (select n_name, ni,
        |    (cast(sxi as double) / ni - cast(sx as double) / n) /
        |      sqrt((cast(n as double) * cast(sxx as double) -
        |        cast(sx as double) * cast(sx as double)) /
        |        (cast(n as double) * cast(n as double)) / ni) z
        |  from per cross join g
        |  join nation on n_nationkey = c_nationkey),
        |p0 as (select n_name, ni, z,
        |    2.0 / (1.0 + exp(1.702 * abs(z))) p from z0),
        |rkd as (select n_name, ni, z, p,
        |    cast(row_number() over (order by p, n_name) as bigint) rk
        |  from p0),
        |thr as (select *, 0.05 * rk / 25 bh_thresh from rkd),
        |cut as (select coalesce(max(case when p <= bh_thresh then rk end),
        |    0) k_cut from thr)
        |select n_name, ni, round(z, 4) z, round(p, 6) p, rk,
        |  round(bh_thresh, 6) bh_thresh, rk <= k_cut rejected
        |from thr cross join cut order by rk""".stripMargin)
}
