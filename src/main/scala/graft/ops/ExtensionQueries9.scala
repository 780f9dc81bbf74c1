package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 9: corpus-distribution statistics
  * (Jensen-Shannon divergence, Cramér's V, Theil inequality, Cohen's d),
  * RFM customer segmentation, winnowing document fingerprints (the MOSS
  * selection rule on top of the [[graft.text.TextAnalysis]] rolling-hash
  * family), and an OOV-rate dictionary-coverage audit.
  *
  * House float discipline throughout: integer counts stay integers until
  * the last expression, every emitted double is `round(..., 6)` (2 for
  * money), and output is totally ordered — see SURVEY §5.2.
  */
object ExtensionQueries9 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def toks(s: SparkSession, dir: String, extraCols: Column*): DataFrame = {
    val docs = t(s, dir, "documents")
    docs.select(extraCols :+
      explode(filter(split(col("text"), " "), x => x =!= lit(""))).as("tok"): _*)
  }

  // ---- E-138 RFM segmentation ----------------------------------------------------
  // Classic recency/frequency/monetary quartiles per customer, reported
  // as segment sizes. ntile(4) runs over UNPARTITIONED windows — fine at
  // customer-dimension cardinality (even at 100 TB of *facts* the
  // customer dim is orders of magnitude smaller); if the dim itself is
  // huge, replace ntile with 2-pass quantile cuts (approx_percentile →
  // broadcast thresholds), same downstream schema. Monetary is rounded
  // to cents BEFORE ranking so the quartile order never depends on the
  // float summation order of the underlying aggregate.
  def extRfm(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "orders").groupBy(col("o_custkey").as("custkey"))
      .agg(max("o_orderdate").as("last_order"),
        count(lit(1)).as("freq"),
        round(sum("o_totalprice"), 2).as("monetary"))
    val binned = per.select(col("custkey"),
      ntile(4).over(Window.orderBy(col("last_order").desc, col("custkey")))
        .cast("long").as("r_bin"),
      ntile(4).over(Window.orderBy(col("freq").desc, col("custkey")))
        .cast("long").as("f_bin"),
      ntile(4).over(Window.orderBy(col("monetary").desc, col("custkey")))
        .cast("long").as("m_bin"))
    binned.groupBy("r_bin", "f_bin", "m_bin")
      .agg(count(lit(1)).as("n_customers"), min("custkey").as("sample_cust"))
      .orderBy("r_bin", "f_bin", "m_bin")
  }

  // ---- E-139 Jensen-Shannon divergence -------------------------------------------
  // Symmetric, bounded [0, ln 2] distance between the en and de token
  // distributions — the mixture-drift metric that, unlike KL (ext_ldiv
  // is a different "l"), never divides by an absent token. One token-
  // level full-outer count join; the float chain appears only in the
  // final single-row fold over vocabulary-sized terms.
  def extJsd(s: SparkSession, dir: String): DataFrame = {
    val tk = toks(s, dir, col("lang")).filter(col("lang").isin("en", "de"))
    val cnt = tk.groupBy("tok").agg(
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("cp"),
      sum(when(col("lang") === "de", 1L).otherwise(0L)).as("cq"))
    val tot = cnt.agg(sum("cp").cast("double").as("tp"),
      sum("cq").cast("double").as("tq"))
    val p = col("cp").cast("double") / col("tp")
    val q = col("cq").cast("double") / col("tq")
    val m = (p + q) / 2
    cnt.crossJoin(tot)
      .agg(count(lit(1)).as("n_union"),
        round(sum(
          when(col("cp") > 0, lit(0.5) * p * log(p / m)).otherwise(0.0) +
          when(col("cq") > 0, lit(0.5) * q * log(q / m)).otherwise(0.0)), 6).as("jsd"))
  }

  // ---- E-140 Cohen's d effect size -----------------------------------------------
  // Standardized purchase-vs-click difference on events.value: pooled-sd
  // effect size, the number a mean difference needs before anyone
  // believes it. Single conditional-aggregation pass (no self-join),
  // same shape as ext_ttest but reporting the magnitude, not the test.
  def extCohenD(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").filter(col("event_type").isin("purchase", "click"))
    val pv = when(col("event_type") === "purchase", col("value"))
    val cv = when(col("event_type") === "click", col("value"))
    e.agg(
        count(pv).as("n_purchase"), count(cv).as("n_click"),
        avg(pv).as("m1"), avg(cv).as("m2"),
        var_samp(pv).as("v1"), var_samp(cv).as("v2"))
      .select(col("n_purchase"), col("n_click"),
        round(col("m1"), 6).as("mean_purchase"),
        round(col("m2"), 6).as("mean_click"),
        round((col("m1") - col("m2")) /
          sqrt(((col("n_purchase") - 1) * col("v1") + (col("n_click") - 1) * col("v2")) /
            (col("n_purchase") + col("n_click") - 2)), 6).as("cohen_d"))
  }

  // ---- E-141 Cramér's V ----------------------------------------------------------
  // Effect-size normalization of the lang×source chi-square: V =
  // sqrt(χ²/(n·min(r−1,c−1))), the [0,1] answer to "are these two
  // categoricals associated at all". The observed-cell table is joined
  // back onto the FULL r×c grid (cross join of the two tiny distinct
  // sets) so zero-observed cells still contribute their expected count —
  // dropping them understates χ². ext_chisq pins the test; this pins the
  // strength.
  def extCramersV(s: SparkSession, dir: String): DataFrame = {
    val cells = t(s, dir, "documents").groupBy("lang", "source")
      .agg(count(lit(1)).as("o"))
    // domain caps ordered so that if the closed-domain assumption ever
    // breaks, the retained subset is deterministic (not an arbitrary
    // partition-order prefix that would silently shift zero-cells)
    val grid = cells.select("lang").distinct().orderBy("lang").limit(64)
      .crossJoin(cells.select("source").distinct().orderBy("source").limit(64))
    val full = grid.join(cells, Seq("lang", "source"), "left")
      .select(col("lang"), col("source"), coalesce(col("o"), lit(0L)).as("o"))
    val rt = full.groupBy("lang").agg(sum("o").as("rt"))
    val ct = full.groupBy("source").agg(sum("o").as("ct"))
    val tot = full.agg(sum("o").cast("double").as("n"),
      countDistinct("lang").as("r"), countDistinct("source").as("c"))
    val ex = col("rt").cast("double") * col("ct") / col("n")
    full.join(rt, "lang").join(ct, "source").crossJoin(tot)
      .agg(max(col("n")).cast("long").as("n"), max("r").as("r"), max("c").as("c"),
        sum(pow(col("o") - ex, 2) / ex).as("chi2_raw"),
        (sum(pow(col("o") - ex, 2) / ex) /
          (max(col("n")) * least(max("r") - 1, max("c") - 1))).as("v_raw"))
      .select(col("n"), col("r"), col("c"),
        round(col("chi2_raw"), 6).as("chi2"),
        round(sqrt(col("v_raw")), 6).as("cramers_v"))
  }

  // ---- E-142 Theil T inequality index --------------------------------------------
  // Entropy-based inequality of positive customer balances: T =
  // (1/n)·Σ (x/μ)·ln(x/μ). Unlike Gini (ext_gini, rank-based, needs a
  // sort), Theil is a plain two-pass aggregate — mean, then one fold —
  // and decomposes additively across subgroups, which is why pipelines
  // prefer it for per-shard drill-down at scale.
  def extTheil(s: SparkSession, dir: String): DataFrame = {
    val x = t(s, dir, "customer").filter(col("c_acctbal") > 0)
      .select(col("c_acctbal").cast("double").as("x"))
    val mu = x.agg(avg("x").as("mu"), count(lit(1)).as("n"))
    x.crossJoin(mu)
      .agg(max("n").as("n"), round(max("mu"), 6).as("mu"),
        round(sum((col("x") / col("mu")) * log(col("x") / col("mu"))) / max("n"), 6)
          .as("theil"))
  }

  // ---- E-143 winnowing fingerprints ----------------------------------------------
  // MOSS-style winnowing (Schleimer et al. 2003): token-trigram rolling
  // hashes, then keep the MINIMUM of every w=4 consecutive hashes — the
  // guarantee-backed way to subsample shingles so any shared substring
  // of ≥ w+k−1 tokens is caught by at least one shared fingerprint,
  // unlike "every 8th hash" subsampling which an attacker (or a
  // reformatter) defeats by shifting text. Hash = first 60 bits of
  // sha256, the house portable-oracle idiom (Dedup.scala:326). All
  // windows are per-doc — partition-local at any scale.
  def extWinnow(s: SparkSession, dir: String): DataFrame = {
    val wDoc = Window.partitionBy("doc_id").orderBy("i")
    val grams = t(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(filter(split(col("text"), " "), x => x =!= lit("")))
          .as(Seq("i", "tok")))
      .withColumn("t2", lead("tok", 1).over(wDoc))
      .withColumn("t3", lead("tok", 2).over(wDoc))
      .filter(col("t3").isNotNull)
      .select(col("doc_id"), col("i"),
        concat_ws(" ", col("tok"), col("t2"), col("t3")).as("gram"))
    grams
      .withColumn("h", conv(substring(sha2(col("gram"), 256), 1, 15), 16, 10).cast("long"))
      .withColumn("mh", min("h").over(wDoc.rowsBetween(0, 3)))
      .filter(col("doc_id") < 50)
      .groupBy("doc_id")
      .agg(countDistinct("mh").as("n_fp"),
        concat_ws(",", sort_array(collect_set(col("mh")))).as("fp_csv"))
      .orderBy("doc_id")
  }

  // ---- E-144 OOV-rate dictionary coverage ----------------------------------------
  // Per-source share of tokens OUTSIDE the global top-20 vocabulary —
  // the cheap tokenizer-fit audit run before committing a vocab: a
  // source whose OOV rate spikes is either another language or garbage.
  // The vocab is deliberately a broadcast-sized dimension (top-k of a
  // counts aggregate), so the probe join is map-side at any corpus size.
  def extOov(s: SparkSession, dir: String): DataFrame = {
    val tk = toks(s, dir, col("source"))
    val top = tk.groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(20)
      .select(col("tok"), lit(1L).as("in_vocab"))
    tk.join(broadcast(top), Seq("tok"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("source"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 6).as("oov_rate"))
      .orderBy("source")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_rfm" -> (extRfm _),
    "ext_jsd" -> (extJsd _),
    "ext_cohend_events" -> (extCohenD _),
    "ext_cramersv" -> (extCramersV _),
    "ext_theil" -> (extTheil _),
    "ext_winnow" -> (extWinnow _),
    "ext_oov_top20" -> (extOov _))

  val oracleSql: Map[String, String] = Map(
    "ext_rfm" ->
      """with per as (select o_custkey custkey, max(o_orderdate) last_order,
        |    count(*) freq, round(sum(o_totalprice), 2) monetary
        |  from orders group by 1),
        |b as (select custkey,
        |    ntile(4) over (order by last_order desc, custkey) r_bin,
        |    ntile(4) over (order by freq desc, custkey) f_bin,
        |    ntile(4) over (order by monetary desc, custkey) m_bin
        |  from per)
        |select r_bin, f_bin, m_bin, count(*) n_customers, min(custkey) sample_cust
        |from b group by 1, 2, 3 order by 1, 2, 3""".stripMargin,

    "ext_jsd" ->
      """with tk as (select lang,
        |    unnest(list_filter(string_split(text, ' '), w -> w <> '')) tok
        |  from documents where lang in ('en', 'de')),
        |c as (select tok,
        |    sum(case when lang = 'en' then 1 else 0 end) cp,
        |    sum(case when lang = 'de' then 1 else 0 end) cq
        |  from tk group by tok),
        |t as (select cast(sum(cp) as double) tp, cast(sum(cq) as double) tq from c)
        |select cast(count(*) as bigint) n_union,
        |  round(sum(
        |    case when cp > 0 then 0.5 * (cp/tp) * ln((cp/tp) / ((cp/tp + cq/tq)/2))
        |      else 0 end
        |  + case when cq > 0 then 0.5 * (cq/tq) * ln((cq/tq) / ((cp/tp + cq/tq)/2))
        |      else 0 end), 6) jsd
        |from c cross join t""".stripMargin,

    "ext_cohend_events" ->
      """select
        |  count(value) filter (where event_type = 'purchase') n_purchase,
        |  count(value) filter (where event_type = 'click') n_click,
        |  round(avg(value) filter (where event_type = 'purchase'), 6) mean_purchase,
        |  round(avg(value) filter (where event_type = 'click'), 6) mean_click,
        |  round((avg(value) filter (where event_type = 'purchase')
        |       - avg(value) filter (where event_type = 'click'))
        |    / sqrt(((count(value) filter (where event_type = 'purchase') - 1)
        |            * var_samp(value) filter (where event_type = 'purchase')
        |          + (count(value) filter (where event_type = 'click') - 1)
        |            * var_samp(value) filter (where event_type = 'click'))
        |      / (count(value) filter (where event_type = 'purchase')
        |        + count(value) filter (where event_type = 'click') - 2)), 6) cohen_d
        |from events where event_type in ('purchase', 'click')""".stripMargin,

    "ext_cramersv" ->
      """with cells as (select lang, source, count(*) o from documents group by 1, 2),
        |grid as (select l.lang, s.source
        |  from (select distinct lang from cells) l
        |  cross join (select distinct source from cells) s),
        |full_t as (select g.lang, g.source, coalesce(c.o, 0) o
        |  from grid g left join cells c on g.lang = c.lang and g.source = c.source),
        |rt as (select lang, sum(o) rt from full_t group by lang),
        |ct as (select source, sum(o) ct from full_t group by source),
        |tot as (select cast(sum(o) as double) n,
        |    count(distinct lang) r, count(distinct source) c from full_t)
        |select cast(max(n) as bigint) n, max(r) r, max(c) c,
        |  round(sum(pow(o - rt*ct/n, 2) / (rt*ct/n)), 6) chi2,
        |  round(sqrt(sum(pow(o - rt*ct/n, 2) / (rt*ct/n))
        |    / (max(n) * least(max(r) - 1, max(c) - 1))), 6) cramers_v
        |from full_t join rt using(lang) join ct using(source) cross join tot""".stripMargin,

    "ext_theil" ->
      """with x as (select cast(c_acctbal as double) x from customer where c_acctbal > 0),
        |m as (select avg(x) mu, count(*) n from x)
        |select max(n) n, round(max(mu), 6) mu,
        |  round(sum((x/mu) * ln(x/mu)) / max(n), 6) theil
        |from x cross join m""".stripMargin,

    "ext_winnow" ->
      """with l as (select doc_id,
        |    list_filter(string_split(text, ' '), w -> w <> '') tl
        |  from documents),
        |ga as (select doc_id, list_filter(list_transform(
        |    list_zip(tl, tl[2:], tl[3:]),
        |    p -> case when p[3] is null then null
        |      else p[1] || ' ' || p[2] || ' ' || p[3] end),
        |  v -> v is not null) grams from l),
        |g as (select doc_id, unnest(grams) gram,
        |    generate_subscripts(grams, 1) i from ga),
        |h as (select doc_id, i,
        |    ('0x' || substr(sha256(gram), 1, 15))::bigint h from g),
        |w as (select doc_id, min(h) over (partition by doc_id order by i
        |    rows between current row and 3 following) mh from h)
        |select doc_id, count(distinct mh) n_fp,
        |  array_to_string(list_sort(list(distinct mh)), ',') fp_csv
        |from w where doc_id < 50 group by doc_id order by doc_id""".stripMargin,

    "ext_oov_top20" ->
      """with tk as (select source,
        |    unnest(list_filter(string_split(text, ' '), w -> w <> '')) tok
        |  from documents),
        |top as (select tok from tk group by tok order by count(*) desc, tok limit 20)
        |select source, count(*) n_tokens,
        |  cast(sum(case when tok in (select tok from top) then 0 else 1 end) as bigint) n_oov,
        |  round(cast(sum(case when tok in (select tok from top) then 0 else 1 end) as double)
        |    / count(*), 6) oov_rate
        |from tk group by source order by source""".stripMargin)
}
