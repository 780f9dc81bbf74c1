package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 extension queries, batch 4: the estimation-statistics and
  * data-governance family — Welch's t, Spearman ρ, closed-form OLS,
  * trimmed means ([[Stats]]); referential-integrity and l-diversity
  * audits ([[Audit]], [[Privacy]]); deterministic k-fold splits
  * ([[Sampling.foldAssign]]); and the near-dup canonical-document
  * election that turns the minhash cluster graph into an actual
  * dedup decision list.
  *
  * Determinism discipline is SURVEY §5.2 throughout: fixed-point
  * integer measures make every big aggregate exact, the 1-row float
  * arithmetic mirrors the oracle's operation order token-for-token,
  * and every ranking orders on a unique key.
  */
object ExtensionQueries4 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  // ---- E-111 Welch's t-test -------------------------------------------------
  // "Do click and purchase events carry the same value distribution?"
  // — unequal-variance two-sample t over exact cent sums; one
  // map-side-combinable aggregate, 1-row output.
  def extTtest(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select((col("event_type") === lit("click")).as("g"),
        cents(col("value")).as("c"))
    Stats.welchT(ev, col("g"), col("c"))
      .select(col("n1"), col("n2"),
        round(col("mean1") / 100.0, 4).as("mean_click"),
        round(col("mean2") / 100.0, 4).as("mean_purchase"),
        round(col("t"), 4).as("t"), round(col("df"), 2).as("df"))
  }

  // ---- E-112 Spearman rank correlation ---------------------------------------
  // Monotone association between order size (items) and order value —
  // robust to the skewed price distribution where Pearson is not. The
  // rank windows run on the per-order AGGREGATE (orders-sized frame);
  // at corpus scale the same rank sums come from a value histogram
  // (ExtensionQueries3's Mann-Whitney note — Spearman is the same
  // rank-sum machinery applied twice).
  def extSpearman(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("x"))
      .join(t(s, dir, "orders")
          .select(col("o_orderkey").as("l_orderkey"),
            cents(col("o_totalprice")).as("y")),
        "l_orderkey")
    Stats.spearman(per, col("x"), col("y"))
      .select(col("n"), round(col("rho"), 4).as("rho"))
  }

  // ---- E-113 two-feature OLS --------------------------------------------------
  // revenue_cents ~ quantity + discount_pct over lineitem: the
  // closed-form normal-equations fit from one pass of exact sufficient
  // statistics (decimal(38,0) second moments — Σy² at cents scale
  // overflows a long). b0 is in cents; b1 = cents per unit quantity;
  // b2 = cents per discount point.
  def extOls2(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(
      cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("y"),
      col("l_quantity").cast("long").as("x1"),
      round(col("l_discount") * 100).cast("long").as("x2"))
    Stats.ols2(li, col("y"), col("x1"), col("x2"))
      .select(col("n"), round(col("b0"), 4).as("b0"),
        round(col("b1"), 4).as("b1"), round(col("b2"), 4).as("b2"),
        round(col("r2"), 6).as("r2"))
  }

  // ---- E-118 trimmed mean ------------------------------------------------------
  // Outlier-robust per-nation account balance: drop the 5% tails by
  // unique (value, custkey) position, exact integer re-aggregate. The
  // mean is rounded to the nearest cent with INTEGER arithmetic
  // ((2S+n) div 2n — half-up on the exact rational). Negative sums are
  // safe: Spark's `div` and DuckDB's integer `//` BOTH truncate toward
  // zero (verified: -7 div 2 = -7 // 2 = -3, incl. HUGEINT operands),
  // so the two engines agree on every sign — no floor/trunc divergence.
  // A double division first would sit on
  // the half-cent boundary whenever n | 2S, where DuckDB's
  // multiply-then-nearbyint round and Spark's exact-decimal HALF_UP
  // legitimately disagree by one ulp (observed at sf0.01, NATION_24).
  def extTrimmed(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").join(
      broadcast(t(s, dir, "nation")),
      col("c_nationkey") === col("n_nationkey"))
    Stats.trimmedMean(c.select(col("n_name"), cents(col("c_acctbal")).as("v"),
        col("c_custkey")),
        groupCols = Seq("n_name"), valueFixed = col("v"),
        tiebreak = col("c_custkey"), frac = 0.05)
      .select(col("n_name"), col("n"), col("n_kept"),
        expr("(2 * sum_v + n_kept) div (2 * n_kept)").as("trimmed_mean_cents"))
      .orderBy("n_name")
  }

  // ---- E-121 referential-integrity audit ---------------------------------------
  // Five FK edges of the star schema plus the stream→dim edge; one
  // anti-join per edge, 1-row-per-edge output. events.user_id is the
  // edge that actually carries orphans in the fixture — the audit is
  // what surfaces that before a join drops the rows silently.
  def extFkAudit(s: SparkSession, dir: String): DataFrame = {
    import Audit.FkEdge
    val edges = Seq(
      FkEdge("lineitem.l_orderkey->orders", t(s, dir, "lineitem"),
        "l_orderkey", t(s, dir, "orders"), "o_orderkey"),
      FkEdge("orders.o_custkey->customer", t(s, dir, "orders"),
        "o_custkey", t(s, dir, "customer"), "c_custkey"),
      FkEdge("customer.c_nationkey->nation", t(s, dir, "customer"),
        "c_nationkey", t(s, dir, "nation"), "n_nationkey"),
      FkEdge("supplier.s_nationkey->nation", t(s, dir, "supplier"),
        "s_nationkey", t(s, dir, "nation"), "n_nationkey"),
      FkEdge("events.user_id->customer", t(s, dir, "events"),
        "user_id", t(s, dir, "customer"), "c_custkey"))
    Audit.fkAudit(edges)
      .select(col("edge"), col("total_rows"), col("orphans"),
        round(col("orphan_pct"), 6).as("orphan_pct"))
      .orderBy("edge")
  }

  // ---- E-120 l-diversity audit ---------------------------------------------------
  // k-anonymity's homogeneity check: quasi = (nation, $1000 balance
  // band), sensitive = market segment. Groups of ≥3 with every member
  // in one segment still leak — `diverse` = false marks them.
  def extLDiv(s: SparkSession, dir: String): DataFrame =
    Privacy.lDiversity(
        t(s, dir, "customer").select(col("c_nationkey"),
          floor(col("c_acctbal") / 1000).cast("long").as("band"),
          col("c_mktsegment")),
        quasi = Seq("c_nationkey", "band"), sensitive = "c_mktsegment",
        k = 3, l = 3)
      .orderBy("c_nationkey", "band")

  // ---- E-122 deterministic k-fold split -------------------------------------------
  // Cross-validation plumbing: fold = sha256(custkey) mod 5 — pure
  // narrow projection, reproducible on any engine. Per-fold count,
  // share, and exact-cents mean balance prove the split is uniform and
  // unbiased.
  def extCrossval(s: SparkSession, dir: String): DataFrame = {
    val folded = t(s, dir, "customer")
      .select(Sampling.foldAssign(col("c_custkey"), 5).as("fold"),
        cents(col("c_acctbal")).as("c"))
    folded.groupBy("fold")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"))
      .withColumn("share",
        round(col("n") / sum(col("n")).over(Window.partitionBy()), 6))
      .select(col("fold"), col("n"), col("share"),
        round(col("sc").cast("double") / col("n") / 100.0, 2).as("mean_bal"))
      .orderBy("fold")
  }

  // ---- E-115 near-dup canonical election --------------------------------------------
  // The decision list a dedup pass actually executes: cluster the
  // near-dup graph (minhash bands + exact-Jaccard recheck at τ=0.8,
  // transitively closed), elect one keeper per cluster by quality
  // (longest text, then lowest id), emit every (doomed doc, keeper).
  // At 64 bands × 2 rows the τ=0.8 banding miss probability is
  // (1−0.64)^64 ≈ 3e-29 — the exact all-pairs oracle is reproduced.
  def extCanonical(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val comps = Dedup.nearDupComponents(docs, "doc_id",
      array_distinct(split(col("text"), " ")), threshold = 0.8,
      bands = 64, rowsPerBand = 2)
    val sized = comps.join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
    val w = Window.partitionBy("component")
      .orderBy(desc("n_chars"), asc("doc_id"))
    val keepers = sized.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("component"), col("doc_id").as("keeper"))
    comps.join(keepers, "component")
      .filter(col("doc_id") =!= col("keeper"))
      .select(col("doc_id"), col("keeper"))
      .orderBy("doc_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_ttest" -> (extTtest _),
    "ext_spearman" -> (extSpearman _),
    "ext_ols2" -> (extOls2 _),
    "ext_trimmed" -> (extTrimmed _),
    "ext_fkaudit" -> (extFkAudit _),
    "ext_ldiv" -> (extLDiv _),
    "ext_crossval" -> (extCrossval _),
    "ext_canonical" -> (extCanonical _))

  val oracleSql: Map[String, String] = Map(
    // E-111: identical cent sums, identical 1-row float order.
    "ext_ttest" ->
      """with e as (select event_type = 'click' g,
        |    cast(round(value * 100, 0) as bigint) c
        |  from events where event_type in ('click', 'purchase')),
        |a as (select
        |    cast(sum(case when g then 1 else 0 end) as bigint) n1,
        |    cast(sum(case when not g then 1 else 0 end) as bigint) n2,
        |    cast(sum(case when g then c else 0 end) as double) s1,
        |    cast(sum(case when not g then c else 0 end) as double) s2,
        |    cast(sum(case when g then c * c else 0 end) as double) q1,
        |    cast(sum(case when not g then c * c else 0 end) as double) q2
        |  from e),
        |m as (select n1, n2,
        |    s1 / n1 m1, s2 / n2 m2,
        |    ((q1 - s1 * s1 / n1) / (n1 - 1)) / n1 se1,
        |    ((q2 - s2 * s2 / n2) / (n2 - 1)) / n2 se2
        |  from a)
        |select n1, n2, round(m1 / 100.0, 4) mean_click,
        |  round(m2 / 100.0, 4) mean_purchase,
        |  round((m1 - m2) / sqrt(se1 + se2), 4) t,
        |  round((se1 + se2) * (se1 + se2)
        |    / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1)), 2) df
        |from m""".stripMargin,

    // E-112: integer half-unit average ranks (2·rank + ties − 1), then
    // the Pearson identity over exact sums.
    "ext_spearman" ->
      """with per as (select l_orderkey k, count(*) x from lineitem group by 1),
        |j as (select x, cast(round(o_totalprice * 100, 0) as bigint) y
        |  from per join orders on k = o_orderkey),
        |r as (select
        |    2 * rank() over (order by x) + count(*) over (partition by x) - 1 rx,
        |    2 * rank() over (order by y) + count(*) over (partition by y) - 1 ry
        |  from j),
        |a as (select cast(count(*) as double) n,
        |    cast(sum(rx) as double) sx, cast(sum(ry) as double) sy,
        |    cast(sum(rx * rx) as double) sxx, cast(sum(ry * ry) as double) syy,
        |    cast(sum(rx * ry) as double) sxy
        |  from r)
        |select cast(n as bigint) n,
        |  round((n * sxy - sx * sy)
        |    / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 4) rho
        |from a""".stripMargin,

    // E-113: identical centered-moment Cramer solve; DuckDB's bigint
    // sums widen to HUGEINT (exact) like Spark's decimal(38,0).
    "ext_ols2" ->
      """with li as (select
        |    cast(round(l_extendedprice * (1.0 - l_discount) * 100, 0) as bigint) y,
        |    cast(l_quantity as bigint) x1,
        |    cast(round(l_discount * 100, 0) as bigint) x2
        |  from lineitem),
        |a as (select cast(count(*) as double) n,
        |    cast(sum(x1) as double) s1, cast(sum(x2) as double) s2,
        |    cast(sum(y) as double) sy,
        |    cast(sum(x1 * x1) as double) s11, cast(sum(x2 * x2) as double) s22,
        |    cast(sum(x1 * x2) as double) s12, cast(sum(x1 * y) as double) s1y,
        |    cast(sum(x2 * y) as double) s2y, cast(sum(y * y) as double) syy
        |  from li),
        |m as (select n, s1 / n m1, s2 / n m2, sy / n my,
        |    s11, s22, s12, s1y, s2y, syy from a),
        |c as (select n, m1, m2, my,
        |    s11 - n * m1 * m1 c11, s22 - n * m2 * m2 c22,
        |    s12 - n * m1 * m2 c12, s1y - n * m1 * my c1y,
        |    s2y - n * m2 * my c2y, syy - n * my * my cyy
        |  from m),
        |b as (select n, m1, m2, my, c1y, c2y, cyy,
        |    (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) b1,
        |    (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) b2
        |  from c)
        |select cast(n as bigint) n,
        |  round(my - b1 * m1 - b2 * m2, 4) b0,
        |  round(b1, 4) b1, round(b2, 4) b2,
        |  round((b1 * c1y + b2 * c2y) / cyy, 6) r2
        |from b""".stripMargin,

    // E-118: identical positional cut over the unique (v, custkey)
    // order; nearest-cent mean via integer (2S+n)//(2n) — DuckDB's
    // integer `//` truncates toward zero exactly like Spark's `div`
    // (verified on BIGINT and HUGEINT), so negative balance sums
    // round identically on both engines.
    "ext_trimmed" ->
      """with c as (select n_name,
        |    cast(round(c_acctbal * 100, 0) as bigint) v, c_custkey
        |  from customer join nation on c_nationkey = n_nationkey),
        |r as (select n_name, v,
        |    row_number() over (partition by n_name order by v, c_custkey) rn,
        |    count(*) over (partition by n_name) n
        |  from c),
        |k as (select n_name, v, rn, n, cast(floor(n * 0.05) as bigint) kk from r)
        |select n_name, max(n) n, count(*) n_kept,
        |  cast((2 * sum(v) + count(*)) // (2 * count(*)) as bigint) trimmed_mean_cents
        |from k where rn > kk and rn <= n - kk
        |group by n_name order by n_name""".stripMargin,

    // E-121: left-join null counts ≡ anti-join counts (parent keys
    // unique, child keys non-null in the fixture).
    "ext_fkaudit" ->
      """select * from (
        |select 'lineitem.l_orderkey->orders' edge,
        |  cast(count(*) as bigint) total_rows,
        |  cast(sum(case when o_orderkey is null then 1 else 0 end) as bigint) orphans,
        |  round(sum(case when o_orderkey is null then 1 else 0 end)
        |    / cast(count(*) as double), 6) orphan_pct
        |from lineitem left join orders on l_orderkey = o_orderkey
        |union all
        |select 'orders.o_custkey->customer',
        |  cast(count(*) as bigint),
        |  cast(sum(case when c_custkey is null then 1 else 0 end) as bigint),
        |  round(sum(case when c_custkey is null then 1 else 0 end)
        |    / cast(count(*) as double), 6)
        |from orders left join customer on o_custkey = c_custkey
        |union all
        |select 'customer.c_nationkey->nation',
        |  cast(count(*) as bigint),
        |  cast(sum(case when n_nationkey is null then 1 else 0 end) as bigint),
        |  round(sum(case when n_nationkey is null then 1 else 0 end)
        |    / cast(count(*) as double), 6)
        |from customer left join nation on c_nationkey = n_nationkey
        |union all
        |select 'supplier.s_nationkey->nation',
        |  cast(count(*) as bigint),
        |  cast(sum(case when n_nationkey is null then 1 else 0 end) as bigint),
        |  round(sum(case when n_nationkey is null then 1 else 0 end)
        |    / cast(count(*) as double), 6)
        |from supplier left join nation on s_nationkey = n_nationkey
        |union all
        |select 'events.user_id->customer',
        |  cast(count(*) as bigint),
        |  cast(sum(case when c_custkey is null then 1 else 0 end) as bigint),
        |  round(sum(case when c_custkey is null then 1 else 0 end)
        |    / cast(count(*) as double), 6)
        |from events left join customer on user_id = c_custkey
        |) order by edge""".stripMargin,

    // E-120: exact distinct count per quasi group.
    "ext_ldiv" ->
      """select c_nationkey, cast(floor(c_acctbal / 1000) as bigint) band,
        |  cast(count(*) as bigint) n,
        |  cast(count(distinct c_mktsegment) as bigint) l,
        |  count(distinct c_mktsegment) >= 3 diverse
        |from customer group by 1, 2 having count(*) >= 3
        |order by c_nationkey, band""".stripMargin,

    // E-122: the '0x'-parse of the identical sha256 prefix (sampling
    // convention), same share/mean arithmetic.
    "ext_crossval" ->
      """with f as (select
        |    ('0x' || substr(sha256(cast(c_custkey as varchar)), 1, 4))::int % 5 fold,
        |    cast(round(c_acctbal * 100, 0) as bigint) c
        |  from customer),
        |g as (select fold, cast(count(*) as bigint) n, cast(sum(c) as bigint) sc
        |  from f group by 1)
        |select cast(fold as bigint) as fold, n,
        |  round(n / cast(sum(n) over () as double), 6) as share,
        |  round(cast(sc as double) / n / 100.0, 2) as mean_bal
        |from g order by fold""".stripMargin,

    // E-115: exact all-pairs Jaccard ≥ 0.8 edges, transitive closure
    // (ext_components pattern), keeper by (n_chars desc, id).
    "ext_canonical" -> canonicalOracleSql)

  /** E-115 oracle, BOUNDED reformulation (round-12 judge directive #1;
    * verified row-identical to the naive all-pairs + recursive-closure
    * form at sf0.01, and across both closure forms at sf0.1):
    *
    *  - the fixture vocabulary is tiny (31 words at sf0.1), so each
    *    doc's distinct token SET packs into a HUGEINT bitmask via a
    *    derived word index — set Jaccard becomes
    *    bit_count(a&b)/bit_count(a|b), pure integer ops with no
    *    per-pair list allocation (the naive form ground 1h+ at sf0.1
    *    on 12.5M list_intersect calls). Vocab >127 would overflow the
    *    shift and fail LOUDLY (DuckDB raises on hugeint shift
    *    overflow) — never a silent wrong answer.
    *  - pairs run over DISTINCT masks (one rep doc per mask; same-mask
    *    docs have Jaccard 1 and ride their rep's component).
    *  - the transitive closure is NOT a recursive reachability CTE
    *    (7.1M reach rows, 333 s at sf0.1): it is [[JumpRounds]]
    *    unrolled hash-min + pointer-jumping stages — the same O(log n)
    *    discipline the Spark ConnectedComponents operator uses — each
    *    stage two cheap joins over ≤ |reps| labels. A final
    *    fixpoint-equality guard calls DuckDB error() if the labels
    *    have not converged, so an undersized K is loud, not wrong.
    *    Measured: 668 s → 2.7 s at sf0.1, identical rows.
    */
  // `final val` literal: constant-folded at compile time, so the lazy
  // SQL builder below can never observe it uninitialized (a plain val
  // here reads 0 when the oracleSql map — declared earlier — forces the
  // lazy val during object init).
  private final val JumpRounds = 16

  private lazy val canonicalOracleSql: String = {
    val K = JumpRounds
    val sb = new StringBuilder
    sb.append(
      """with d as materialized (select doc_id,
        |    list_distinct(string_split(text, ' ')) s, n_chars
        |  from documents),
        |tok as materialized (select doc_id, unnest(s) w from d),
        |vocab as materialized (select w, cast(row_number() over (order by w) - 1 as int) idx
        |  from (select distinct w from tok)),
        |m as materialized (select doc_id, bit_or(1::hugeint << v.idx) mask
        |  from tok t join vocab v on t.w = v.w group by doc_id),
        |g as materialized (select mask, min(doc_id) rep from m group by mask),
        |mp as materialized (select a.rep u, b.rep v from g a join g b on a.rep < b.rep
        |  where cast(bit_count(a.mask & b.mask) as double)
        |      / bit_count(a.mask | b.mask) >= 0.8),
        |edges as materialized (select u, v from mp union select v, u from mp),
        |l_0 as materialized (select rep v, rep lbl from g),
        |""".stripMargin)
    for (i <- 0 until K) {
      sb.append(
        s"""h_$i as (select e.v, min(l.lbl) mn from edges e
           |  join l_$i l on l.v = e.u group by e.v),
           |c_$i as (select l.v, least(l.lbl, coalesce(h.mn, l.lbl)) m1
           |  from l_$i l left join h_$i h on l.v = h.v),
           |l_${i + 1} as materialized (select c.v, l2.lbl from c_$i c join l_$i l2 on l2.v = c.m1),
           |""".stripMargin)
    }
    sb.append(
      s"""conv as (select count(*) c from (
         |    select * from l_$K except select * from l_${K - 1})),
         |allrep as (select g.rep,
         |    case when (select c from conv) = 0 then l.lbl
         |      else error('ext_canonical oracle: min-label propagation not converged in $K pointer-jumping rounds - raise JumpRounds')
         |    end comp, g.mask
         |  from g join l_$K l on g.rep = l.v),
         |dcomp as (select m.doc_id, ar.comp from m join allrep ar on m.mask = ar.mask),
         |comp2 as (select comp, doc_id from (
         |    select comp, doc_id, count(*) over (partition by comp) csize from dcomp) t
         |  where csize >= 2),
         |keep as (select comp, doc_id keeper from (
         |    select c.comp, c.doc_id,
         |      row_number() over (partition by c.comp
         |        order by d.n_chars desc, c.doc_id) rn
         |    from comp2 c join d on c.doc_id = d.doc_id) t
         |  where rn = 1)
         |select c.doc_id, k.keeper
         |from comp2 c join keep k on c.comp = k.comp
         |where c.doc_id <> k.keeper order by c.doc_id""".stripMargin)
    sb.toString
  }
}
