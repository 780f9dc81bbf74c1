package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 35: privacy-preserving release,
  * search snippets, and bitemporal snapshots — differentially-private
  * counts with the deterministic inverse-CDF noise coin (E-125's
  * resampling trick applied to Laplace), keyword-in-context
  * extraction, and the two-clock valid-time × transaction-time query
  * pattern SCD2 (valid time only) and q118 time travel (storage
  * versions only) each cover half of.
  */
object ExtensionQueries35 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def h60(c: Column) =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  // ---- E-259 differentially-private counts ---------------------------------------
  // Per-nation customer counts released with Laplace(1/ε) noise,
  // ε = 0.5 (sensitivity 1 for a count). The noise is the DETERMINISTIC
  // inverse CDF of the portable per-key uniform (u from sha256, the
  // E-125 Poisson-bootstrap coin): noise = −b·sign(u−½)·ln(1−2|u−½|) —
  // engine-reproducible, so the oracle pins the released values
  // exactly while the mechanism stays the textbook one. Reported with
  // the true count and |error| — the utility-loss view a DP release
  // review needs. (A production release would draw fresh randomness;
  // the pinned coin is the testable variant, like E-125.)
  def extDpcount(s: SparkSession, dir: String): DataFrame = {
    val eps = 0.5
    val per = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n_true"))
    val u = (h60(concat(lit("dp|"), col("n_name"))).cast("double") + 0.5) /
      1152921504606846976.0
    per
      .withColumn("noise",
        lit(-1.0 / eps) * signum(u - 0.5) *
          log(lit(1.0) - lit(2.0) * abs(u - 0.5)))
      .select(col("n_name"), col("n_true"),
        round(col("n_true") + col("noise"), 2).as("n_released"),
        round(abs(col("noise")), 2).as("abs_err"))
      .orderBy("n_name")
  }

  // ---- E-260 keyword-in-context snippets -----------------------------------------
  // The search-result view over the corpus: for docs containing the
  // query term, the first match position and a ±30-char window around
  // it — position arithmetic only (instr/substr are 1-based in both
  // engines), no tokenization. The presentation layer over BM25's
  // ranking (E-28).
  def extKwic(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"),
        instr(col("text"), "spark").cast("long").as("pos"))
      .filter(col("pos") > 0)
      .withColumn("snippet",
        expr("substr(text, greatest(1, cast(pos as int) - 30), 65)"))
      .select("doc_id", "pos", "snippet")
      .orderBy("doc_id")
      .limit(20)
  }

  // ---- E-261 bitemporal snapshots ------------------------------------------------
  // Two clocks: VALID time (when a balance was true in the world) and
  // TRANSACTION time (when the database learned it). The synthesized
  // history: v1 recorded on 2024-01-01 covering valid-from 1995;
  // a correction (+$100 for custkey ≤ 50, valid from 1996) recorded
  // 2024-01-15 closes v1's transaction interval for those keys. The
  // query answers BOTH clocks at once — "what did we THINK on tx-date
  // T that the balance WAS on valid-date B" — for two (T, B) probes,
  // via two half-open interval filters; the correction is visible only
  // to the later transaction probe. SCD2 (OP-SCD2) tracks valid time
  // only; q118 tracks storage versions only; this is the two-axis
  // pattern auditors ask for.
  def extBitemporal(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_custkey") <= 60)
      .select(col("c_custkey").as("k"),
        round(col("c_acctbal"), 2).as("bal"))
    val far = lit("9999-12-31").cast("date")
    val v1 = c.select(col("k"), col("bal"),
      lit("1995-01-01").cast("date").as("vf"), far.as("vt"),
      lit("2024-01-01").cast("date").as("tf"),
      when(col("k") <= 50, lit("2024-01-15").cast("date")).otherwise(far)
        .as("tt"))
    val v2 = c.filter(col("k") <= 50)
      .select(col("k"), round(col("bal") + 100.0, 2).as("bal"),
        lit("1996-01-01").cast("date").as("vf"), far.as("vt"),
        lit("2024-01-15").cast("date").as("tf"), far.as("tt"))
    val hist = v1.unionAll(v2)
    def probe(label: String, tx: String, valid: String) = hist
      .filter(col("tf") <= lit(tx).cast("date") &&
        lit(tx).cast("date") < col("tt") &&
        col("vf") <= lit(valid).cast("date") &&
        lit(valid).cast("date") < col("vt"))
      .select(lit(label).as("probe"), col("k"), col("bal"))
    probe("tx0110_valid1996", "2024-01-10", "1996-06-01")
      .unionAll(probe("tx0201_valid1996", "2024-02-01", "1996-06-01"))
      .unionAll(probe("tx0201_valid1995", "2024-02-01", "1995-06-01"))
      .filter(col("k") <= 10)
      .orderBy("probe", "k")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_dpcount" -> (extDpcount _),
    "ext_kwic" -> (extKwic _),
    "ext_bitemporal" -> (extBitemporal _))

  val oracleSql: Map[String, String] = Map(
    // E-259: identical hash coin and inverse CDF.
    "ext_dpcount" ->
      """with per as (select n_name, cast(count(*) as bigint) n_true
        |  from customer join nation on c_nationkey = n_nationkey
        |  group by n_name),
        |nz as (select n_name, n_true,
        |    (('0x' || substr(sha256('dp|' || n_name), 1, 15))::bigint
        |      + cast(0.5 as double)) / 1152921504606846976.0 u
        |  from per)
        |select n_name, n_true,
        |  round(n_true + (-2.0) * sign(u - 0.5) * ln(1.0 - 2.0 *
        |    abs(u - 0.5)), 2) n_released,
        |  round(abs((-2.0) * sign(u - 0.5) * ln(1.0 - 2.0 *
        |    abs(u - 0.5))), 2) abs_err
        |from nz order by n_name""".stripMargin,

    // E-260: identical 1-based position arithmetic.
    "ext_kwic" ->
      """select cast(doc_id as bigint) doc_id,
        |  cast(strpos(text, 'spark') as bigint) pos,
        |  substr(text, greatest(1, strpos(text, 'spark') - 30), 65) snippet
        |from documents where strpos(text, 'spark') > 0
        |order by doc_id limit 20""".stripMargin,

    // E-261: identical synthesized history and two-clock filters.
    "ext_bitemporal" ->
      """with c as (select c_custkey k, round(c_acctbal, 2) bal
        |  from customer where c_custkey <= 60),
        |hist as (
        |  select k, bal, date '1995-01-01' vf, date '9999-12-31' vt,
        |    date '2024-01-01' tf,
        |    case when k <= 50 then date '2024-01-15'
        |      else date '9999-12-31' end tt
        |  from c
        |  union all
        |  select k, round(bal + 100.0, 2), date '1996-01-01',
        |    date '9999-12-31', date '2024-01-15', date '9999-12-31'
        |  from c where k <= 50),
        |probes as (
        |  select 'tx0110_valid1996' probe, date '2024-01-10' tx,
        |    date '1996-06-01' vday
        |  union all select 'tx0201_valid1996', date '2024-02-01',
        |    date '1996-06-01'
        |  union all select 'tx0201_valid1995', date '2024-02-01',
        |    date '1995-06-01')
        |select probe, k, bal
        |from hist join probes on tf <= tx and tx < tt
        |  and vf <= vday and vday < vt
        |where k <= 10
        |order by probe, k""".stripMargin)
}
