package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 87: dedup engineering diagnostics
  * — the measured MinHash estimation-error profile over
  * sorted-neighborhood candidate pairs (the E-124 blocking reused as
  * an internal candidate generator).
  */
object ExtensionQueries87 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def h60(c: org.apache.spark.sql.Column) =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  /** Sorted-neighborhood candidates: docs ranked by (40-char text
    * prefix, doc_id), pairs within rank distance ≤ 5 via the offset
    * explode — an EQUI-join on rank, never a band join. The global
    * rank window sorts the corpus-collapsed doc frame (W-7 note:
    * swap for sorted-zipWithIndex past ~millions of docs).
    */
  private def snmPairs(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"),
        array_distinct(filter(split(col("text"), " "), x => x =!= ""))
          .as("toks"),
        substring(col("text"), 1, 40).as("pfx"))
      .withColumn("rk", row_number().over(
        Window.orderBy("pfx", "doc_id")).cast("long"))
    val probes = d.select(col("doc_id").as("da"), col("toks").as("ta"),
        col("rk"), explode(sequence(lit(1), lit(5))).as("o"))
      .withColumn("rk2", col("rk") + col("o"))
    probes.join(d.select(col("doc_id").as("db"), col("toks").as("tb"),
        col("rk").as("rk2")), Seq("rk2"))
      .select(col("da"), col("db"), col("ta"), col("tb"),
        size(array_intersect(col("ta"), col("tb"))).cast("long")
          .as("inter"),
        size(array_union(col("ta"), col("tb"))).cast("long").as("uni"))
  }

  // ---- E-407 MinHash estimation-error profile ------------------------------------
  // How accurate is the 32-permutation MinHash sketch, measured? Per
  // doc and seed, the min of the sha-derived 60-bit token hashes; per
  // SNM candidate pair, estimate Ĵ = matching seeds∕32 vs the exact
  // Jaccard; the |error| histogram in 0.05 bins plus the bin count
  // share. The sketch-sizing evidence behind every LSH threshold
  // choice — E[|err|] ≈ √(J(1−J)∕32) made visible.
  def extMinhashError(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(filter(split(col("text"), " "),
          x => x =!= ""))).as("tk"))
    // The 60-bit sha2 hash is the expensive expression here; its value
    // depends only on (seed, token), so hash each DISTINCT token once
    // (V×32 rows) and attach by token join instead of re-hashing every
    // (doc, token) occurrence ×32 — same mh values, ~N/V fewer sha2
    // evaluations (measured 11.5 s → see OPTIMIZATION_r13.md). The join
    // output fan-out feeds the map-side partial min directly; the
    // vocabulary table is the only extra shuffled input.
    val tokH = toks.select("tk").distinct()
      .select(col("tk"), explode(sequence(lit(0), lit(31))).as("seed"))
      .select(col("tk"), col("seed"),
        h60(concat(col("seed").cast("string"), lit(":"), col("tk")))
          .as("hq"))
    val sigs = toks.join(tokH, Seq("tk"))
      .groupBy("doc_id", "seed").agg(min("hq").as("mh"))
    val pairs = snmPairs(s, dir)
      .select(col("da"), col("db"),
        (col("inter").cast("double") / col("uni")).as("jexact"))
    val est = pairs
      .join(sigs.select(col("doc_id").as("da"), col("seed"),
        col("mh").as("ma")), Seq("da"))
      .join(sigs.select(col("doc_id").as("db"), col("seed"),
        col("mh").as("mb")), Seq("db", "seed"))
      .groupBy(col("da"), col("db"), col("jexact"))
      .agg((sum(when(col("ma") === col("mb"), 1L).otherwise(0L))
        .cast("double") / 32).as("jest"))
    // ≤ 21-row barrier: binned feeds BOTH the output projection and the
    // tot re-aggregate — without it the whole sigs/SNM/est DAG runs
    // twice (measured 20.8 s → ~11 s at sf0.1, half the query's wall)
    val binned = est
      .withColumn("errbin",
        floor(abs(col("jest") - col("jexact")) * 20).cast("long"))
      .groupBy("errbin").agg(count(lit(1)).as("n_pairs"),
        sum(round(abs(col("jest") - col("jexact")) * lit(1e9))
          .cast("long")).as("errq"))
      .localCheckpoint()
    val tot = binned.agg(sum("n_pairs").as("np"),
      sum("errq").as("eq")).limit(1)
    binned.crossJoin(broadcast(tot))
      .select(round(col("errbin").cast("double") / 20, 2)
          .as("abs_err_bin_lo"),
        col("n_pairs"),
        round(col("n_pairs").cast("double") / col("np"), 4)
          .as("bin_share"),
        round(col("eq").cast("double") / 1e9 / col("np"), 6)
          .as("mean_abs_err"))
      .orderBy("abs_err_bin_lo")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_minhash_error" -> (extMinhashError _))

  private val snmSql =
    """d as (select doc_id,
      |    list_distinct(list_filter(string_split(text, ' '),
      |      x -> x <> '')) toks,
      |    substr(text, 1, 40) pfx
      |  from documents),
      |rk as (select doc_id, toks,
      |    cast(row_number() over (order by pfx, doc_id) as bigint) rk
      |  from d),
      |pairs as (select a.doc_id da, b.doc_id db, a.toks ta, b.toks tb,
      |    cast(len(list_intersect(a.toks, b.toks)) as bigint) inter,
      |    cast(len(list_distinct(list_concat(a.toks, b.toks)))
      |      as bigint) uni
      |  from rk a
      |  cross join (select unnest(generate_series(1, 5)) o) o
      |  join rk b on b.rk = a.rk + o.o)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // E-407: identical sha-derived signatures and error folds.
    "ext_minhash_error" ->
      s"""with $snmSql,
        |toks as (select doc_id, unnest(toks) tk from d),
        |sigs as (select doc_id, seed,
        |    cast(min(('0x' || substr(sha256(cast(seed as varchar) || ':'
        |      || tk), 1, 15))::bigint) as bigint) mh
        |  from toks cross join
        |    (select unnest(generate_series(0, 31)) seed) s
        |  group by 1, 2),
        |est as (select p.da, p.db,
        |    cast(p.inter as double) / p.uni jexact,
        |    cast(sum(case when a.mh = b.mh then 1 else 0 end) as double)
        |      / 32 jest
        |  from pairs p
        |  join sigs a on a.doc_id = p.da
        |  join sigs b on b.doc_id = p.db and b.seed = a.seed
        |  group by 1, 2, 3),
        |binned as (select
        |    cast(floor(abs(jest - jexact) * 20) as bigint) errbin,
        |    cast(count(*) as bigint) n_pairs,
        |    cast(sum(cast(round(abs(jest - jexact) * 1e9) as bigint))
        |      as bigint) errq
        |  from est group by 1),
        |tot as (select cast(sum(n_pairs) as bigint) np,
        |    cast(sum(errq) as bigint) eq from binned)
        |select round(cast(errbin as double) / 20, 2) abs_err_bin_lo,
        |  n_pairs,
        |  round(cast(n_pairs as double) / np, 4) bin_share,
        |  round(cast(eq as double) / 1e9 / np, 6) mean_abs_err
        |from binned cross join tot
        |order by abs_err_bin_lo""".stripMargin)
}
