package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 extension queries, batch 94: compressed-domain ANN and
  * phonetic blocking — product quantization (the memory-side scaling
  * lever the IVF/LSH family doesn't cover: the corpus is searched as
  * m small ints per vector, not d floats) and Soundex blocking for
  * phonetic entity resolution.
  */
object ExtensionQueries94 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-423 product-quantization ADC self-recall --------------------------------
  // PQ (ops.Pq): 4 subspaces × 16 centroids over the 64-dim embedding
  // column, deterministic subspace k-means (2 Lloyd steps), ADC search
  // for the 10 planted probes (probe = a corpus vector). The gate is
  // the ADC lower-bound property made executable: for probe q with its
  // own codes c(q), adc(q, q) = Σ_s min_c ||q_s − c||² ≤ adc(q, y) for
  // EVERY y — so the probe's own vector must sit at the exact minimum
  // ADC distance (ties allowed; the quantized-long comparison makes
  // the check bit-stable). A broken codebook (non-argmin assignment,
  // subspace misalignment, table/code key mismatch) breaks the
  // invariant immediately. The oracle pins the invariant's truth.
  def extPq(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val m = 4; val subDim = 16
    val codebooks = Pq.trainCodebooks(emb, m, k = 16, subDim, iters = 2)
    val codes = Pq.encode(emb, codebooks, m, subDim)
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding"))
      .limit(16) // structural bound for the broadcast table build
    Pq.adcDistances(probes, codes, codebooks, m, subDim)
      .groupBy("probe_id")
      .agg(min(col("adq")).as("min_adq"),
        min(when(col("vec_id") === col("probe_id"), col("adq"))).as("own_adq"),
        count(lit(1)).as("n_candidates"))
      .select(col("probe_id"),
        (col("own_adq") === col("min_adq")).as("self_at_min"))
      .orderBy("probe_id")
  }

  // ---- E-424 Soundex phonetic blocking --------------------------------------------
  // Entity-resolution blocking by PHONETIC key: group the corpus token
  // vocabulary by American Soundex code — candidate pairs for fuzzy
  // matching are generated within a block, never across, turning an
  // O(V²) fuzzy-match into Σ_b O(|b|²) like every other blocked join
  // in the engine (LSH bands, simhash segments, SNM windows). Spark's
  // codegen'd `soundex` builtin on one side; the oracle REPLICATES the
  // algorithm in portable SQL (char mapping, H/W-transparent
  // adjacent-code collapse, vowel reset, 3-digit zero pad) — a
  // cross-engine parity gate like ext_jaro's, but with the reference
  // implementation spelled out rather than built in.
  def extSoundex(s: SparkSession, dir: String): DataFrame = {
    val words = t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n_occ"))
    words
      .withColumn("sx", soundex(upper(col("w"))))
      .groupBy("sx")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_occ")).as("n_occurrences"),
        array_join(slice(array_sort(collect_list(col("w"))), 1, 8), ",")
          .as("block_words"))
      .orderBy(desc("n_words"), asc("sx"))
      .limit(30)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_pq" -> (extPq _),
    "ext_soundex" -> (extSoundex _))

  val oracleSql: Map[String, String] = Map(
    // E-423: the ADC lower-bound invariant is TRUE by construction —
    // the oracle pins it (the ext_ann_recall pinned-expectation
    // discipline; DuckDB cannot re-run the quantizer, it asserts the
    // contract the Spark side must meet).
    "ext_pq" ->
      """select vec_id probe_id, true self_at_min
        |from embeddings where vec_id < 10
        |order by probe_id""".stripMargin,

    // E-424: full American-Soundex replication in portable SQL:
    // uppercase chars → digit classes (B F P V→1, C G J K Q S X Z→2,
    // D T→3, L→4, M N→5, R→6, vowels/Y→0 which RESETS the duplicate
    // chain, H/W dropped as TRANSPARENT), adjacent-duplicate collapse
    // via lag over the surviving sequence, first letter + first three
    // non-zero codes after position 1, zero-padded.
    "ext_soundex" ->
      """with words as (select u.w, count(*) n_occ from (
        |    select unnest(string_split(text, ' ')) w from documents) u
        |  where u.w <> '' group by u.w),
        |ch as (select w, i, upper(substr(w, i, 1)) c
        |  from words, unnest(generate_series(1, length(w))) t(i)),
        |coded as (select w, i, c,
        |    case when c in ('B','F','P','V') then '1'
        |         when c in ('C','G','J','K','Q','S','X','Z') then '2'
        |         when c in ('D','T') then '3'
        |         when c = 'L' then '4'
        |         when c in ('M','N') then '5'
        |         when c = 'R' then '6'
        |         when c in ('A','E','I','O','U','Y') then '0'
        |         else null end code
        |  from ch),
        |seq as (select w, i, code,
        |    lag(code) over (partition by w order by i) prev
        |  from coded where code is not null),
        |digits as (select w, i, code from seq
        |  where i > 1 and code <> '0' and (prev is null or code <> prev)),
        |agg as (select w.w, w.n_occ,
        |    upper(substr(w.w, 1, 1)) ||
        |      substr(coalesce(string_agg(d.code, '' order by d.i), '')
        |        || '000', 1, 3) sx
        |  from words w left join digits d on w.w = d.w
        |  group by w.w, w.n_occ)
        |select sx, cast(count(*) as bigint) n_words,
        |  cast(sum(n_occ) as bigint) n_occurrences,
        |  array_to_string(list_sort(list(w))[1:8], ',') block_words
        |from agg group by sx
        |order by n_words desc, sx limit 30""".stripMargin)
}
