package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 extension queries, batch 93: substring-granularity
  * duplication and reference-based text-eval metrics — the
  * training-data-quality surfaces a corpus pipeline runs AFTER
  * doc-level dedup: span-level contamination (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better",
  * measures duplication at the substring level, not the document
  * level) and candidate-vs-reference n-gram metrics (BLEU, Papineni
  * et al. 2002; ROUGE, Lin 2004) for eval-set scoring at corpus
  * scale.
  */
object ExtensionQueries93 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-420 cross-doc duplicated-span fraction -----------------------------------
  // Doc-level dedup misses PARTIAL duplication: a doc that shares half
  // its text with another survives every whole-doc hash. The
  // substring-level signal: the fraction of a doc's 5-gram positions
  // whose 5-gram also appears in ANOTHER doc. Suffix arrays give this
  // single-node; the Spark-native shape is a shingle inverted index —
  // explode positional 5-grams (linear), count DISTINCT docs per
  // 5-gram hash (one shuffle), join membership back (second shuffle),
  // aggregate per doc. No pair set is ever materialized: cost is
  // O(tokens), not O(docs²) — at 100 TB both shuffles key on the
  // 64-hex sha256 of the gram, uniformly distributed by construction
  // (no skew salting needed).
  def extDupspan(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 5)
    val grams = toks.select(col("doc_id"),
        posexplode(org.apache.spark.sql.functions.transform(
          sequence(lit(1), size(col("tk")) - 4),
          i => sha2(concat_ws(" ", slice(col("tk"), i, lit(5))), 256)))
          .as(Seq("pos", "g")))
    val shared = grams.groupBy("g")
      .agg(countDistinct(col("doc_id")).as("ndocs"))
      .filter(col("ndocs") >= 2)
      .select(col("g"), lit(1L).as("dup"))
    grams
      .join(shared, Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum(col("dup")), lit(0L)).as("n_dup"))
      .withColumn("dup_frac",
        round(col("n_dup").cast("double") / col("n_grams"), 6))
      .orderBy(desc("dup_frac"), desc("n_grams"), asc("doc_id"))
      .limit(40)
  }

  // ---- shared scaffolding for E-421/E-422 -----------------------------------------
  // Candidate/reference pairing contract: each doc is scored against
  // the NEXT doc of the same source (lead over doc_id) — a
  // deterministic, join-free pairing that exists at every fixture
  // scale. The metric kernels below are pairing-agnostic: at 100 TB
  // the pairs come from an upstream aligner (or the near-dup
  // candidate stream) and the per-pair n-gram relational algebra is
  // unchanged — explode n-grams, count per (pair, gram) on BOTH
  // sides, one equi-join on (pair, gram), clipped-overlap aggregate.
  // Linear in tokens, never quadratic in pairs.
  private def sourcePairs(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("tk"))
      .withColumn("ref_id", lead(col("doc_id"), 1).over(w))
      .withColumn("rtk", lead(col("tk"), 1).over(w))
      .filter(col("ref_id").isNotNull &&
        size(col("tk")) >= 2 && size(col("rtk")) >= 2)
      .select(col("doc_id").as("cand_id"), col("ref_id"),
        col("tk").as("ctk"), col("rtk"))
  }

  private def bigrams(c: Column): Column =
    zip_with(slice(c, lit(1), size(c) - 1), slice(c, lit(2), size(c) - 1),
      (a, b) => concat(a, lit(" "), b))

  /** Per-pair clipped n-gram overlap: Σ_gram min(candCount, refCount).
    * Pair identity is cand_id (each candidate has exactly one
    * reference under the lead pairing).
    */
  private def clipped(pairs: DataFrame, cGram: Column, rGram: Column): DataFrame = {
    val c = pairs.select(col("cand_id"), explode(cGram).as("g"))
      .groupBy("cand_id", "g").agg(count(lit(1)).as("nc"))
    val r = pairs.select(col("cand_id"), explode(rGram).as("g"))
      .groupBy("cand_id", "g").agg(count(lit(1)).as("nr"))
    c.join(r, Seq("cand_id", "g"))
      .groupBy("cand_id")
      .agg(sum(least(col("nc"), col("nr"))).as("ov"))
  }

  // ---- E-421 BLEU-2 ----------------------------------------------------------------
  // Sentence BLEU-2 per pair: modified (clipped) unigram/bigram
  // precisions, brevity penalty min(1, e^(1−r/c)), geometric mean.
  // Pairs with zero clipped overlap at either order score 0 by
  // contract (no smoothing — the integer numerators ride along so the
  // score is auditable). exp/sqrt are scalar per row (no cross-row
  // float fold), rounded to 4 digits.
  def extBleu(s: SparkSession, dir: String): DataFrame = {
    val pairs = sourcePairs(s, dir)
    val c1 = clipped(pairs, col("ctk"), col("rtk"))
      .withColumnRenamed("ov", "clip1")
    val c2 = clipped(pairs, bigrams(col("ctk")), bigrams(col("rtk")))
      .withColumnRenamed("ov", "clip2")
    pairs
      .select(col("cand_id"), col("ref_id"),
        size(col("ctk")).cast("long").as("c_len"),
        size(col("rtk")).cast("long").as("r_len"))
      .join(c1, Seq("cand_id"), "left")
      .join(c2, Seq("cand_id"), "left")
      .na.fill(0L, Seq("clip1", "clip2"))
      .withColumn("bp",
        least(lit(1.0), exp(lit(1.0) -
          col("r_len").cast("double") / col("c_len"))))
      .withColumn("bleu2", round(
        when(col("clip1") > 0 && col("clip2") > 0,
          col("bp") * sqrt(
            (col("clip1").cast("double") / col("c_len")) *
            (col("clip2").cast("double") / (col("c_len") - 1))))
          .otherwise(lit(0.0)), 4))
      .select(col("cand_id"), col("ref_id"), col("c_len"), col("r_len"),
        col("clip1"), col("clip2"), col("bleu2"))
      .orderBy(desc("bleu2"), desc("clip2"), asc("cand_id"))
      .limit(15)
  }

  // ---- E-422 ROUGE-1/2 recall ------------------------------------------------------
  // ROUGE-N = clipped n-gram overlap / reference n-gram count — the
  // recall twin of BLEU's precision, integer ratios end to end (the
  // only float is the final 6-digit display rounding of small-int
  // ratios, which never lands on the half grid for denominators
  // ≤ ~100: an exact decimal needs a 2^a·5^b denominator, and every
  // such value ≤ 100 terminates within 6 digits). Same pairing and
  // clipped-overlap kernel as E-421.
  def extRouge(s: SparkSession, dir: String): DataFrame = {
    val pairs = sourcePairs(s, dir)
    val c1 = clipped(pairs, col("ctk"), col("rtk"))
      .withColumnRenamed("ov", "ov1")
    val c2 = clipped(pairs, bigrams(col("ctk")), bigrams(col("rtk")))
      .withColumnRenamed("ov", "ov2")
    pairs
      .select(col("cand_id"), col("ref_id"),
        size(col("rtk")).cast("long").as("r1_total"),
        (size(col("rtk")) - 1).cast("long").as("r2_total"))
      .join(c1, Seq("cand_id"), "left")
      .join(c2, Seq("cand_id"), "left")
      .na.fill(0L, Seq("ov1", "ov2"))
      .withColumn("rouge1",
        round(col("ov1").cast("double") / col("r1_total"), 6))
      .withColumn("rouge2",
        round(col("ov2").cast("double") / col("r2_total"), 6))
      .select(col("cand_id"), col("ref_id"), col("ov1"), col("r1_total"),
        col("rouge1"), col("ov2"), col("r2_total"), col("rouge2"))
      .orderBy(desc("rouge2"), desc("rouge1"), asc("cand_id"))
      .limit(15)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_dupspan" -> (extDupspan _),
    "ext_bleu" -> (extBleu _),
    "ext_rouge" -> (extRouge _))

  val oracleSql: Map[String, String] = Map(
    // E-420: identical positional 5-grams (sha256 of the space-joined
    // slice), shared-gram membership, and per-doc fraction.
    "ext_dupspan" ->
      """with tk as (select doc_id, string_split(text, ' ') l
        |  from documents where len(string_split(text, ' ')) >= 5),
        |grams as (select doc_id, i,
        |    sha256(array_to_string(l[i:i+4], ' ')) g
        |  from tk, unnest(generate_series(1, len(l) - 4)) t(i)),
        |shared as (select g from grams group by g
        |  having count(distinct doc_id) >= 2)
        |select doc_id, cast(count(*) as bigint) n_grams,
        |  cast(sum(case when s.g is not null then 1 else 0 end) as bigint)
        |    n_dup,
        |  round(sum(case when s.g is not null then 1 else 0 end) /
        |    cast(count(*) as double), 6) dup_frac
        |from grams left join shared s using (g)
        |group by doc_id
        |order by dup_frac desc, n_grams desc, doc_id
        |limit 40""".stripMargin,

    // E-421: identical source-lead pairing, clipped counts, brevity
    // penalty and geometric mean.
    "ext_bleu" ->
      """with tk as (select doc_id, source, string_split(text, ' ') l
        |  from documents),
        |p as (select doc_id cand_id,
        |    lead(doc_id) over (partition by source order by doc_id) ref_id,
        |    l ctk,
        |    lead(l) over (partition by source order by doc_id) rtk
        |  from tk),
        |pairs as (select * from p
        |  where ref_id is not null and len(ctk) >= 2 and len(rtk) >= 2),
        |cu as (select cand_id, u.g, count(*) nc from pairs,
        |    unnest(ctk) u(g) group by 1, 2),
        |ru as (select cand_id, u.g, count(*) nr from pairs,
        |    unnest(rtk) u(g) group by 1, 2),
        |c1 as (select cand_id, cast(sum(least(nc, nr)) as bigint) clip1
        |  from cu join ru using (cand_id, g) group by 1),
        |cb as (select cand_id, ctk[i] || ' ' || ctk[i+1] g, count(*) nc
        |  from pairs, unnest(generate_series(1, len(ctk) - 1)) t(i)
        |  group by 1, 2),
        |rb as (select cand_id, rtk[i] || ' ' || rtk[i+1] g, count(*) nr
        |  from pairs, unnest(generate_series(1, len(rtk) - 1)) t(i)
        |  group by 1, 2),
        |c2 as (select cand_id, cast(sum(least(nc, nr)) as bigint) clip2
        |  from cb join rb using (cand_id, g) group by 1)
        |select cand_id, ref_id,
        |  cast(len(ctk) as bigint) c_len, cast(len(rtk) as bigint) r_len,
        |  cast(coalesce(clip1, 0) as bigint) clip1,
        |  cast(coalesce(clip2, 0) as bigint) clip2,
        |  round(case when coalesce(clip1, 0) > 0 and coalesce(clip2, 0) > 0
        |    then least(1.0, exp(1.0 - len(rtk) / cast(len(ctk) as double))) *
        |      sqrt((coalesce(clip1, 0) / cast(len(ctk) as double)) *
        |           (coalesce(clip2, 0) / cast(len(ctk) - 1 as double)))
        |    else 0.0 end, 4) bleu2
        |from pairs left join c1 using (cand_id) left join c2 using (cand_id)
        |order by bleu2 desc, clip2 desc, cand_id
        |limit 15""".stripMargin,

    // E-422: identical pairing and clipped overlaps, recall ratios.
    "ext_rouge" ->
      """with tk as (select doc_id, source, string_split(text, ' ') l
        |  from documents),
        |p as (select doc_id cand_id,
        |    lead(doc_id) over (partition by source order by doc_id) ref_id,
        |    l ctk,
        |    lead(l) over (partition by source order by doc_id) rtk
        |  from tk),
        |pairs as (select * from p
        |  where ref_id is not null and len(ctk) >= 2 and len(rtk) >= 2),
        |cu as (select cand_id, u.g, count(*) nc from pairs,
        |    unnest(ctk) u(g) group by 1, 2),
        |ru as (select cand_id, u.g, count(*) nr from pairs,
        |    unnest(rtk) u(g) group by 1, 2),
        |c1 as (select cand_id, cast(sum(least(nc, nr)) as bigint) ov1
        |  from cu join ru using (cand_id, g) group by 1),
        |cb as (select cand_id, ctk[i] || ' ' || ctk[i+1] g, count(*) nc
        |  from pairs, unnest(generate_series(1, len(ctk) - 1)) t(i)
        |  group by 1, 2),
        |rb as (select cand_id, rtk[i] || ' ' || rtk[i+1] g, count(*) nr
        |  from pairs, unnest(generate_series(1, len(rtk) - 1)) t(i)
        |  group by 1, 2),
        |c2 as (select cand_id, cast(sum(least(nc, nr)) as bigint) ov2
        |  from cb join rb using (cand_id, g) group by 1)
        |select cand_id, ref_id,
        |  cast(coalesce(ov1, 0) as bigint) ov1,
        |  cast(len(rtk) as bigint) r1_total,
        |  round(coalesce(ov1, 0) / cast(len(rtk) as double), 6) rouge1,
        |  cast(coalesce(ov2, 0) as bigint) ov2,
        |  cast(len(rtk) - 1 as bigint) r2_total,
        |  round(coalesce(ov2, 0) / cast(len(rtk) - 1 as double), 6) rouge2
        |from pairs left join c1 using (cand_id) left join c2 using (cand_id)
        |order by rouge2 desc, rouge1 desc, cand_id
        |limit 15""".stripMargin)
}
