package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 14: dedup/similarity adjuncts —
  * cross-language set-duplicate detection, kNN label purity as an
  * embedding-quality gauge, n-gram novelty vs the id-ordered prefix
  * corpus, and a shard-assignment balance audit.
  */
object ExtensionQueries14 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** 60-bit always-positive sha256-derived long — the house portable
    * hash (Dedup.scala simhashPortable); DuckDB spells it
    * `('0x'||substr(sha256(x),1,15))::bigint`.
    */
  private def h60(c: org.apache.spark.sql.Column) =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  // ---- E-165 cross-language set duplicates ---------------------------------------
  // Documents whose TOKEN SET collides across languages — the
  // contamination mode exact dedup (byte-equal, E-1) misses and
  // near-dup scoring over-reports: translated/templated docs share the
  // vocabulary-set fingerprint (ext_fingerprint's sha256-of-sorted-set)
  // while differing byte-wise. One hash groupBy; members emitted as
  // sorted CSVs so the whole cluster is hash-gated.
  def extCrossLangDup(s: SparkSession, dir: String): DataFrame = {
    val fp = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        sha2(concat_ws(" ",
          array_sort(array_distinct(
            filter(split(col("text"), " "), x => x =!= lit(""))))), 256).as("fp"))
    fp.groupBy("fp")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("lang").as("n_langs"),
        concat_ws(",", sort_array(collect_list(col("doc_id")))).as("docs"),
        concat_ws(",", sort_array(collect_set(col("lang")))).as("langs"))
      .filter(col("n_docs") > 1 && col("n_langs") > 1)
      .orderBy("fp")
  }

  // ---- E-166 kNN label purity ----------------------------------------------------
  // Share of each probe's top-5 cosine neighbors that carry the probe's
  // label — the classifier-free embedding-quality gauge (a good space
  // keeps neighborhoods label-pure). Rides the hash-green brute-force
  // top-k (E-5): same broadcast-probe pattern, labels joined on both
  // ends, integer agreement counts.
  def extKnnPurity(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val labels = emb.select(col("vec_id"), col("label"))
    val knn = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 25).limit(25), k = 5)
    knn
      .join(labels.select(col("vec_id").as("probe_id"), col("label").as("probe_label")),
        "probe_id")
      .join(labels.select(col("vec_id"), col("label").as("nbr_label")), "vec_id")
      .groupBy("probe_id")
      .agg(max("probe_label").as("label"),
        sum(when(col("nbr_label") === col("probe_label"), 1L).otherwise(0L))
          .as("n_same"))
      .select(col("probe_id"), col("label"), col("n_same"),
        round(col("n_same").cast("double") / 5, 6).as("purity"))
      .orderBy("probe_id")
  }

  // ---- E-167 n-gram novelty vs prefix corpus -------------------------------------
  // For each doc: the share of its distinct token-trigrams never seen
  // in any SMALLER doc_id — the novelty curve an incremental-ingest
  // dedup pipeline watches to decide when a source has gone stale.
  // First-occurrence via one min(doc_id) aggregate per gram (no
  // quadratic prefix join), then an equi join back onto per-doc gram
  // sets.
  def extNovelty(s: SparkSession, dir: String): DataFrame = {
    val wDoc = Window.partitionBy("doc_id").orderBy("i")
    val grams = t(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(filter(split(col("text"), " "), x => x =!= lit("")))
          .as(Seq("i", "tok")))
      .withColumn("t2", lead("tok", 1).over(wDoc))
      .withColumn("t3", lead("tok", 2).over(wDoc))
      .filter(col("t3").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("tok"), col("t2"), col("t3")).as("gram"))
      .distinct()
    val firstSeen = grams.groupBy("gram").agg(min("doc_id").as("first_doc"))
    grams.join(firstSeen, "gram")
      .filter(col("doc_id") < 100)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_grams"), 6).as("novelty"))
      .orderBy("doc_id")
  }

  // ---- E-168 shard-assignment balance audit --------------------------------------
  // Hash docs onto 16 shards (portable 60-bit sha256 mod 16) and report
  // each shard's size and skew vs the ideal — the pre-write check that
  // a partitioning key won't produce straggler files. The whole-table
  // window runs over the 16-row aggregate only.
  def extHashBalance(s: SparkSession, dir: String): DataFrame = {
    val sharded = t(s, dir, "documents")
      .select((h60(col("doc_id").cast("string")) % 16).as("shard"))
      .groupBy("shard").agg(count(lit(1)).as("n_docs"))
    val wAll = Window.partitionBy()
    sharded
      .select(col("shard"), col("n_docs"),
        round(col("n_docs").cast("double") /
          (sum("n_docs").over(wAll) / count(lit(1)).over(wAll)), 6).as("skew"))
      .orderBy("shard")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_crosslang_dup" -> (extCrossLangDup _),
    "ext_knn_purity" -> (extKnnPurity _),
    "ext_novelty" -> (extNovelty _),
    "ext_hashbalance" -> (extHashBalance _))

  val oracleSql: Map[String, String] = Map(
    "ext_crosslang_dup" ->
      """with f as (select doc_id, lang,
        |    sha256(array_to_string(list_sort(list_distinct(
        |      list_filter(string_split(text, ' '), t -> t <> ''))), ' ')) fp
        |  from documents)
        |select fp, count(*) n_docs, count(distinct lang) n_langs,
        |  array_to_string(list_sort(list(doc_id)), ',') docs,
        |  array_to_string(list_sort(list(distinct lang)), ',') langs
        |from f group by fp
        |having count(*) > 1 and count(distinct lang) > 1
        |order by fp""".stripMargin,

    "ext_knn_purity" ->
      """with e as (select vec_id, label, cast(embedding as double[]) v from embeddings),
        |p as (select vec_id probe_id, label probe_label, v pv from e where vec_id < 25),
        |sims as (select p.probe_id, p.probe_label, e.vec_id, e.label nbr_label,
        |  round(list_dot_product(e.v, p.pv)
        |    / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(p.pv, p.pv))), 4) sim
        |  from e cross join p where e.vec_id <> p.probe_id),
        |ranked as (select probe_id, probe_label, nbr_label,
        |  row_number() over (partition by probe_id order by sim desc, vec_id) rank
        |  from sims)
        |select probe_id, max(probe_label) as "label",
        |  cast(sum(case when nbr_label = probe_label then 1 else 0 end) as bigint) n_same,
        |  round(cast(sum(case when nbr_label = probe_label then 1 else 0 end) as double)
        |    / 5, 6) purity
        |from ranked where rank <= 5
        |group by probe_id order by probe_id""".stripMargin,

    "ext_novelty" ->
      """with l as (select doc_id,
        |    list_filter(string_split(text, ' '), w -> w <> '') tl from documents),
        |g as (select distinct doc_id, unnest(list_filter(list_transform(
        |    list_zip(tl, tl[2:], tl[3:]),
        |    p -> case when p[3] is null then null
        |      else p[1] || ' ' || p[2] || ' ' || p[3] end),
        |  v -> v is not null)) gram from l),
        |fs as (select gram, min(doc_id) first_doc from g group by gram)
        |select doc_id, count(*) n_grams,
        |  cast(sum(case when first_doc = doc_id then 1 else 0 end) as bigint) n_novel,
        |  round(cast(sum(case when first_doc = doc_id then 1 else 0 end) as double)
        |    / count(*), 6) novelty
        |from g join fs using(gram)
        |where doc_id < 100 group by doc_id order by doc_id""".stripMargin,

    "ext_hashbalance" ->
      """with sh as (select
        |    ('0x' || substr(sha256(cast(doc_id as varchar)), 1, 15))::bigint % 16 shard
        |  from documents),
        |agg as (select shard, count(*) n_docs from sh group by shard)
        |select shard, n_docs,
        |  round(cast(n_docs as double)
        |    / (sum(n_docs) over () / count(*) over ()), 6) skew
        |from agg order by shard""".stripMargin)
}
