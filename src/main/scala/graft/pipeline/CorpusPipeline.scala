package graft.pipeline

import graft.ops.{Dedup, Sampling}
import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-stage surviving-document counts from a pipeline run. */
case class PipelineReport(
    input: Long, afterScrub: Long, afterLang: Long, afterQuality: Long,
    afterExactDedup: Long, afterNearDedup: Long, output: Long)

/** End-to-end training-corpus preparation: the individual operators
  * (each independently DuckDB-oracled — see ExtensionQueries) composed
  * into the standard cleaning funnel:
  *
  *   scrub → language filter → quality filter → exact dedup →
  *   MinHash near-dedup → optional per-language cap
  *
  * Every stage is a narrow projection or an already-scale-proven op, so
  * the whole funnel is one logical plan per stage boundary with no
  * driver-side data movement; counts for the report are the only
  * actions. Near-dup removal keeps the smallest doc_id of each
  * candidate pair (greedy by pair, which removes at least one of every
  * duplicate pair; transitive clusters lose all but their minimum
  * member as long as the cluster is pairwise-similar, the common case
  * for crawl duplicates).
  */
class CorpusPipeline(
    val languages: Set[String] = Set.empty, // empty = keep all
    val minQuality: Double = 0.0,
    val nearDupThreshold: Double = 0.5,
    val capPerLanguage: Option[Int] = None) extends Serializable {

  def run(documents: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): (DataFrame, PipelineReport) = {
    val input = documents.count()

    val scrubbed = documents
      .withColumn(textCol, TextAnalysis.scrub(col(textCol)))
    val afterScrub = input // scrub is 1:1, no rows dropped

    val withLang = scrubbed
      .withColumn("__lang", TextAnalysis.langId(col(textCol)))
    val langFiltered =
      if (languages.isEmpty) withLang
      else withLang.filter(col("__lang").isin(languages.toSeq: _*))
    val afterLang = langFiltered.count()

    val scored = TextAnalysis.qualityFeatures(langFiltered, textCol)
      .filter(col("quality") >= minQuality)
    val afterQuality = scored.count()

    val keeperIds = Dedup.exactAssignKeepers(scored, idCol, textCol)
      .filter(!col("is_dup"))
      .select(idCol)
    val exactKept = scored.join(keeperIds, Seq(idCol), "left_semi")
    val afterExact = exactKept.count()

    val dupIds = Dedup.minhashNearDupPairsFromSets(
        exactKept, idCol, array_distinct(split(col(textCol), " ")),
        threshold = nearDupThreshold, bands = 64, rowsPerBand = 2)
      .select(col("id_b").as(idCol)) // drop the larger id of each pair
      .distinct()
    val nearKept = exactKept.join(dupIds, Seq(idCol), "left_anti")
    val afterNear = nearKept.count()

    val out = capPerLanguage match {
      case Some(k) => Sampling.stratifiedK(nearKept, col("__lang"), col(idCol), k)
      case None => nearKept
    }
    val outCount = out.count()

    (out, PipelineReport(input, afterScrub, afterLang, afterQuality,
      afterExact, afterNear, outCount))
  }
}
