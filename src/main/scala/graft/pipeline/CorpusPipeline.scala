package graft.pipeline

import graft.ops.{ConnectedComponents, Dedup, Sampling}
import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Per-stage surviving-document counts from a pipeline run.
  * afterLm == afterQuality when the LM filter is disabled.
  */
case class PipelineReport(
    input: Long, afterScrub: Long, afterLang: Long, afterQuality: Long,
    afterLm: Long, afterExactDedup: Long, afterNearDedup: Long, output: Long)

/** End-to-end training-corpus preparation: the individual operators
  * (each independently DuckDB-oracled — see ExtensionQueries) composed
  * into the standard cleaning funnel:
  *
  *   scrub → language filter → quality filter → optional LM filter →
  *   exact dedup → MinHash near-dedup → optional per-language cap
  *
  * The LM stage is the CCNet-style perplexity cut at order 1: docs whose
  * mean −ln p(token) under the corpus' own unigram distribution exceeds
  * `maxLmScore` (rare-token soup, boilerplate noise) are dropped. It
  * reads the already-persisted `scored` cache twice (once for the count
  * table, once for the join) — no funnel recompute.
  *
  * Every stage is a narrow projection or an already-scale-proven op.
  * Near-dup removal is cluster-based: qualifying pairs become edges,
  * ConnectedComponents labels each duplicate cluster with its minimum
  * doc_id, and every non-minimum member is dropped — so transitive
  * chains (a~b, b~c with a≁c) still collapse to one representative,
  * which greedy pair-dropping only guarantees for pairwise-similar
  * cliques.
  *
  * Stage counts for the report ride the three real passes as
  * `Observation` (CollectMetrics) aggregates — they cost zero extra
  * jobs — and the stage boundaries are persisted in a hand-over-hand
  * chain so every stage of the funnel executes exactly once:
  *
  *   action 1  scored.count()    runs scrub+langid+quality ONCE into the
  *                               cache and resolves the input/afterLang
  *                               observations on the way;
  *   action 2  exactKept.count() runs the exact-dedup join ONCE off that
  *                               cache into its own cache (then scored
  *                               is released);
  *   action 3  out.count()       runs near-dedup + cap ONCE off the
  *                               exactKept cache into the output cache,
  *                               resolving the afterNearDedup observation
  *                               on the way (then exactKept is released).
  *
  * (The first cut of this pipeline issued five uncached count() actions,
  * which re-executed the whole upstream funnel per stage — the near-dup
  * join alone ran twice, and at 100 TB the multiplier applies to the
  * dominant scrub/langid/quality cost. CorpusPipelineSpec now pins
  * exactly-once execution of the text stages with a row-level
  * accumulator; PerfLab carries the A/B against the naive-count form.)
  *
  * The returned DataFrame is persisted and already materialized — use it
  * (typically `out.write...`) and call `out.unpersist()` when done; no
  * intermediate stays cached beyond run().
  */
class CorpusPipeline(
    val languages: Set[String] = Set.empty, // empty = keep all
    val minQuality: Double = 0.0,
    val maxLmScore: Option[Double] = None, // None = LM filter off
    val nearDupThreshold: Double = 0.5,
    val capPerLanguage: Option[Int] = None) extends Serializable {

  def run(documents: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): (DataFrame, PipelineReport) = {
    val obsInput = Observation()
    val obsLang = Observation()
    val obsNear = Observation()

    val scrubbed = documents
      .observe(obsInput, count(lit(1)).as("n"))
      .withColumn(textCol, TextAnalysis.scrub(col(textCol)))

    val withLang = scrubbed
      .withColumn("__lang", TextAnalysis.langId(col(textCol)))
    val langFiltered =
      if (languages.isEmpty) withLang
      else withLang.filter(col("__lang").isin(languages.toSeq: _*))

    val scored = TextAnalysis.qualityFeatures(
        langFiltered.observe(obsLang, count(lit(1)).as("n")), textCol)
      .filter(col("quality") >= minQuality)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val afterQuality = scored.count() // action 1
    val input = obsInput.get("n").asInstanceOf[Long]
    val afterScrub = input // scrub is 1:1, no rows dropped
    val afterLang = obsLang.get("n").asInstanceOf[Long]

    // LM stage joins the funnel's hand-over-hand persist chain: the
    // dedup stages below reference lmKept TWICE (keeper derivation +
    // semi-join), so when the filter is on, lmKept gets its own cache +
    // count action — otherwise the LM aggregate and join would run
    // twice, the recompute amplification this pipeline exists to avoid.
    val (lmKept, afterLm) = maxLmScore match {
      case Some(maxS) =>
        val keep = TextAnalysis.unigramLogScore(scored, idCol, textCol)
          .filter(col("lm_score") <= maxS)
          .select(idCol)
        val k = scored.join(keep, Seq(idCol), "left_semi")
          .persist(StorageLevel.MEMORY_AND_DISK)
        val n = k.count() // action 1b: LM agg + join once, off the scored cache
        (k, n)
      case None => (scored, afterQuality)
    }

    val keeperIds = Dedup.exactAssignKeepers(lmKept, idCol, textCol)
      .filter(!col("is_dup"))
      .select(idCol)
    val exactKept = lmKept.join(keeperIds, Seq(idCol), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val afterExact = exactKept.count() // action 2
    scored.unpersist()
    if (!(lmKept eq scored)) lmKept.unpersist()

    // cluster the near-dup graph at SET level (never expanded member
    // pairs — measured 7x funnel wall-time at sf0.1 otherwise); drop
    // every non-minimum cluster member. components() eagerly
    // checkpoints, so the anti-join below never re-derives the funnel.
    val dupIds = Dedup.nearDupComponents(
        exactKept, idCol, array_distinct(split(col(textCol), " ")),
        threshold = nearDupThreshold, bands = 64, rowsPerBand = 2)
      .filter(col(idCol) =!= col("component"))
      .select(idCol)
    val nearKept = exactKept.join(dupIds, Seq(idCol), "left_anti")
      .observe(obsNear, count(lit(1)).as("n"))

    val out = (capPerLanguage match {
      case Some(k) => Sampling.stratifiedK(nearKept, col("__lang"), col(idCol), k)
      case None => nearKept
    }).persist(StorageLevel.MEMORY_AND_DISK)
    val outCount = out.count() // action 3
    val afterNear = obsNear.get("n").asInstanceOf[Long]
    exactKept.unpersist()

    (out, PipelineReport(input, afterScrub, afterLang, afterQuality,
      afterLm, afterExact, afterNear, outCount))
  }
}
