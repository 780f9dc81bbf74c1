package graft.queries

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan quality gates (SURVEY §4): these are the properties
  * that keep the engine viable at 100 TB — filters reaching the parquet
  * scan, scans pruned to referenced columns, small dims broadcast, and
  * top-k planned without a global sort. A correctness-green query that
  * regresses one of these is a scale bug; this spec pins them.
  */
class PlanQualitySpec extends AnyFunSuite with SparkFixture {

  private def executedPlanString(df: DataFrame): String = {
    df.collect() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan
    val finalPlan = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p: SparkPlan => p
    }
    finalPlan.toString
  }

  test("B1: shipdate filter is pushed to the parquet scan, columns pruned") {
    val df = ContractQueries.b1(spark, sf001)
    val s = executedPlanString(df)
    assert(s.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"no pushed filter in:\n${s.take(2000)}")
    // scan must read only the 7 referenced columns, not all 16
    val readSchema = "ReadSchema: [^\n]+".r.findFirstIn(s).getOrElse("")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_partkey"),
      s"column pruning failed: $readSchema")
  }

  // join-strategy and projection assertions use the pre-AQE sparkPlan:
  // the AQE-final toString collapses nested query stages and hides
  // operators from naive string matching
  test("B2: nation and region join via broadcast, not shuffle") {
    val s = ContractQueries.b2(spark, sf001).queryExecution.sparkPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(s).length >= 2,
      s"expected >=2 broadcast joins:\n${s.take(2000)}")
    assert(s.contains("EqualTo(r_name,ASIA)"),
      s"r_name filter not pushed to region scan:\n${s.take(2000)}")
  }

  test("B3: top-k plans as TakeOrderedAndProject (no global sort)") {
    val s = executedPlanString(ContractQueries.b3(spark, sf001))
    assert(s.contains("TakeOrderedAndProject"), s"no top-k operator:\n${s.take(2000)}")
  }

  test("Q19: JSON filter prunes events scan to 2 columns") {
    val s = executedPlanString(ContractQueries.q19(spark, sf001))
    val readSchema = "ReadSchema: [^\n]+".r.findFirstIn(s).getOrElse("")
    assert(readSchema.contains("event_id") && readSchema.contains("props"))
    assert(!readSchema.contains("user_id") && !readSchema.contains("value"),
      s"events scan not pruned: $readSchema")
  }

  test("B1/B8: aggregations are two-phase (partial before shuffle)") {
    for (q <- Seq(ContractQueries.b1(spark, sf001), ContractQueries.b8(spark, sf001))) {
      val s = executedPlanString(q)
      assert("HashAggregate".r.findAllIn(s).length >= 2,
        s"no partial aggregation:\n${s.take(1500)}")
    }
  }

  test("Q53 lateral top-1 decorrelates to a join, not a nested loop") {
    val s = executedPlanString(ContractQueries2.q53Lateral(spark, sf001))
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      s"lateral subquery did not decorrelate:\n${s.take(2000)}")
  }

  test("Q40 pivot plans as a single two-phase aggregate (no per-value scans)") {
    val df = ContractQueries2.q40Pivot(spark, sf001)
    val s = executedPlanString(df)
    assert("FileScan".r.findAllIn(s).length == 1,
      s"pivot re-scanned the input:\n${s.take(2000)}")
    assert("HashAggregate".r.findAllIn(s).length >= 2, "pivot aggregate not two-phase")
  }

  test("Q52 hash sampling stays a scan+filter (no shuffle, pruned columns)") {
    val df = ContractQueries2.q52Sample(spark, sf001)
    val s = df.queryExecution.sparkPlan.toString
    assert(!s.contains("Exchange") || s.contains("rangepartitioning"),
      s"sampling introduced a non-sort shuffle:\n${s.take(2000)}")
    val readSchema = "ReadSchema: [^\n]+".r.findFirstIn(s).getOrElse("")
    assert(!readSchema.contains("c_acctbal") && !readSchema.contains("c_name"),
      s"sampling scan not pruned: $readSchema")
  }

  test("Q61 supplier/nation dims broadcast onto the lineitem scan") {
    val s = ContractQueries2.q61Supplier(spark, sf001).queryExecution.sparkPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(s).length >= 2,
      s"expected 2 broadcast joins:\n${s.take(2000)}")
  }

  test("decontamination: the eval n-gram set broadcasts onto the training explode") {
    val s = graft.ops.ExtensionQueries2.extDecontaminate(spark, sf001)
      .queryExecution.sparkPlan.toString
    assert(s.contains("BroadcastHashJoin") && s.contains("LeftSemi"),
      s"expected broadcast LEFT SEMI on the eval side:\n${s.take(2000)}")
  }

  test("mixture resampling: the quota table broadcasts") {
    val s = graft.ops.ExtensionQueries2.extMixture(spark, sf001)
      .queryExecution.sparkPlan.toString
    assert(s.contains("BroadcastHashJoin"),
      s"expected the per-domain quota table to broadcast:\n${s.take(2000)}")
  }

  test("umbrella: no CartesianProduct/BroadcastNestedLoopJoin in any query plan " +
      "outside the documented probe/all-pairs patterns") {
    // Allowlisted queries deliberately contain a nested-loop stage, each
    // of a scale-safe shape — the broadcast side is O(1) rows or an
    // explicitly-small probe/model table, never a second fact table:
    val allow = Set(
      "b10",                  // probe pattern: corpus × broadcast(5 probes)
      "ext_embed_topk",       // brute-force baseline, same probe pattern
      "ext_ann_recall",       // brute-force oracle + 1-row agg × 1-row agg
      "ext_ivf_topk",         // corpus × broadcast(16 centroids)
      "ext_semdedup",         // corpus × broadcast(8 centroids), then
                              // equi-join on cid — the SemDeDup shape
      "ext_sim_pairs_allpairs", // all-pairs ORACLE pin (production path
                                // ext_sim_pairs is blocked, no BNLJ)
      "q29",                  // tf × broadcast(1-row total-doc count)
      "ext_lm_score",         // tokens × broadcast(1-row total-count)
      "ext_sparse_cos",       // tf × broadcast(1-row corpus count); the
                              // pair join itself is an equi-join on token
      "ext_basket",           // rules × broadcast(1-row basket count);
                              // pair expansion is an equi-join on basket
      "ext_bm25",             // tf × broadcast(1-row corpus stats)
      "ext_rrf",              // inherits ext_bm25's 1-row stats broadcast
      "ext_auc",              // corpus × broadcast(1-row centroid)
      "ext_calibration",      // same scored set as ext_auc — 1-row centroid
      "ext_subsample",        // tokens × broadcast(1-row corpus total)
      "ext_ndcg",             // corpus × broadcast(6 probes) — the
                              // ext_embed_topk probe pattern
      "ext_ctfidf",           // tf × broadcast(1-row group count)
      "ext_tfidf_topk",       // tf × broadcast(1-row total-doc count)
      "ext_burstiness",       // per-token stats × broadcast(1-row doc count)
      "ext_fkaudit",          // per-edge 1-row total × 1-row orphan count
      "ext_bootstrap",        // 1-row full mean × 1-row CI aggregate
      "ext_gains",            // ext_auc's 1-row centroid broadcast
      "ext_conformal",        // 1-row OLS fit + 1-row q-hat broadcasts
      "ext_jsd",              // token counts × broadcast(1-row totals)
      "ext_theil",            // balances × broadcast(1-row mean)
      "ext_cramersv",         // dim-grid cross (5×20 categorical dims)
                              // + broadcast(1-row n/r/c totals)
      "ext_g2",               // token counts × broadcast(1-row totals)
      "ext_knn_purity",       // rides ext_embed_topk's corpus ×
                              // broadcast(25 probes) brute-force pattern
      "ext_liftmatrix",       // cells × broadcast(1-row grand total)
      "ext_runstest",         // day series × broadcast(1-row median)
      "ext_abc",              // ranked parts × broadcast(1-row total)
      "ext_xmr",              // day series × broadcast(1-row mean/MR̄)
      "ext_kmv",              // 1-row exact × 1-row k-th-min hash
      "ext_kendall",          // day-pair join: O(calendar²), fact table
                              // pre-collapsed to the day series
      "ext_hellinger",        // dims-grid spine (sources × langs) +
                              // broadcast(1-row corpus total)
      "ext_convlat",          // 1-row signup count × 1-row latency agg
      "ext_transentropy",     // ≤25 transition cells × broadcast(1-row total)
      "ext_theilsen",         // day-pair slopes (O(calendar²)) + day
                              // series × broadcast(1-row median slope)
      "ext_mannkendall",      // day-pair signs + three 1-row aggregates
      "ext_wilson",           // 5 type counts × broadcast(1-row total)
      "ext_targetenc",        // 5 segment rows × broadcast(1-row prior)
      "ext_sax",              // day series × broadcast(1-row moments)
      "ext_brier",            // scan × broadcast(1-row global train rate)
                              // + ≤101 bins × broadcast(1-row totals)
      "ext_binseg",           // day-series prefix sums × broadcast(1-row
                              // totals); O(calendar) candidates
      "ext_coverage",         // vocab ranks × broadcast(1-row totals)
      "ext_var",              // day deltas × broadcast(1-row VaR cut)
      "ext_embnorm",          // norms × broadcast(1-row percentile stats)
      "ext_bloomfpr",         // three 1-row count aggregates crossed
      "ext_consistenthash",   // keys × broadcast(128-row ring) + 1-row wrap
      "ext_simpson",          // 25 brand slopes × broadcast(1-row pooled)
      "ext_mrr",              // ext_ndcg's corpus × broadcast(6 probes)
      "ext_preck",            // same probe pattern × broadcast(4-row k-spine)
      "ext_rbo",              // ext_rrf's 1-row stats + 50-row depth spine
                              // × ≤50-row rank-overlap frame
      "ext_bhfdr",            // 25 nation rows × broadcast(1-row global
                              // moments + 1-row BH cut)
      "ext_tclose",           // 125 QI groups × broadcast(≤10-row bucket
                              // spine) + 1-row total
      "ext_nulldrift",        // 1-row column-null agg × 1-row agg
      "ext_kmvset",           // 64-row sketch / 1-row exact-count crosses
      "ext_fellegi",          // 1-row m-rates agg × 1-row u-rates agg
      "ext_hurst",            // day series × broadcast(4-row block-size
                              // spine) + 1-row OLS fit
      "ext_anova",            // 5-group moments × broadcast(1-row totals)
      "ext_kruskal",          // 5-group rank sums × 1-row n / tie terms
      "ext_levene",           // 5-group z-moments × broadcast(1-row totals)
      "ext_cohend",           // 5×5 group-pair theta join (10 pairs)
      "ext_minhashacc",       // tokens × broadcast(16-row permutation
                              // spine) — the signature build
      "ext_backlog",          // day series × broadcast(1-row capacity)
      "ext_concurrency",      // 1-row session agg × 1-row sweep peak
      "ext_closure",          // three 1-row graph-stat aggregates crossed
      "ext_prcurve",          // ext_auc's 1-row centroid broadcast +
                              // 10-row threshold spine
      "ext_balance",          // per-label ranks × broadcast(1-row n_min)
      "ext_sprt",             // 1-row walk end × 1-row first-crossing agg
      "ext_powercurve",       // 5-row k spine × broadcast(1-row SE)
      "ext_dw",               // day series × broadcast(1-row OLS moments)
      "ext_ransac",           // day series × broadcast(20 candidate lines)
      "ext_segreg",           // prefix moments × broadcast(1-row totals)
      "ext_periodogram",      // day series × broadcast(13-row period spine)
      "ext_abcxyz",           // 25 brand rows × broadcast(1-row total)
      "ext_labelnoise",       // vec_id<300 audit-slice all-pairs — the
                              // sim_pairs_allpairs oracle discipline
      "ext_richclub",         // degrees × broadcast(4-row k spine)
      "ext_ht",               // orders × broadcast(1-row total) coin
      "ext_neyman",           // 5 strata × broadcast(1-row totals)
      "ext_stratadj",         // 1-row adj agg × 1-row overall means
      "ext_did",              // single wide 1-row cell pivot (no join)
      "ext_rdd",              // 1-row below fit × 1-row above fit
      "ext_drawdown",         // day series × broadcast(1-row totals/worst)
      "ext_threshcurve",      // audit pairs × broadcast(9-row tau spine)
      "ext_moran",            // 25 nations × broadcast(1-row totals)
      "ext_journeydist",      // ~15-user journey-string all-pairs
      "ext_icc",              // 1-row between-groups agg × 1-row totals
      "ext_stopdisc",         // token stats × broadcast(1-row doc count)
      "ext_modularity",       // 25 brand rows × broadcast(1-row edge count)
      "ext_eventstudy",       // day series × broadcast(20-row candidate
                              // spine) + 1-row true-lift broadcast
      "ext_attrwindow",       // viewer rows × broadcast(4-row window spine)
      "ext_nbayes",           // 5-value feature maps × broadcast(1-row priors)
      "ext_costthresh",       // ext_auc's centroid + 20-row threshold spine
                              // + 1-row argmin broadcast
      "ext_bandtune")         // audit pairs × broadcast(4-row config spine)
    // (ext_bloom_join needs no allowlisting: the Bloom bits enter the
    // fact-side predicate as a literal, so there is no join node at all
    // on the prefilter path.)
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val s = q(spark, sf001).queryExecution.sparkPlan.toString
        val hits = Seq("CartesianProduct", "BroadcastNestedLoopJoin").filter(s.contains)
        if (hits.nonEmpty && !allow(name)) Some(s"$name(${hits.mkString("+")})") else None
    }
    assert(offenders.isEmpty,
      s"scale-unsafe join shapes in: ${offenders.mkString(", ")}")
  }

  test("round-4 operators keep scale-safe join shapes") {
    // ext_phrase: k-term phrase = exactly k−1 keyed joins over pruned
    // postings — never a nested loop
    val phrase = graft.ops.ExtensionQueries2.extPhrase(spark, sf001)
      .queryExecution.sparkPlan.toString
    val joinCount = Seq("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
      .map(j => j.r.findAllIn(phrase).length).sum
    assert(joinCount == 2, s"3-term phrase should plan 2 keyed joins, got $joinCount")
    assert(!phrase.contains("BroadcastNestedLoopJoin"))
    // ext_geo_join: the candidate side broadcasts; the join is ON THE
    // CELL (equi), haversine evaluated post-join
    val geo = graft.ops.ExtensionQueries2.extGeoJoin(spark, sf001)
      .queryExecution.sparkPlan.toString
    assert(geo.contains("BroadcastHashJoin"),
      s"supplier cells should broadcast:\n${geo.take(1500)}")
    assert(!geo.contains("CartesianProduct") && !geo.contains("BroadcastNestedLoopJoin"),
      "geo join must stay cell-blocked, never a cross product")
    // ext_pmi: both vocabulary probability joins broadcast
    val pmi = graft.ops.ExtensionQueries2.extPmi(spark, sf001)
      .queryExecution.sparkPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(pmi).length >= 2,
      s"unigram tables should broadcast twice:\n${pmi.take(1500)}")
    // ext_tablediff: version diff is ONE full-outer keyed join
    val diff = graft.ops.ExtensionQueries2.extTableDiff(spark, sf001)
      .queryExecution.sparkPlan.toString
    assert(diff.contains("FullOuter"), "diff must plan a full-outer join")
  }

  test("B10 native cosine is in the plan; codegen compiles it in a projection") {
    val df = ContractQueries.b10(spark, sf001)
    val s = df.queryExecution.sparkPlan.toString
    assert(s.contains("cosine_sim"), s"native expression missing from plan:\n${s.take(1500)}")
    // b10's expression sits inside TakeOrderedAndProject (expression-level
    // codegen); prove doGenCode also runs inside a WholeStageCodegen span
    // with a plain projection query
    graft.functions.GraftFunctions.register(spark)
    val proj = Tables.table(spark, sf001, "embeddings")
      .selectExpr("cosine_sim(embedding, embedding) c")
    val codegen = proj.queryExecution.explainString(
      org.apache.spark.sql.execution.CodegenMode)
    assert(codegen.contains("WholeStageCodegen") && codegen.contains("cosine_sim"),
      "cosine_sim not compiled into a codegen stage")
    assert(proj.collect().forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }
}
