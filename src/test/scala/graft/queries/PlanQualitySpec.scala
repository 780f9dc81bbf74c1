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

  /** Structural row-count bound for a physical subtree: Some(n) when
    * the subtree PROVABLY emits at most n rows at any data scale —
    * global (ungrouped) aggregates emit 1, LocalTableScan/Range are
    * literal, limits cap, and row-preserving/reducing single-child
    * nodes pass the child's bound through. Grouped aggregates, scans,
    * generates and mapPartitions are unbounded (None): their output
    * grows with the data. This is the property that makes a
    * nested-loop stage scale-safe — the 100 TB side streams, the
    * bounded side broadcasts O(1) rows.
    */
  private def boundedRows(p: SparkPlan): Option[Long] = {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.aggregate._
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.joins._
    import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
    p match {
      case l: LocalTableScanExec => Some(l.rows.length.toLong)
      case r: RangeExec => Some(r.numElements.toLong)
      case h: HashAggregateExec if h.groupingExpressions.isEmpty => Some(1L)
      case h: ObjectHashAggregateExec if h.groupingExpressions.isEmpty => Some(1L)
      case h: SortAggregateExec if h.groupingExpressions.isEmpty => Some(1L)
      case g: GlobalLimitExec => Some(g.limit.toLong)
      case c: CollectLimitExec => Some(c.limit.toLong)
      case t: TakeOrderedAndProjectExec => Some(t.limit.toLong)
      case e: ExpandExec => boundedRows(e.child).map(_ * e.projections.length)
      case r: ReusedExchangeExec => boundedRows(r.child)
      case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        boundedRows(m.relation.cachedPlan) // caching preserves row count
      case a: AdaptiveSparkPlanExec =>
        // walk the PRE-AQE plan: AQE re-optimization may have erased a
        // structural limit it could prove redundant from runtime stats,
        // but the bound must hold at any scale, i.e. structurally
        boundedRows(a.inputPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        boundedRows(q.plan)
      case _: GenerateExec => None // row expansion unbounded by child count
      case u: UnionExec =>
        val bs = u.children.map(boundedRows)
        if (bs.forall(_.isDefined)) Some(bs.flatten.sum) else None
      case j: BaseJoinExec => j.joinType match {
        case LeftSemi | LeftAnti => boundedRows(j.left)
        case _ => // any other join emits at most |L|*|R| + |L| + |R| (outer pads)
          for { a <- boundedRows(j.left); b <- boundedRows(j.right) }
            yield a * b + a + b
      }
      case _ if p.getClass.getSimpleName.contains("MapPartitions") ||
        p.getClass.getSimpleName.contains("FlatMap") => None
      case _ if p.children.length == 1 => boundedRows(p.children.head)
      case _ => None
    }
  }

  test("umbrella: nested-loop/cartesian stages only with a provably-bounded side") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    // A CartesianProduct/BroadcastNestedLoopJoin is scale-safe exactly
    // when one side is structurally bounded (boundedRows above): the
    // probe/model/spine table broadcasts, the fact side streams. The
    // gate asserts the PROPERTY on every query plan; the residual name
    // list below holds only queries whose bound is semantic (a
    // documented audit-slice filter or a per-day/group collapse) that
    // the structural check cannot see.
    val residual = Set(
      "ext_sim_pairs_allpairs", // all-pairs ORACLE pin (production path
                                // ext_sim_pairs is blocked, no BNLJ)
      "ext_kendall",    // day-pair join: O(calendar^2); fact pre-collapsed
                        // to the day series by a grouped agg — bounded by
                        // the CALENDAR length, not the data volume
      "ext_theilsen",   // day-pair slopes, same calendar collapse
      "ext_mannkendall" // day-pair signs, same calendar collapse
    )
    val maxBroadcastRows = 512L
    // manual walk: collectWithSubqueries can surface LOGICAL subquery
    // plans (pre-AQE) which would blow up a SparkPlan-typed match
    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val subs = p.expressions.flatMap(_.collect {
        case pe: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] =>
          pe.plan
      }).collect { case sp: SparkPlan => sp }
      p +: (p.children ++ subs).flatMap(allNodes)
    }
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val plan = q(spark, sf001).queryExecution.sparkPlan
        val bad = allNodes(plan).collect {
          case j: BroadcastNestedLoopJoinExec
              if !Seq(j.left, j.right).flatMap(boundedRows)
                .exists(_ <= maxBroadcastRows) => "BroadcastNestedLoopJoin"
          case j: CartesianProductExec
              if !Seq(j.left, j.right).flatMap(boundedRows)
                .exists(_ <= maxBroadcastRows) => "CartesianProduct"
        }
        if (bad.nonEmpty && !residual(name))
          Some(s"$name(${bad.mkString("+")})")
        else None
    }
    assert(offenders.isEmpty,
      s"unbounded nested-loop/cartesian stages in: ${offenders.mkString(", ")}")
  }

  test("residual cartesian allowlist: every semantic bound is MEASURED, " +
      "not trusted") {
    // The umbrella gate's residual list claims each entry's unbounded-
    // looking join has a semantic bound. Execute those bounds:
    // the three day-pair queries collapse the fact table to ≤ one row
    // per calendar day BEFORE pairing, so the pair join is O(days²) —
    // here each collapse's row count is checked against the actual
    // distinct-day count of the fixture, and the all-pairs oracle pin's
    // input is checked to stay fixture-sized.
    import org.apache.spark.sql.functions.{col, to_date}
    val nDays = Tables.table(spark, sf001, "events")
      .select(to_date(col("ts")).as("d")).distinct().count()
    assert(nDays <= 366L, s"events span $nDays days — calendar blew up")
    val kendallDays =
      graft.ops.ExtensionQueries17.dailyClickPurchase(spark, sf001).count()
    assert(kendallDays == nDays,
      s"ext_kendall collapse $kendallDays rows != $nDays calendar days — " +
        "the pre-pair aggregation is no longer day-keyed")
    val purchaseDays = graft.ops.ExtensionQueries19.daily(spark, sf001).count()
    assert(purchaseDays <= nDays,
      s"ext_theilsen/ext_mannkendall collapse $purchaseDays rows > " +
        s"$nDays calendar days")
    // ext_sim_pairs_allpairs is DELIBERATELY all-pairs (the oracle twin
    // of the blocked production path) — its executable bound is the
    // input cardinality: the pin only ever runs on fixture-sized
    // embedding sets, never on a corpus
    val nEmb = Tables.table(spark, sf001, "embeddings").count()
    assert(nEmb <= 10000L,
      s"embeddings fixture grew to $nEmb rows — the all-pairs oracle " +
        "pin would materialize n² pairs; re-derive the pin or shrink it")
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
