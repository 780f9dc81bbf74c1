package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only A/B timing harness for alternative query formulations.
  * Not part of the driver contract; run manually:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.PerfLab"
  */
object PerfLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(s: String) = Tables.table(spark, sfDir, s)

    // b2 as shipped: ((customer ⋈ orders) ⋈ lineitem) ⋈ nation ⋈ region
    def b2Current(): DataFrame = graft.queries.ContractQueries.b2(spark, sfDir)

    // b2 reordered: restrict customers to ASIA *first* (broadcast dim
    // chain), then join orders, then lineitem — the region filter prunes
    // ~4/5 of the fact-side rows before the big shuffle join.
    def b2Reordered(): DataFrame =
      t("customer")
        .join(broadcast(t("nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t("region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .select("c_custkey", "n_name")
        .join(t("orders"), col("c_custkey") === col("o_custkey"))
        .join(t("lineitem"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(desc("revenue"), asc("n_name"))

    // b3 as shipped
    def b3Current(): DataFrame = graft.queries.ContractQueries.b3(spark, sfDir)

    // b3 with the filtered customer side explicitly broadcast
    def b3Broadcast(): DataFrame =
      broadcast(t("customer").filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey"))
        .join(t("orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_orderdate")
        .join(t("lineitem"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(desc("revenue"), asc("l_orderkey"))
        .limit(10)

    // b7 with a single from_json parse instead of get_json_object
    def b7FromJson(): DataFrame =
      t("events")
        .select(col("event_type"), col("ts"), col("value"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("k",
                org.apache.spark.sql.types.IntegerType)))).getField("k").as("k"))
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(sum("k").as("sk"), round(sum("value"), 2).as("sv"), count(lit(1)).as("cnt"))
        .orderBy("h", "event_type")
        .limit(100)

    def withConf[T](k: String, v: String)(f: () => T): T = {
      val old = spark.conf.getOption(k)
      spark.conf.set(k, v)
      try f() finally old.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "b2_current" -> (b2Current _),
      "b2_reordered" -> (b2Reordered _),
      "b3_current" -> (b3Current _),
      "b3_broadcast" -> (b3Broadcast _),
      "b1_default" -> (() => graft.queries.ContractQueries.b1(spark, sfDir)),
      "b7_current" -> (() => graft.queries.ContractQueries.b7(spark, sfDir)),
      "b7_from_json" -> (b7FromJson _),
      // round-3 heavy text/similarity ops at full bench scale — these
      // are the ones with quadratic failure modes if the shapes regress
      // (inverted-index fanout, per-doc window, eval-broadcast semi)
      "ext_sparse_cos" -> (() =>
        graft.ops.ExtensionQueries2.extSparseCos(spark, sfDir)),
      "ext_cdc_chunk" -> (() =>
        graft.ops.ExtensionQueries2.extCdcChunk(spark, sfDir)),
      "ext_decontaminate" -> (() =>
        graft.ops.ExtensionQueries2.extDecontaminate(spark, sfDir)),
      "ext_repetition" -> (() =>
        graft.ops.ExtensionQueries2.extRepetition(spark, sfDir)),
      // round-4 join-geometry ops: the blocked/pruned production shapes
      // vs their quadratic strawmen
      "geo_blocked" -> (() =>
        graft.ops.ExtensionQueries2.extGeoJoin(spark, sfDir)),
      "geo_brute" -> (() => {
        import org.apache.spark.sql.functions._
        val probes = Tables.table(spark, sfDir, "customer")
          .select(col("c_custkey").as("probe_id"),
            (lit(40.0) + (col("c_custkey") * 37 % 500) / 100.0).as("lat"),
            ((col("c_custkey") * 101 % 500) / 100.0).as("lon"))
        val cands = Tables.table(spark, sfDir, "supplier")
          .select(col("s_suppkey").as("cand_id"),
            (lit(40.0) + (col("s_suppkey") * 53 % 500) / 100.0).as("clat"),
            ((col("s_suppkey") * 71 % 500) / 100.0).as("clon"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("probe_id").orderBy("dist_km", "cand_id")
        probes.crossJoin(cands)
          .select(col("probe_id"), col("cand_id"),
            round(graft.ops.GeoJoin.haversineKm(col("lat"), col("lon"),
              col("clat"), col("clon")), 3).as("dist_km"))
          .filter(col("dist_km") <= 60.0)
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      }),
      "phrase_postings" -> (() =>
        graft.ops.ExtensionQueries2.extPhrase(spark, sfDir)),
      "phrase_regex_scan" -> (() => {
        import org.apache.spark.sql.functions._
        // the naive formulation: full-text LIKE scan + per-doc count
        Tables.table(spark, sfDir, "documents")
          .select(col("doc_id"),
            (size(split(col("text"), " big order scan ", -1)) - 1).as("n_hits"))
          .filter(col("n_hits") > 0)
      }),
      "ext_pmi" -> (() =>
        graft.ops.ExtensionQueries2.extPmi(spark, sfDir)))

    // scan-split experiment: same b1, smaller max partition bytes
    def timed(fn: () => DataFrame): Double = {
      val t0 = System.nanoTime(); fn().collect(); (System.nanoTime() - t0) / 1e9
    }
    for (mpb <- Seq("134217728", "8388608", "2097152")) {
      withConf("spark.sql.files.maxPartitionBytes", mpb) { () =>
        timed(() => graft.queries.ContractQueries.b1(spark, sfDir))
        val best = (1 to 3).map(_ => timed(() =>
          graft.queries.ContractQueries.b1(spark, sfDir))).min
        println(f"PERFLAB b1@mpb=$mpb%-10s $best%.3f s")
      }
    }

    variants.foreach { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime(); fn().collect(); (System.nanoTime() - t0) / 1e9
      }
      once()
      val best = (1 to 3).map(_ => once()).min
      println(f"PERFLAB $name%-14s $best%.3f s  rows=${fn().count()}")
    }

    // Corpus funnel: shipped Observation+persist pipeline vs the round-2
    // formulation (five uncached count() actions, each re-executing the
    // whole upstream funnel). Same report values, different wall time.
    {
      import graft.ops.{Dedup, Sampling}
      import graft.text.TextAnalysis
      val docs = t("documents")
      // faithful to the round-2 code: six uncached actions, with the
      // near-dedup lineage materialized twice (afterNear AND outCount)
      def naiveRun(): pipeline.PipelineReport = {
        val input = docs.count()
        val scrubbed = docs.withColumn("text", TextAnalysis.scrub(col("text")))
        val withLang = scrubbed.withColumn("__lang", TextAnalysis.langId(col("text")))
        val afterLang = withLang.count()
        val scored = TextAnalysis.qualityFeatures(withLang, "text")
        val afterQuality = scored.count()
        val keeperIds = Dedup.exactAssignKeepers(scored, "doc_id", "text")
          .filter(!col("is_dup")).select("doc_id")
        val exactKept = scored.join(keeperIds, Seq("doc_id"), "left_semi")
        val afterExact = exactKept.count()
        val dupIds = Dedup.nearDupComponents(
            exactKept, "doc_id", array_distinct(split(col("text"), " ")),
            threshold = 0.5, bands = 64, rowsPerBand = 2)
          .filter(col("doc_id") =!= col("component")).select("doc_id")
        val nearKept = exactKept.join(dupIds, Seq("doc_id"), "left_anti")
        val afterNear = nearKept.count()
        val outCount = nearKept.count()
        pipeline.PipelineReport(input, input, afterLang, afterQuality,
          afterQuality, afterQuality, afterQuality, afterExact, afterNear,
          outCount)
      }
      def shippedRun(): pipeline.PipelineReport = {
        val (out, r) = new pipeline.CorpusPipeline(nearDupThreshold = 0.5).run(docs)
        out.unpersist()
        r
      }
      def timedReport(fn: () => pipeline.PipelineReport): (Double, pipeline.PipelineReport) = {
        val t0 = System.nanoTime(); val r = fn(); ((System.nanoTime() - t0) / 1e9, r)
      }
      timedReport(shippedRun _); timedReport(naiveRun _) // JIT warm-up for both
      val (tn, rn) = timedReport(naiveRun _)
      val (ts, rs) = timedReport(shippedRun _)
      println(f"PERFLAB funnel_naive_counts   $tn%.3f s  $rn")
      println(f"PERFLAB funnel_observed       $ts%.3f s  $rs")
      // NB: near-dedup clustering executes exactly once in BOTH variants
      // (components() eagerly checkpoints), so this A/B isolates the
      // text-stage recompute amplification — which CC dwarfs at sf0.1,
      // where cache-build overhead can even exceed the recompute saved.
      // The scale invariant is exactly-once text-stage execution
      // (CorpusPipelineSpec pins it with a row-level accumulator): at
      // 100 TB the recomputed stages are full-corpus scans, not the
      // ~0.6 s they cost here.
      println(f"PERFLAB funnel speedup: ${tn / ts}%.2fx (CC-dominated; see note)")

      // Clustering granularity A/B: connected components over the
      // SET-representative graph (shipped) vs over expanded member
      // pairs. Same final cluster assignment (property-tested in
      // DedupSpec); the member graph carries every intra-clique edge.
      def setGraph(): Long = Dedup.nearDupComponents(docs, "doc_id",
        array_distinct(split(col("text"), " ")), 0.5, 64, 2).count()
      def memberGraph(): Long = graft.ops.ConnectedComponents.components(
        Dedup.minhashNearDupPairsFromSets(docs, "doc_id",
            array_distinct(split(col("text"), " ")), 0.5, 64, 2)
          .select(col("id_a").as("src"), col("id_b").as("dst"))).count()
      def timedCount(fn: () => Long): Double = {
        val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
      }
      val tSet = timedCount(setGraph _)
      val tMember = timedCount(memberGraph _)
      println(f"PERFLAB cc_set_graph          $tSet%.3f s")
      println(f"PERFLAB cc_member_graph       $tMember%.3f s (${tMember / tSet}%.1fx)")
    }
    spark.stop()
  }
}
