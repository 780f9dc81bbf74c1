package graft.ops

import graft.Tables
import graft.functions.VectorFunctions.cosine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-8 extension queries, batch 96: data-selection surfaces —
  * DSIR importance weighting (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling") and MMR diversity
  * selection (Carbonell & Goldstein 1998) — the two standard levers
  * for choosing WHICH corpus slices to train on: domain match and
  * redundancy avoidance.
  */
object ExtensionQueries96 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-427 DSIR importance weights ------------------------------------------------
  // Rank the raw pool by how target-like each doc is: weight =
  // Σ_tokens [ln p_target(t) − ln p_raw(t)] under add-1-smoothed
  // unigram LMs (target = the src0 feed; raw = everything else).
  // Every per-token log-ratio is quantized to a 1e-9 long BEFORE the
  // per-doc sum (E-257 discipline — the fold is order-independent, so
  // weights are partitioning- and engine-stable). Shapes: two token
  // count passes + a broadcast of the (vocabulary-sized) ratio table
  // onto the raw token stream — linear in tokens, the LM tables are
  // the only shuffled keys.
  def extDsir(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val tgtCnt = toks.filter(col("source") === "src0")
      .groupBy("w").agg(count(lit(1)).as("tc"))
    val rawToks = toks.filter(col("source") =!= "src0")
    val rawCnt = rawToks.groupBy("w").agg(count(lit(1)).as("rc"))
    // shared-vocabulary smoothing constants as one broadcast row
    val consts = rawCnt.join(tgtCnt, Seq("w"), "left")
      .agg(count(lit(1)).as("v"),
        sum(coalesce(col("tc"), lit(0L))).as("tn"),
        sum(col("rc")).as("rn"))
    val ratio = rawCnt.join(tgtCnt, Seq("w"), "left")
      .na.fill(0L, Seq("tc"))
      .crossJoin(broadcast(consts.limit(1)))
      .select(col("w"),
        round((log((col("tc") + 1.0) / (col("tn") + col("v"))) -
               log((col("rc") + 1.0) / (col("rn") + col("v")))) * 1e9)
          .cast("long").as("lr"))
    rawToks.join(broadcast(ratio), Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("lr")).as("weight9"))
      .orderBy(desc("weight9"), asc("doc_id"))
      .limit(25)
  }

  // ---- E-428 MMR diversity selection -------------------------------------------------
  // Pick 8 results that are RELEVANT to the probe but not redundant
  // with each other: greedy argmax of 0.7·sim(q,d) − 0.3·max_{s∈S}
  // sim(d,s). Cosines are quantized to 1e-9 longs, so the score
  // 7·sq − 3·max is EXACT integer arithmetic (ties by vec_id) — the
  // greedy trace is bit-identical on any engine. Each of the 8 rounds
  // is one aggregate over the candidate set against a ≤8-row broadcast
  // of the already-selected vectors (the selection set is small by
  // definition — driver-coordinated like BPE's argmax, never a
  // corpus-sized collect). The oracle replays the same 8 rounds as
  // unrolled CTEs.
  def extMmr(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val emb = t(s, dir, "embeddings")
    val qe = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe")).limit(1)
    val cands = emb.filter(col("vec_id") > 0)
      .crossJoin(broadcast(qe))
      .select(col("vec_id"), col("embedding"),
        round(cosine(col("embedding"), col("qe")) * 1e9).cast("long").as("sq"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    cands.count()
    // Greedy rounds maintain max_{s∈S} sim INCREMENTALLY: only the vector
    // picked last round contributes new cosines, so each round is one
    // narrow greatest() over the remaining candidates instead of a
    // |S|-way crossJoin + groupBy whose first(embedding) agg buffer
    // forced SortAggregate (the Ivf.assign lesson). Same quantized
    // cosines, same greatest-long fold as the old max() — the greedy
    // trace and score9 values are bit-identical.
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val firstTop = cands
      .select(col("vec_id"), col("embedding"), (col("sq") * 7).as("score9"))
      .orderBy(desc("score9"), asc("vec_id")).limit(1).head()
    picked += ((firstTop.getLong(0), firstTop.getLong(2)))
    var state = cands.filter(col("vec_id") =!= firstTop.getLong(0))
      .withColumn("maxq",
        round(cosine(col("embedding"),
          typedlit(firstTop.getSeq[Float](1))) * 1e9).cast("long"))
    while (picked.size < 8) {
      val top = state
        .select(col("vec_id"), col("embedding"),
          (col("sq") * 7 - col("maxq") * 3).as("score9"))
        .orderBy(desc("score9"), asc("vec_id")).limit(1).head()
      picked += ((top.getLong(0), top.getLong(2)))
      state = state.filter(col("vec_id") =!= top.getLong(0))
        .withColumn("maxq", greatest(col("maxq"),
          round(cosine(col("embedding"),
            typedlit(top.getSeq[Float](1))) * 1e9).cast("long")))
    }
    cands.unpersist(blocking = false)
    picked.zipWithIndex.map { case ((id, sc), i) =>
      ((i + 1).toLong, id, sc)
    }.toSeq.toDF("rank", "vec_id", "score9")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_dsir" -> (extDsir _),
    "ext_mmr" -> (extMmr _))

  /** The MMR oracle: the same 8 greedy rounds unrolled as CTEs —
    * generated by a loop so round i's candidate exclusion and
    * max-similarity reference the union of picks 1..i−1.
    */
  private val mmrOracleSql: String = {
    val cosQ =
      """cast(round(list_dot_product(cast(a.embedding as double[]), cast(q.e as double[]))
        | / (sqrt(list_dot_product(cast(a.embedding as double[]), cast(a.embedding as double[])))
        |  * sqrt(list_dot_product(cast(q.e as double[]), cast(q.e as double[])))) * 1000000000.0) as bigint)"""
        .stripMargin
    val head =
      s"""with c as (select a.vec_id, a.embedding, $cosQ sq
         |  from embeddings a cross join
         |    (select embedding e from embeddings where vec_id = 0) q
         |  where a.vec_id > 0),
         |p1 as (select vec_id, embedding, sq * 7 score9 from c
         |  order by score9 desc, vec_id limit 1)""".stripMargin
    val rounds = (2 to 8).map { i =>
      val sel = (1 until i).map(j => s"select vec_id, embedding from p$j")
        .mkString(" union all ")
      val cosS =
        """cast(round(list_dot_product(cast(c.embedding as double[]), cast(s.embedding as double[]))
          | / (sqrt(list_dot_product(cast(c.embedding as double[]), cast(c.embedding as double[])))
          |  * sqrt(list_dot_product(cast(s.embedding as double[]), cast(s.embedding as double[])))) * 1000000000.0) as bigint)"""
          .stripMargin
      s"""sel$i as ($sel),
         |m$i as (select c.vec_id, max($cosS) mx
         |  from c cross join sel$i s
         |  where c.vec_id not in (select vec_id from sel$i)
         |  group by c.vec_id),
         |p$i as (select c.vec_id, c.embedding, c.sq * 7 - m.mx * 3 score9
         |  from c join m$i m using (vec_id)
         |  order by score9 desc, vec_id limit 1)""".stripMargin
    }
    val finalSel = (1 to 8)
      .map(i => s"select cast($i as bigint) rnk, vec_id, score9 from p$i")
      .mkString(" union all ")
    (Seq(head) ++ rounds).mkString(",\n") +
      s"\nselect rnk \"rank\", vec_id, score9 from ($finalSel) order by rnk"
  }

  val oracleSql: Map[String, String] = Map(
    // E-427: identical token streams, smoothing constants and
    // quantized log-ratios.
    "ext_dsir" ->
      """with toks as (select doc_id, source, u.w from documents,
        |    unnest(string_split(text, ' ')) u(w) where u.w <> ''),
        |tgt as (select w, cast(count(*) as bigint) tc from toks
        |  where source = 'src0' group by w),
        |rawt as (select doc_id, w from toks where source <> 'src0'),
        |rawc as (select w, cast(count(*) as bigint) rc from rawt group by w),
        |consts as (select cast(count(*) as bigint) v,
        |    cast(sum(coalesce(tc, 0)) as bigint) tn,
        |    cast(sum(rc) as bigint) rn
        |  from rawc left join tgt using (w)),
        |ratio as (select w,
        |    cast(round((ln((coalesce(tc, 0) + 1.0) / (tn + v)) -
        |                ln((rc + 1.0) / (rn + v))) * 1000000000.0)
        |      as bigint) lr
        |  from rawc left join tgt using (w) cross join consts)
        |select doc_id, cast(count(*) as bigint) n_tokens,
        |  cast(sum(lr) as bigint) weight9
        |from rawt join ratio using (w)
        |group by doc_id
        |order by weight9 desc, doc_id limit 25""".stripMargin,

    // E-428: the generated 8-round unrolled greedy replay.
    "ext_mmr" -> mmrOracleSql)
}
