package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-8 extension queries, batch 98: coverage-driven selection and
  * neighborhood aggregation — greedy k-center (Gonzalez 1985; the
  * coverage leg of the data-selection triad next to DSIR's domain
  * match and MMR's diversity) and 1-hop kNN embedding aggregation
  * (the precompute behind kNN classifiers and GNN-style feature
  * smoothing).
  */
object ExtensionQueries98 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def dq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    round(call_function("euclidean_sq", a, b) * 1e9).cast("long")

  // ---- E-429 greedy k-center coreset ----------------------------------------------
  // Pick 8 centers that COVER the corpus: round 1 = vec_id 0 (the
  // deterministic seed), each later round adds the point FARTHEST
  // from its nearest selected center (classic 2-approximation to the
  // k-center optimum). Distances are 1e-9-quantized longs, so the
  // greedy trace — including the reported covering radius at each
  // pick — is exact integer argmax, engine-bit-identical (the E-428
  // discipline). Each round is one aggregate against a ≤8-row
  // broadcast; the oracle replays the rounds as generated unrolled
  // CTEs. The dist9 column IS the coverage-radius curve: how far the
  // worst-covered point sits after k picks.
  def extKcenter(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    graft.functions.GraftFunctions.register(s)
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    emb.count()
    val first = emb.filter(col("vec_id") === 0)
      .select(col("vec_id"), col("embedding")).head()
    val picked = scala.collection.mutable.ArrayBuffer(
      (first.getLong(0), first.getSeq[Float](1), 0L))
    while (picked.size < 8) {
      val sel = picked.map(_._2).toSeq.toDF("sel_emb")
      val top = emb
        .filter(!col("vec_id").isin(picked.map(_._1).toSeq: _*))
        .crossJoin(broadcast(sel))
        .groupBy("vec_id")
        .agg(min(dq(col("embedding"), col("sel_emb"))).as("mind"))
        .orderBy(desc("mind"), asc("vec_id"))
        .limit(1)
        .join(emb, Seq("vec_id"))
        .head()
      picked += ((top.getLong(0), top.getSeq[Float](2), top.getLong(1)))
    }
    emb.unpersist(blocking = false)
    picked.zipWithIndex.map { case ((id, _, d), i) =>
      ((i + 1).toLong, id, d)
    }.toSeq.toDF("rank", "vec_id", "dist9")
  }

  // ---- E-430 kNN neighborhood aggregation -----------------------------------------
  // For each of the first 20 vectors: its 3 nearest neighbors by
  // quantized cosine (self excluded, ties by vec_id) and the
  // per-dimension MEAN of their embeddings, reported as the l2 norm
  // of the aggregated vector (1e-6-quantized) — the one-number
  // summary that pins all 64 averaged dimensions. The aggregation is
  // explode-by-position + grouped avg: plan size constant in dim (the
  // GloveModel.transform shape), neighbor search rides the quantized
  // brute-force probe pattern (20 probes × corpus — linear; at scale
  // the shortlist comes from IVF/LSH/PQ and the aggregation is
  // unchanged).
  def extKnnagg(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val emb = t(s, dir, "embeddings")
    val probes = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      .limit(32) // structural bound for the broadcast side
    val w = Window.partitionBy("probe_id").orderBy(desc("cq"), asc("vec_id"))
    val top3 = emb.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), col("embedding"),
        round(call_function("cosine_sim", col("embedding"), col("pe")) * 1e9)
          .cast("long").as("cq"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    top3.select(col("probe_id"), col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("probe_id", "pos")
      .agg(avg(col("v").cast("double")).as("m"))
      .groupBy("probe_id")
      // per-dim m² quantized to 1e-6 LONGS before the 64-term fold so
      // the sum is order-independent (E-257 discipline)
      .agg(round(sqrt(sum(round(col("m") * col("m") * 1e6).cast("long"))
        / 1e6), 4).as("agg_norm"))
      .join(top3.groupBy("probe_id")
        .agg(sort_array(collect_list(col("vec_id"))).as("nn"),
          min(col("cq")).as("min_cq")), Seq("probe_id"))
      .select(col("probe_id"),
        concat_ws(",", col("nn")).as("neighbors"),
        col("min_cq"), col("agg_norm"))
      .orderBy("probe_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_kcenter" -> (extKcenter _),
    "ext_knnagg" -> (extKnnagg _))

  /** k-center oracle: the 8 greedy rounds unrolled (E-428 pattern). */
  private val kcenterOracleSql: String = {
    def d9(a: String, b: String) =
      s"""cast(round(list_sum(list_transform(list_zip($a, $b),
         | x -> (cast(x[1] as double) - cast(x[2] as double)) *
         |      (cast(x[1] as double) - cast(x[2] as double)))) * 1000000000.0)
         | as bigint)""".stripMargin
    val head =
      """with v as (select vec_id, embedding from embeddings),
        |p1 as (select vec_id, embedding, cast(0 as bigint) dist9 from v
        |  where vec_id = 0)""".stripMargin
    val rounds = (2 to 8).map { i =>
      val sel = (1 until i).map(j => s"select vec_id, embedding from p$j")
        .mkString(" union all ")
      s"""sel$i as ($sel),
         |m$i as (select v.vec_id, v.embedding,
         |    min(${d9("v.embedding", "s.embedding")}) mind
         |  from v cross join sel$i s
         |  where v.vec_id not in (select vec_id from sel$i)
         |  group by v.vec_id, v.embedding),
         |p$i as (select vec_id, embedding, mind dist9 from m$i
         |  order by mind desc, vec_id limit 1)""".stripMargin
    }
    val finalSel = (1 to 8)
      .map(i => s"select cast($i as bigint) rnk, vec_id, dist9 from p$i")
      .mkString(" union all ")
    (Seq(head) ++ rounds).mkString(",\n") +
      s"\nselect rnk \"rank\", vec_id, dist9 from ($finalSel) order by rnk"
  }

  val oracleSql: Map[String, String] = Map(
    "ext_kcenter" -> kcenterOracleSql,

    // E-430: identical quantized-cosine top-3 and per-dimension means.
    "ext_knnagg" ->
      """with cos as (select p.vec_id probe_id, c.vec_id, c.embedding,
        |    cast(round(list_dot_product(cast(c.embedding as double[]), cast(p.embedding as double[]))
        |      / (sqrt(list_dot_product(cast(c.embedding as double[]), cast(c.embedding as double[])))
        |       * sqrt(list_dot_product(cast(p.embedding as double[]), cast(p.embedding as double[]))))
        |      * 1000000000.0) as bigint) cq
        |  from embeddings c join embeddings p
        |    on p.vec_id < 20 and c.vec_id <> p.vec_id),
        |top3 as (select * from (select *, row_number() over
        |    (partition by probe_id order by cq desc, vec_id) rn from cos)
        |  where rn <= 3),
        |dims as (select probe_id, i.pos, avg(cast(embedding[i.pos] as double)) m
        |  from top3, unnest(generate_series(1, 64)) i(pos)
        |  group by probe_id, i.pos),
        |norms as (select probe_id,
        |    round(sqrt(sum(cast(round(m * m * 1000000.0) as bigint))
        |      / 1000000.0), 4) agg_norm
        |  from dims group by probe_id),
        |lists as (select probe_id,
        |    array_to_string(list_sort(list(vec_id)), ',') neighbors,
        |    cast(min(cq) as bigint) min_cq
        |  from top3 group by probe_id)
        |select probe_id, neighbors, min_cq, agg_norm
        |from norms join lists using (probe_id)
        |order by probe_id""".stripMargin)
}
