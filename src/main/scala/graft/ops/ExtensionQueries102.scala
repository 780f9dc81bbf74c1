package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 extension queries, batch 102: contrastive-training-data
  * mining over the labeled embedding corpus — hard triplet selection
  * (the batch-construction step behind triplet/InfoNCE losses) and
  * the label-centroid confusion structure (which classes the
  * embedding space can't separate). Both ride the 1e-9-quantized
  * cosine discipline (E-430), so every pick is exact integer argmax.
  */
object ExtensionQueries102 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-437 hard triplet mining --------------------------------------------------
  // For each anchor (vec_id < 16): the HARD POSITIVE (same label,
  // minimum cosine — the same-class example the encoder almost lost)
  // and the HARD NEGATIVE (different label, maximum cosine — the
  // impostor it almost admitted), plus the triplet margin
  // pos_cq − neg_cq in quantized units; a negative margin IS a
  // violated triplet — the rows a contrastive fine-tune should feed
  // first. One anchor-broadcast probe pass + two window picks; at
  // corpus scale the candidate set comes from IVF/LSH shortlists and
  // the picks are unchanged.
  def extTriplets(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val emb = t(s, dir, "embeddings")
    val anchors = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("anchor_id"), col("embedding").as("ae"),
        col("label").as("anchor_label"))
      .limit(32) // structural bound for the broadcast side
    val scored = emb.join(broadcast(anchors),
        col("vec_id") =!= col("anchor_id"))
      .select(col("anchor_id"), col("anchor_label"), col("vec_id"),
        col("label"),
        round(call_function("cosine_sim", col("embedding"), col("ae")) * 1e9)
          .cast("long").as("cq"))
    val posW = Window.partitionBy("anchor_id")
      .orderBy(asc("cq"), asc("vec_id"))
    val negW = Window.partitionBy("anchor_id")
      .orderBy(desc("cq"), asc("vec_id"))
    val pos = scored.filter(col("label") === col("anchor_label"))
      .withColumn("rn", row_number().over(posW)).filter(col("rn") === 1)
      .select(col("anchor_id"), col("vec_id").as("pos_id"),
        col("cq").as("pos_cq"))
    val neg = scored.filter(col("label") =!= col("anchor_label"))
      .withColumn("rn", row_number().over(negW)).filter(col("rn") === 1)
      .select(col("anchor_id"), col("vec_id").as("neg_id"),
        col("cq").as("neg_cq"))
    pos.join(neg, Seq("anchor_id"))
      .select(col("anchor_id"), col("pos_id"), col("pos_cq"),
        col("neg_id"), col("neg_cq"),
        (col("pos_cq") - col("neg_cq")).as("margin9"))
      .orderBy("anchor_id")
  }

  // ---- E-438 label-centroid confusion ---------------------------------------------
  // Cosine similarity between class centroids, top-10 most-confusable
  // label pairs — the clustering-quality / label-noise screen run
  // before training on a labeled corpus. EXACT inputs by scale
  // invariance: cos(mean_a, mean_b) = cos(sum_a, sum_b), and the SUM
  // vectors are exact longs after 1e-6 per-value quantization (sums
  // of integers in any order), so both engines divide the identical
  // integers — no float fold anywhere before the final division.
  // Plan is explode-by-position + two grouped sums + a pos-keyed
  // equi-join: constant in dimension, linear in corpus.
  def extLabelsim(s: SparkSession, dir: String): DataFrame = {
    val q = t(s, dir, "embeddings")
      .select(col("label").as("lbl"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("lbl", "pos")
      .agg(sum(round(col("v").cast("double") * 1e6).cast("long")).as("sq"))
    val n2 = q.groupBy("lbl")
      .agg(sum(col("sq") * col("sq")).as("n2"))
    val dots = q.select(col("lbl").as("la"), col("pos"), col("sq").as("sa"))
      .join(q.select(col("lbl").as("lb"), col("pos"), col("sq").as("sb")),
        Seq("pos"))
      .filter(col("la") < col("lb"))
      .groupBy("la", "lb")
      .agg(sum(col("sa") * col("sb")).as("dot"))
    dots
      .join(n2.select(col("lbl").as("la"), col("n2").as("n2a")), Seq("la"))
      .join(n2.select(col("lbl").as("lb"), col("n2").as("n2b")), Seq("lb"))
      .select(col("la"), col("lb"),
        round(col("dot") / (sqrt(col("n2a")) * sqrt(col("n2b"))) * 1e9)
          .cast("long").as("cq9"))
      .orderBy(desc("cq9"), asc("la"), asc("lb"))
      .limit(10)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_triplets" -> (extTriplets _),
    "ext_labelsim" -> (extLabelsim _))

  private val cqExpr =
    """cast(round(list_dot_product(cast(c.embedding as double[]), cast(a.embedding as double[]))
      |      / (sqrt(list_dot_product(cast(c.embedding as double[]), cast(c.embedding as double[])))
      |       * sqrt(list_dot_product(cast(a.embedding as double[]), cast(a.embedding as double[]))))
      |      * 1000000000.0) as bigint)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // E-437: identical quantized-cosine scores, identical tie orders.
    "ext_triplets" ->
      s"""with scored as (select a.vec_id anchor_id, a."label" anchor_label,
        |    c.vec_id, c."label" lbl, $cqExpr cq
        |  from embeddings c join embeddings a
        |    on a.vec_id < 16 and c.vec_id <> a.vec_id),
        |pos as (select anchor_id, vec_id pos_id, cq pos_cq from (
        |    select *, row_number() over (partition by anchor_id
        |      order by cq asc, vec_id) rn
        |    from scored where lbl = anchor_label) t where rn = 1),
        |neg as (select anchor_id, vec_id neg_id, cq neg_cq from (
        |    select *, row_number() over (partition by anchor_id
        |      order by cq desc, vec_id) rn
        |    from scored where lbl <> anchor_label) t where rn = 1)
        |select p.anchor_id, pos_id, pos_cq, neg_id, neg_cq,
        |  cast(pos_cq - neg_cq as bigint) margin9
        |from pos p join neg n on p.anchor_id = n.anchor_id
        |order by p.anchor_id""".stripMargin,

    // E-438: identical exact integer sum vectors, identical division.
    "ext_labelsim" ->
      """with q as (select "label" lbl, i.pos,
        |    cast(sum(round(cast(embedding[i.pos] as double) * 1000000.0))
        |      as bigint) sq
        |  from embeddings, unnest(generate_series(1, 64)) i(pos)
        |  group by 1, 2),
        |n2 as (select lbl, cast(sum(sq * sq) as bigint) n2 from q group by 1),
        |dots as (select a.lbl la, b.lbl lb, cast(sum(a.sq * b.sq) as bigint) dot
        |  from q a join q b on a.pos = b.pos and a.lbl < b.lbl
        |  group by 1, 2)
        |select la, lb,
        |  cast(round(dot / (sqrt(na.n2) * sqrt(nb.n2)) * 1000000000.0)
        |    as bigint) cq9
        |from dots join n2 na on na.lbl = dots.la
        |          join n2 nb on nb.lbl = dots.lb
        |order by cq9 desc, la, lb limit 10""".stripMargin)
}
