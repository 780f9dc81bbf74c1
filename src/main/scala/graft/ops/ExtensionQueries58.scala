package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 58: clustering evaluation and LSH
  * tuning — the simplified silhouette of the label partition (per-row
  * scores quantized before the fold) and the MinHash band/row S-curve
  * table (expected candidate volume per configuration).
  */
object ExtensionQueries58 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-328 simplified silhouette -----------------------------------------------
  // How separated are the embedding labels? Simplified silhouette:
  // per point, a = distance to own centroid, b = min distance to any
  // other centroid, s = (b − a)/max(a, b) — QUANTIZED to 1e-4 ints per
  // point (E-257 discipline) so per-cluster means are exact integer
  // ratios. Distances are squared-Euclidean to centroids (monotone
  // for the comparison, no square roots in the hot path); centroids
  // broadcast. The clustering-quality score behind E-44's purity.
  def extSilhouette(s: SparkSession, dir: String): DataFrame = {
    val dims = t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("i", "x")))
      .select(col("vec_id"), col("label"), col("i"),
        col("x").cast("double").as("x"))
    val cent = dims.groupBy(col("label").as("cl"), col("i"))
      .agg((sum("x") / count(lit(1))).as("m"))
    val d2 = dims.join(cent, Seq("i"))
      .groupBy("vec_id", "label", "cl")
      .agg(sum((col("x") - col("m")) * (col("x") - col("m"))).as("d2"))
    val ab = d2.groupBy("vec_id", "label")
      .agg(max(when(col("cl") === col("label"), col("d2"))).as("a2"),
        min(when(col("cl") =!= col("label"), col("d2"))).as("b2"))
      .select(col("vec_id"), col("label"),
        round((sqrt(col("b2")) - sqrt(col("a2"))) /
          greatest(sqrt(col("a2")), sqrt(col("b2"))) * 10000)
          .cast("long").as("sq"))
    ab.groupBy("label")
      .agg(count(lit(1)).as("n"),
        round(sum("sq").cast("double") / count(lit(1)) / 10000, 4)
          .as("mean_silhouette"))
      .orderBy("label")
  }

  // ---- E-329 MinHash band/row tuning ---------------------------------------------
  // Which (bands, rows) config catches the near-dups without drowning
  // in candidates? For each config the S-curve P(candidate) =
  // 1 − (1 − j^r)^b evaluated at every audit pair's EXACT Jaccard
  // (E-250's consecutive-doc frame), per-pair probabilities QUANTIZED
  // to 1e-6 before the fold — expected candidate counts become exact
  // integer sums. The knob table every LSH deployment tunes by hand.
  def extBandtune(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id").cast("long").as("id"),
        explode(array_distinct(filter(split(col("text"), " "),
          x => x =!= ""))).as("tok"))
    val sizes = toks.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = toks.join(
        toks.select((col("id") - 1).as("id"), col("tok")), Seq("id", "tok"))
      .groupBy("id").agg(count(lit(1)).as("ni"))
    val pairs = sizes
      .join(sizes.select((col("id") - 1).as("id"), col("sz").as("szb")),
        Seq("id"))
      .join(inter, Seq("id"), "left")
      .select((coalesce(col("ni"), lit(0L)).cast("double") /
        (col("sz") + col("szb") - coalesce(col("ni"), lit(0L)))).as("j"))
    val cfgs = t(s, dir, "documents").sparkSession.range(0, 4)
      .select(
        element_at(array(lit(96L), lit(48L), lit(32L), lit(24L)),
          (col("id") + 1).cast("int")).as("b"),
        element_at(array(lit(2L), lit(4L), lit(6L), lit(8L)),
          (col("id") + 1).cast("int")).as("r"))
    pairs.crossJoin(broadcast(cfgs))
      .withColumn("pq",
        round((lit(1.0) - pow(lit(1.0) - pow(col("j"), col("r")),
          col("b"))) * 1e6).cast("long"))
      .groupBy("b", "r")
      .agg(count(lit(1)).as("n_pairs"), sum("pq").as("sum_pq"))
      .select(col("b"), col("r"), col("n_pairs"),
        round(col("sum_pq").cast("double") / 1e6, 4)
          .as("expected_candidates"),
        round(col("sum_pq").cast("double") / col("n_pairs") / 1e6, 6)
          .as("candidate_rate"))
      .orderBy("b", "r")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_silhouette" -> (extSilhouette _),
    "ext_bandtune" -> (extBandtune _))

  val oracleSql: Map[String, String] = Map(
    // E-328: identical centroids, distances, and quantized scores.
    "ext_silhouette" ->
      """with dims as (select vec_id, label, i - 1 i,
        |    cast(embedding[i] as double) x
        |  from embeddings, unnest(range(1, len(embedding) + 1)) u(i)),
        |cent as (select label cl, i, sum(x) / count(*) m
        |  from dims group by label, i),
        |d2 as (select vec_id, dims.label, cl,
        |    sum((x - m) * (x - m)) d2
        |  from dims join cent using (i)
        |  group by vec_id, dims.label, cl),
        |ab as (select vec_id, label,
        |    max(case when cl = label then d2 end) a2,
        |    min(case when cl <> label then d2 end) b2
        |  from d2 group by vec_id, label),
        |sq as (select vec_id, label,
        |    cast(round((sqrt(b2) - sqrt(a2)) /
        |      greatest(sqrt(a2), sqrt(b2)) * 10000) as bigint) sq
        |  from ab)
        |select label, cast(count(*) as bigint) n,
        |  round(cast(sum(sq) as double) / count(*) / 10000, 4)
        |    mean_silhouette
        |from sq group by label order by label""".stripMargin,

    // E-329: identical audit-pair Jaccards and quantized S-curve.
    "ext_bandtune" ->
      """with toks as (select cast(doc_id as bigint) id,
        |    unnest(list_distinct(list_filter(string_split(text, ' '),
        |      w -> w <> ''))) tok
        |  from documents),
        |sizes as (select id, cast(count(*) as bigint) sz
        |  from toks group by id),
        |inter as (select a.id, cast(count(*) as bigint) ni
        |  from toks a join toks b on b.id = a.id + 1 and b.tok = a.tok
        |  group by a.id),
        |pairs as (select cast(coalesce(ni, 0) as double) /
        |    (sa.sz + sb.sz - coalesce(ni, 0)) j
        |  from sizes sa join sizes sb on sb.id = sa.id + 1
        |  left join inter on inter.id = sa.id),
        |q as (select b, r,
        |    cast(round((1.0 - pow(1.0 - pow(j, r), b)) * 1e6) as bigint) pq
        |  from pairs cross join (values (96, 2), (48, 4), (32, 6),
        |    (24, 8)) c(b, r))
        |select cast(b as bigint) b, cast(r as bigint) r,
        |  cast(count(*) as bigint) n_pairs,
        |  round(cast(sum(pq) as double) / 1e6, 4) expected_candidates,
        |  round(cast(sum(pq) as double) / count(*) / 1e6, 6) candidate_rate
        |from q group by b, r order by b, r""".stripMargin)
}
