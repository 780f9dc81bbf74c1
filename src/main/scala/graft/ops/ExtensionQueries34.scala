package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 34: ML-eval and graph-global
  * stats — global transitivity (the corpus-level closure ratio beside
  * E-229's per-node coefficient), the precision–recall curve, a
  * quantized feature-correlation matrix (exact decimal moments, no
  * float folds), and class-balanced downsampling with a membership
  * checksum.
  */
object ExtensionQueries34 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def h60(c: Column) =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  // ---- E-255 global transitivity -------------------------------------------------
  // 3·triangles / wedges on the co-order part graph: what share of
  // open two-paths closes? Wedges = Σ d(d−1)/2 from the degree table,
  // triangles from the E-38 degree-oriented join — both exact
  // integers, one division. The single-number cohesion summary the
  // per-node E-229 view aggregates to.
  def extClosure(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
    // four consumers (deg→wedge, ne, and the sliced triangle count's
    // orient+enumeration) — pin the O(m) self-join+distinct once
    val edges = li.select(col("l_orderkey").as("o"), col("l_partkey").as("u"))
      .join(li.select(col("l_orderkey").as("o"), col("l_partkey").as("v")), "o")
      .filter(col("u") < col("v"))
      .select("u", "v")
      .distinct()
      .localCheckpoint()
    val deg = edges.select(col("u").as("id"))
      .unionAll(edges.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val wedge = deg.agg(count(lit(1)).as("n_nodes"),
      (sum(col("d") * (col("d") - 1)) / 2).cast("long").as("n_wedges"))
    val ne = edges.agg(count(lit(1)).as("n_edges"))
    // bounded triangle count (round 12): the unbounded triangleList agg
    // sorts W wedge rows under the default SMJ plan — at the battery's
    // wedge volumes that is the trussup wall all over again; the sliced
    // shuffle-hash count is the same integer with the same disciplines
    val tri = Triangles.triangleCountBounded(edges)
    wedge.crossJoin(broadcast(ne))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        lit(tri).as("n_triangles"),
        round(lit(tri).cast("double") * 3 / col("n_wedges"), 6)
          .as("transitivity"))
  }

  // ---- E-256 precision–recall curve ----------------------------------------------
  // The threshold sweep AUC (E-66) integrates away: P and R at
  // score ≥ t for t ∈ {0.0 … 0.9} over the same centroid-cosine
  // scoring — integer TP/FP/FN per threshold from one pass × the
  // 10-row spine; rounding-stable because scores are pre-rounded to
  // 6dp and thresholds sit on 0.1 grid points.
  def extPrcurve(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = t(s, dir, "embeddings")
    val centroid = e.filter(col("label") === 0)
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("pos").agg(avg("v").as("m"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("c"))
    val scored = e.crossJoin(broadcast(centroid))
      .select(round(call_function("cosine_sim", col("embedding"), col("c")), 6)
          .as("score"),
        (col("label") === 0).as("pos"))
    val ths = s.range(0, 10).select((col("id").cast("double") / 10).as("th"))
    scored.crossJoin(broadcast(ths))
      .groupBy("th")
      .agg(sum(when(col("score") >= col("th") && col("pos"), 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("score") >= col("th") && !col("pos"), 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("score") < col("th") && col("pos"), 1L)
          .otherwise(0L)).as("fn"))
      // empty prediction/positive sets surface as NULL, not a 0/0 —
      // ANSI division throws on zero denominators
      .select(round(col("th"), 1).as("th"), col("tp"), col("fp"), col("fn"),
        round(when(col("tp") + col("fp") > 0,
          col("tp").cast("double") / (col("tp") + col("fp"))), 6)
          .as("precision"),
        round(when(col("tp") + col("fn") > 0,
          col("tp").cast("double") / (col("tp") + col("fn"))), 6)
          .as("recall"))
      .orderBy("th")
  }

  // ---- E-257 feature correlation matrix ------------------------------------------
  // Pairwise Pearson correlation of the first 4 embedding dimensions,
  // QUANTIZED to 1e-4 grid integers first so every moment (Σx, Σxy,
  // Σx²) is an exact decimal and the matrix is order-independent —
  // the collinearity screen before any linear model; corr() on raw
  // floats would be a cross-row float fold.
  def extFeatcorr(s: SparkSession, dir: String): DataFrame = {
    val dims = t(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
      .filter(col("i") < 4)
      .select(col("vec_id"), col("i"),
        round(col("x").cast("double") * 10000).cast("long")
          .cast("decimal(38,0)").as("q"))
    val pairs = dims.join(
        dims.select(col("vec_id"), col("i").as("j"), col("q").as("qj")),
        "vec_id")
      .filter(col("i") < col("j"))
    pairs.groupBy("i", "j")
      .agg(count(lit(1)).as("n"), sum("q").as("sx"), sum("qj").as("sy"),
        sum(col("q") * col("qj")).as("sxy"),
        sum(col("q") * col("q")).as("sxx"),
        sum(col("qj") * col("qj")).as("syy"))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("n") * col("syy") - col("sy") * col("sy")).cast("double")), 6)
          .as("corr"))
      .orderBy("i", "j")
  }

  // ---- E-258 class-balanced downsampling -----------------------------------------
  // Equal-size classes (the BALANCED cut — E-20's stratified sampler
  // keeps proportions instead): per label keep the n_min rows that
  // rank first under the portable (hash, id) order. Membership is
  // pinned by the kept-id sum — the output proves WHICH rows were
  // kept, not just how many. Rank windows are per-label partitions.
  def extBalance(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id").cast("long").as("vec_id"), col("label"))
      .withColumn("h", h60(col("vec_id").cast("string")))
    val nMin = e.groupBy("label").agg(count(lit(1)).as("n"))
      .agg(min("n").as("n_min"))
    val ranked = e.withColumn("rk",
      row_number().over(Window.partitionBy("label").orderBy("h", "vec_id"))
        .cast("long"))
    ranked.crossJoin(broadcast(nMin))
      .groupBy("label")
      .agg(count(lit(1)).as("n_before"),
        sum(when(col("rk") <= col("n_min"), 1L).otherwise(0L)).as("n_after"),
        sum(when(col("rk") <= col("n_min"), col("vec_id")).otherwise(0L))
          .as("kept_id_sum"))
      .orderBy("label")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_closure" -> (extClosure _),
    "ext_prcurve" -> (extPrcurve _),
    "ext_featcorr" -> (extFeatcorr _),
    "ext_balance" -> (extBalance _))

  val oracleSql: Map[String, String] = Map(
    // E-255: identical wedge/triangle integer forms.
    "ext_closure" ->
      """with e0 as (select distinct a.l_partkey u, b.l_partkey v
        |  from lineitem a join lineitem b
        |  on a.l_orderkey = b.l_orderkey and a.l_partkey < b.l_partkey),
        |deg as (select k, cast(count(*) as bigint) d from
        |  (select u k from e0 union all select v from e0) group by k),
        |wedge as (select cast(count(*) as bigint) n_nodes,
        |    cast(sum(d * (d - 1)) // 2 as bigint) n_wedges from deg),
        |ne as (select cast(count(*) as bigint) n_edges from e0),
        |e as (select
        |    case when da.d < db.d or (da.d = db.d and u < v) then u else v end s,
        |    case when da.d < db.d or (da.d = db.d and u < v) then v else u end t
        |  from e0 join deg da on da.k = u join deg db on db.k = v),
        |tri as (select cast(count(*) as bigint) n_triangles
        |  from e e1 join e e2 on e1.t = e2.s
        |  join e e3 on e3.s = e1.s and e3.t = e2.t)
        |select n_nodes, n_edges, n_wedges, n_triangles,
        |  round(cast(n_triangles as double) * 3 / n_wedges, 6) transitivity
        |from wedge cross join ne cross join tri""".stripMargin,

    // E-256: the E-66 oracle's centroid-cosine scoring + the 0.1-grid
    // threshold spine.
    "ext_prcurve" ->
      """with c as (select i, avg(cast(embedding[i] as double)) m
        |  from embeddings, unnest(range(1, len(embedding) + 1)) u(i)
        |  where label = 0 group by i),
        |sc as (select vec_id, label = 0 pos,
        |    round(
        |      (select sum(cast(e.embedding[c.i] as double) * c.m) from c)
        |      / (sqrt(list_sum(list_transform(e.embedding,
        |           x -> cast(x as double) * x)))
        |         * (select sqrt(sum(m * m)) from c)), 6) score
        |  from embeddings e),
        |cnt as (select th,
        |    cast(sum(case when score >= th and pos then 1 else 0 end)
        |      as bigint) tp,
        |    cast(sum(case when score >= th and not pos then 1 else 0 end)
        |      as bigint) fp,
        |    cast(sum(case when score < th and pos then 1 else 0 end)
        |      as bigint) fn
        |  from sc cross join (select cast(i as double) / 10 th
        |    from unnest(range(0, 10)) u(i))
        |  group by th)
        |select round(th, 1) th, tp, fp, fn,
        |  round(case when tp + fp > 0
        |    then cast(tp as double) / (tp + fp) end, 6) "precision",
        |  round(case when tp + fn > 0
        |    then cast(tp as double) / (tp + fn) end, 6) recall
        |from cnt order by th""".stripMargin,

    // E-257: identical 1e-4 quantization and exact HUGEINT moments.
    "ext_featcorr" ->
      """with dims as (select vec_id, i - 1 i,
        |    cast(cast(round(cast(embedding[i] as double) * 10000) as bigint)
        |      as hugeint) q
        |  from embeddings, unnest(range(1, 5)) u(i)),
        |pairs as (select a.i, b.i j, a.q, b.q qj
        |  from dims a join dims b on a.vec_id = b.vec_id and a.i < b.i)
        |select cast(i as bigint) i, cast(j as bigint) j,
        |  cast(count(*) as bigint) n,
        |  round(cast(count(*) * sum(q * qj) - sum(q) * sum(qj) as double) /
        |    sqrt(cast(count(*) * sum(q * q) - sum(q) * sum(q) as double) *
        |      cast(count(*) * sum(qj * qj) - sum(qj) * sum(qj) as double)),
        |    6) corr
        |from pairs group by i, j order by i, j""".stripMargin,

    // E-258: identical portable-hash rank and membership sum.
    "ext_balance" ->
      """with e as (select cast(vec_id as bigint) vec_id, label,
        |    ('0x' || substr(sha256(cast(vec_id as varchar)), 1, 15))::bigint h
        |  from embeddings),
        |nm as (select min(n) n_min from (
        |  select label, count(*) n from e group by label)),
        |r as (select vec_id, label,
        |    cast(row_number() over (partition by label order by h, vec_id)
        |      as bigint) rk
        |  from e)
        |select label, cast(count(*) as bigint) n_before,
        |  cast(sum(case when rk <= n_min then 1 else 0 end) as bigint)
        |    n_after,
        |  cast(sum(case when rk <= n_min then vec_id else 0 end) as bigint)
        |    kept_id_sum
        |from r cross join nm group by label order by label""".stripMargin)
}
