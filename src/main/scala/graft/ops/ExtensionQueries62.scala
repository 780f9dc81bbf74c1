package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 62: retrieval scoring and
  * cascade-model evaluation — Dirichlet-smoothed query likelihood (the
  * LM alternative to BM25), rank-biased precision, and expected
  * reciprocal rank. Per-term float contributions are quantized to
  * integers before every fold (E-257) so scores settle identically on
  * both engines.
  */
object ExtensionQueries62 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-337 Dirichlet query likelihood ------------------------------------------
  // score(q, d) = Σ_t log((tf_td + μ·p(t|C)) / (len_d + μ)), μ = 100 —
  // the query-likelihood LM ranking beside ext_bm25's tf-idf view.
  // Docs matching NO query term still score (pure background mass), so
  // the frame is docs × the 3-term query spine (bounded broadcast)
  // left-joined to the tf table; each term's log is quantized to 1e-8
  // before the 3-term fold. Top-15 docs.
  def extDirichletql(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"),
        filter(split(col("text"), " "), x => x =!= "").as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("len"),
        explode(col("toks")).as("tok"))
    val lens = docs.groupBy("doc_id").agg(max("len").as("len"))
    val query = t(s, dir, "documents").sparkSession.range(3)
      .select(element_at(array(lit("spark"), lit("query"), lit("fast")),
        (col("id") + 1).cast("int")).as("tok"))
    val corpus = docs.agg(count(lit(1)).as("nc"))
    val cf = query.join(docs.groupBy("tok").agg(count(lit(1)).as("cf")),
        Seq("tok"), "left")
      .select(col("tok"), coalesce(col("cf"), lit(0L)).as("cf"))
      .limit(3) // tok unique in the grouped side: exactly 3 rows; structural cap
      .crossJoin(broadcast(corpus))
    val tf = docs.join(broadcast(query), "tok")
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    lens.crossJoin(broadcast(cf))
      .join(tf, Seq("doc_id", "tok"), "left")
      .select(col("doc_id"), col("len"),
        round(log((coalesce(col("tf"), lit(0L)) +
          lit(100.0) * col("cf") / col("nc")) / (col("len") + 100)) * 1e8)
          .cast("long").as("termq"))
      .groupBy("doc_id")
      .agg(max("len").as("len"),
        round(sum("termq").cast("double") / 1e8, 6).as("ql_score"))
      .orderBy(desc("ql_score"), asc("doc_id"))
      .limit(15)
  }

  /** The E-231/E-67 probe-retrieval frame, replicated here (house
    * precedent: ext_ndcg): cosine-ranked candidates per probe, probes =
    * the deterministic first-128 of the vec_id % 97 slice.
    */
  private def ranked(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = t(s, dir, "embeddings")
    val probes = e.filter(col("vec_id") % 97 === 0)
      .orderBy("vec_id").limit(128)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
        col("label").as("plabel"))
    val w = Window.partitionBy("probe_id").orderBy(desc("cos"), asc("vec_id"))
    e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(call_function("cosine_sim", col("embedding"), col("pv")), 4)
          .as("cos"),
        when(col("label") === col("plabel"), 1L).otherwise(0L).as("rel"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 20)
  }

  // ---- E-338 rank-biased precision -----------------------------------------------
  // RBP@20 with persistence p = 0.8: (1−p)·Σ rel_r·p^(r−1) per probe —
  // the user model where NDCG's log discount becomes a geometric one.
  // p-powers quantized to 1e-8 per rank before the per-probe fold;
  // macro summary over probes.
  def extRbp(s: SparkSession, dir: String): DataFrame = {
    val per = ranked(s, dir)
      .select(col("probe_id"),
        (col("rel") * round(pow(lit(0.8), col("rk") - 1) * lit(0.2) * 1e8)
          .cast("long")).as("termq"))
      .groupBy("probe_id")
      .agg((sum("termq").cast("double") / 1e8).as("rbp"))
    per.agg(count(lit(1)).as("n_probes"),
        round(avg("rbp"), 6).as("mean_rbp"),
        round(min("rbp"), 6).as("min_rbp"),
        round(max("rbp"), 6).as("max_rbp"))
  }

  // ---- E-339 expected reciprocal rank --------------------------------------------
  // Cascade-model ERR@20 with R = 0.5 for relevant docs: the r-th
  // relevant result contributes 0.5^(c_r+1)/r where c_r counts the
  // relevant docs ranked above it (the user stopped at one of them
  // with probability 1 − 0.5^c_r). The prefix-relevance count is a
  // window cumsum; each term is quantized to 1e-9 before the fold.
  def extErr(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("probe_id").orderBy("rk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val per = ranked(s, dir)
      .withColumn("crel", sum("rel").over(w) - col("rel"))
      .select(col("probe_id"),
        (col("rel") * round(pow(lit(0.5), col("crel") + 1) /
          col("rk") * 1e9).cast("long")).as("termq"))
      .groupBy("probe_id")
      .agg((sum("termq").cast("double") / 1e9).as("err"))
    per.agg(count(lit(1)).as("n_probes"),
        round(avg("err"), 6).as("mean_err"),
        round(min("err"), 6).as("min_err"),
        round(max("err"), 6).as("max_err"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_dirichletql" -> (extDirichletql _),
    "ext_rbp" -> (extRbp _),
    "ext_err" -> (extErr _))

  private val rankedSql =
    """n as (select vec_id, label, embedding e,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> cast(x as double) * x))) nrm
      |  from embeddings),
      |pr as (select vec_id probe_id, label plabel, e pv, nrm pnrm
      |  from n where vec_id % 97 = 0 order by vec_id limit 128),
      |sc as (select probe_id, vec_id, plabel, label,
      |    round(list_sum(list_transform(n.e,
      |      (x, i) -> cast(x as double) * pv[i])) / (nrm * pnrm), 4) cos
      |  from n cross join pr where vec_id <> probe_id),
      |rk0 as (select probe_id, vec_id,
      |    case when label = plabel then 1 else 0 end rel,
      |    row_number() over (partition by probe_id
      |      order by cos desc, vec_id) rk
      |  from sc),
      |rk as (select * from rk0 where rk <= 20)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // E-337: identical smoothing, background mass, and quantization.
    "ext_dirichletql" ->
      """with docs as (select doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') toks
        |  from documents),
        |tk as (select doc_id, cast(len(toks) as bigint) len,
        |    unnest(toks) tok from docs),
        |lens as (select doc_id, max(len) len from tk group by doc_id),
        |query as (select unnest(['spark', 'query', 'fast']) tok),
        |corpus as (select cast(count(*) as bigint) nc from tk),
        |cf as (select query.tok,
        |    cast(coalesce(g.cf, 0) as bigint) cf, nc
        |  from query left join (select tok, count(*) cf from tk
        |    group by tok) g on g.tok = query.tok
        |  cross join corpus),
        |tf as (select doc_id, tk.tok, cast(count(*) as bigint) tf
        |  from tk join query on tk.tok = query.tok
        |  group by doc_id, tk.tok),
        |terms as (select lens.doc_id, lens.len,
        |    cast(round(ln((coalesce(tf.tf, 0) + 100.0 * cf.cf / cf.nc) /
        |      (lens.len + 100)) * 1e8) as bigint) termq
        |  from lens cross join cf
        |  left join tf on tf.doc_id = lens.doc_id and tf.tok = cf.tok)
        |select doc_id, max(len) len,
        |  round(cast(sum(termq) as double) / 1e8, 6) ql_score
        |from terms group by doc_id
        |order by ql_score desc, doc_id limit 15""".stripMargin,

    // E-338: identical ranked frame and geometric-discount quantization.
    "ext_rbp" ->
      s"""with $rankedSql,
        |per as (select probe_id,
        |    cast(sum(rel * cast(round(pow(0.8, rk - 1) * 0.2 * 1e8)
        |      as bigint)) as double) / 1e8 rbp
        |  from rk group by probe_id)
        |select cast(count(*) as bigint) n_probes,
        |  round(avg(rbp), 6) mean_rbp,
        |  round(min(rbp), 6) min_rbp,
        |  round(max(rbp), 6) max_rbp
        |from per""".stripMargin,

    // E-339: identical cascade model and prefix-relevance counts.
    "ext_err" ->
      s"""with $rankedSql,
        |c as (select probe_id, rk, rel,
        |    sum(rel) over (partition by probe_id order by rk
        |      rows unbounded preceding) - rel crel
        |  from rk),
        |per as (select probe_id,
        |    cast(sum(rel * cast(round(pow(0.5, crel + 1) / rk * 1e9)
        |      as bigint)) as double) / 1e9 err
        |  from c group by probe_id)
        |select cast(count(*) as bigint) n_probes,
        |  round(avg(err), 6) mean_err,
        |  round(min(err), 6) min_err,
        |  round(max(err), 6) max_err
        |from per""".stripMargin)
}
