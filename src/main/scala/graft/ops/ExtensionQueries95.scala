package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 extension queries, batch 95: tokenizer training and
  * density-based clustering — the BPE pair-frequency kernel (the
  * relational heart of subword-vocabulary learning, `text/Bpe`) and
  * exact DBSCAN over the embedding corpus (`ops/Dbscan`).
  */
object ExtensionQueries95 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-425 BPE pair-frequency kernel --------------------------------------------
  // Round 1 of BPE merge learning, oracle-gated end to end: word
  // frequencies → initial char+</w> symbol sequences → frequency-
  // weighted adjacent-pair counts → top-15 merge candidates. The
  // multi-round trainer (driver-coordinated argmax + codegen'd fold
  // merge application, text/Bpe.learnMerges) is property-gated in
  // BpeSpec against hand-computed merges — this row pins the kernel
  // every round re-runs. Cost shape: one corpus pass for word counts,
  // then everything is vocabulary-sized.
  def extBpe(s: SparkSession, dir: String): DataFrame =
    graft.text.Bpe.pairCounts(
        graft.text.Bpe.wordTable(t(s, dir, "documents")))
      .orderBy(desc("pair_count"), asc("left_sym"), asc("right_sym"))
      .limit(15)

  // ---- E-426 DBSCAN ----------------------------------------------------------------
  // Exact DBSCAN (eps = 1.15, minPts = 4) over the embeddings table:
  // pivot-banded eps-join (triangle-inequality blocking — exact, see
  // ops/Dbscan scaladoc for the uniform-fixture degeneracy caveat),
  // hash-min components over the core-core graph, border points
  // attached to the min core-neighbor cluster. Contract: per-cluster
  // census (cluster id = min core vec_id) plus the noise row (-1) —
  // present at every fixture scale, so the gate sees the full
  // role partition. The oracle recomputes the same definition from
  // the exact all-pairs eps-graph (fixture-sized) with a recursive-
  // CTE hash-min closure — hash equality proves the pivot banding
  // prunes EXACTLY.
  def extDbscan(s: SparkSession, dir: String): DataFrame = {
    val labeled = Dbscan.label(t(s, dir, "embeddings"), eps = 1.15, minPts = 4)
    labeled.groupBy(col("cluster").as("cluster_id"))
      .agg(
        sum(when(col("role") === "core", 1L).otherwise(0L)).as("n_core"),
        sum(when(col("role") === "border", 1L).otherwise(0L)).as("n_border"),
        count(lit(1)).as("n_total"))
      .orderBy(desc("n_total"), asc("cluster_id"))
      .limit(25)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_bpe" -> (extBpe _),
    "ext_dbscan" -> (extDbscan _))

  val oracleSql: Map[String, String] = Map(
    // E-425: identical word table, symbol sequences and weighted pair
    // counts. DuckDB splits to chars with the same '' pattern
    // semantics as Spark's split.
    "ext_bpe" ->
      """with w as (select u.w, cast(count(*) as bigint) freq from (
        |    select unnest(string_split(text, ' ')) w from documents) u
        |  where u.w <> '' group by u.w),
        |syms as (select w, freq,
        |    list_append(string_split(w, ''), '</w>') s from w),
        |pairs as (select s[i] left_sym, s[i+1] right_sym, freq
        |  from syms, unnest(generate_series(1, len(s) - 1)) t(i))
        |select left_sym, right_sym,
        |  cast(sum(freq) as bigint) pair_count
        |from pairs group by 1, 2
        |order by pair_count desc, left_sym, right_sym
        |limit 15""".stripMargin,

    // E-426: exact all-pairs eps-graph (fixture-sized oracle twin of
    // the pivot-banded join), cores by neighbor count, clusters via
    // recursive hash-min closure, borders by min core-neighbor
    // cluster, plus the noise row.
    "ext_dbscan" ->
      """with v as (select vec_id, embedding from embeddings),
        |e as (select a.vec_id u, b.vec_id v from v a join v b
        |  on a.vec_id <> b.vec_id
        |  and list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |    x -> (cast(x[1] as double) - cast(x[2] as double)) *
        |         (cast(x[1] as double) - cast(x[2] as double))))
        |    <= 1.15 * 1.15),
        |deg as (select u vec_id, count(*) nbrs from e group by 1),
        |flags as (select v.vec_id,
        |    coalesce(deg.nbrs, 0) + 1 >= 4 is_core
        |  from v left join deg using (vec_id)),
        |ce as (select e.u, e.v from e
        |  join flags fu on fu.vec_id = e.u and fu.is_core
        |  join flags fv on fv.vec_id = e.v and fv.is_core),
        |comp as (
        |  with recursive r(a, b) as (
        |    select u, v from ce
        |    union
        |    select r.a, e.v from r join ce e on r.b = e.u
        |  )
        |  select a node, least(a, min(b)) cl from r group by a),
        |core_assign as (select f.vec_id,
        |    coalesce(c.cl, f.vec_id) cl
        |  from flags f left join comp c on c.node = f.vec_id
        |  where f.is_core),
        |border as (select e.u vec_id, min(ca.cl) cl
        |  from e join core_assign ca on ca.vec_id = e.v
        |  where e.u not in (select vec_id from core_assign)
        |  group by e.u),
        |lab as (
        |  select vec_id, 'core' rl, cl from core_assign
        |  union all
        |  select vec_id, 'border', cl from border
        |  union all
        |  select v.vec_id, 'noise', -1 from v
        |  where v.vec_id not in (select vec_id from core_assign)
        |    and v.vec_id not in (select vec_id from border))
        |select cl cluster_id, cast(sum(case when rl = 'core' then 1 else 0 end)
        |    as bigint) n_core,
        |  cast(sum(case when rl = 'border' then 1 else 0 end) as bigint)
        |    n_border,
        |  cast(count(*) as bigint) n_total
        |from lab group by cl
        |order by n_total desc, cluster_id limit 25""".stripMargin)
}
