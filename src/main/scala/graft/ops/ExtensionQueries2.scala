package graft.ops

import graft.Tables
import graft.text.{Decontamination, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-3 extension queries, batch 2: the remaining LLM-pipeline
  * first-class operators — eval-set decontamination, Gopher repetition
  * signals, SemDeDup cluster-scoped embedding dedup, domain-mixture
  * resampling — plus BFS hop labeling, completing the graph family.
  *
  * Every entry carries a DuckDB oracle; approximate machinery
  * (k-means clustering in ext_semdedup) is pinned the same way E-2
  * pins MinHash-LSH: parameters chosen so the scoped result provably
  * equals the exact global oracle on this corpus.
  */
object ExtensionQueries2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-47 eval-set decontamination --------------------------------------
  // Eval corpus = every 53rd doc (10 docs at sf0.01); training docs
  // sharing any 4-gram with it are flagged with their distinct-hit
  // count. 4-grams: long enough that only genuine duplication collides
  // on this fixture (zero 8-gram hits outside near-dup pairs), short
  // enough to exercise multi-hit counting.
  def extDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Decontamination.contaminated(
        train = docs.filter(col("doc_id") % 53 =!= 0),
        evalDocs = docs.filter(col("doc_id") % 53 === 0),
        n = 4)
      .orderBy("doc_id")
  }

  // ---- E-48 Gopher repetition signals --------------------------------------
  def extRepetition(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionSignals(t(s, dir, "documents"))
      .orderBy("doc_id")
      .limit(100)

  // ---- E-49 SemDeDup: cluster-scoped embedding dedup -----------------------
  // Every 29th vector is planted back with a shifted id (exact copy —
  // the fixture's max non-identical cosine is ~0.51, far below
  // tau = 0.99), so the cluster-scoped production path must reproduce
  // the global all-pairs oracle exactly: identical vectors co-cluster
  // by construction and nothing else clears the threshold.
  def extSemdedup(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "embeddings").select("vec_id", "embedding")
    val planted = base.filter(col("vec_id") % 29 === 0)
      .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
    SemDedup.clusterScopedDupPairs(base.unionAll(planted),
        k = 8, iters = 2, tau = 0.99)
      .select(col("keeper"), col("dup_id"), round(col("cos"), 4).as("cos"))
      .orderBy("keeper")
  }

  // ---- E-50 domain-mixture resampling ---------------------------------------
  // Target mixture 3:1:1 over three sources, 40 docs total → quotas
  // 24/8/8 (each source holds 25 docs at sf0.01, so quotas fill).
  // Hash-ordered picks make the draw engine-portable; the oracle
  // replays the identical sha256 rank.
  def extMixture(s: SparkSession, dir: String): DataFrame =
    Mixture.resampleToMixture(t(s, dir, "documents"),
        domain = col("source"), key = col("doc_id"),
        weights = Map("src0" -> 3.0, "src1" -> 1.0, "src2" -> 1.0),
        total = 40)
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id")

  // ---- E-51 BFS hop labeling -------------------------------------------------
  // Min-hop distances from supplier S1 over the bidirected
  // supplier–part co-purchase graph (the ext_pagerank graph), 3 rounds.
  // The oracle is a recursive CTE with UNION-distinct level expansion +
  // a min() fold. Hop parity alternates S/P sides (bipartite).
  def extBfs(s: SparkSession, dir: String): DataFrame = {
    val pairs = t(s, dir, "lineitem")
      .select(concat(lit("S"), col("l_suppkey")).as("sn"),
        concat(lit("P"), col("l_partkey")).as("pn"))
      .distinct()
    val edges = pairs.select(col("sn").as("src"), col("pn").as("dst"))
      .unionAll(pairs.select(col("pn").as("src"), col("sn").as("dst")))
    val sources = t(s, dir, "lineitem").select(lit("S1").as("id")).limit(1)
    Bfs.hops(edges, sources, maxHops = 3)
      .groupBy(col("hops").cast("long").as("hops"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("id").startsWith("S"), 1L).otherwise(0L)).as("n_s"),
        sum(expr("substring(id, 2)").cast("long")).as("sum_sfx"))
      .orderBy("hops")
  }

  // ---- E-52 token-distribution entropy ---------------------------------------
  def extEntropy(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenEntropy(t(s, dir, "documents"))
      .orderBy("doc_id")
      .limit(100)

  // ---- E-53 k-anonymity suppression -------------------------------------------
  // Quasi-identifiers (nation, segment) at k = 15: the 29 combinations
  // with >= 15 customers survive; every row in a rarer combination is
  // suppressed. Output is the surviving-group profile.
  def extKanon(s: SparkSession, dir: String): DataFrame =
    Privacy.kAnonymize(t(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"), k = 15)
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("bal"))
      .orderBy("c_nationkey", "c_mktsegment")

  // ---- E-54 bounded-round k-core refinement ------------------------------------
  // 3 peels at k = 24 over the bidirected supplier–part graph (this
  // corpus converges after round 1 — rounds 2-3 remove nothing, so the
  // bounded refinement IS the true 24-core here); oracle = the same
  // rounds unrolled as CTEs.
  def extKcore(s: SparkSession, dir: String): DataFrame = {
    val pairs = t(s, dir, "lineitem")
      .select(concat(lit("S"), col("l_suppkey")).as("sn"),
        concat(lit("P"), col("l_partkey")).as("pn"))
      .distinct()
    val edges = pairs.select(col("sn").as("src"), col("pn").as("dst"))
      .unionAll(pairs.select(col("pn").as("src"), col("sn").as("dst")))
    KCore.refine(edges, k = 24, rounds = 3)
      .select(substring(col("id"), 1, 1).as("side"),
        expr("substring(id, 2)").cast("long").as("sfx"))
      .groupBy("side")
      .agg(count(lit(1)).as("n"), sum("sfx").as("sum_sfx"))
      .orderBy("side")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_kanon" -> (extKanon _),
    "ext_kcore" -> (extKcore _),
    "ext_entropy" -> (extEntropy _),
    "ext_decontaminate" -> (extDecontaminate _),
    "ext_repetition" -> (extRepetition _),
    "ext_semdedup" -> (extSemdedup _),
    "ext_mixture" -> (extMixture _),
    "ext_bfs" -> (extBfs _))

  val oracleSql: Map[String, String] = Map(
    "ext_kanon" ->
      """select c_nationkey, c_mktsegment, count(*) n,
        |  round(sum(c_acctbal), 2) bal
        |from customer
        |group by c_nationkey, c_mktsegment having count(*) >= 15
        |order by c_nationkey, c_mktsegment""".stripMargin,

    "ext_kcore" ->
      """with pairs as (select distinct
        |    'S' || l_suppkey sn, 'P' || l_partkey pn from lineitem),
        |edges as (select sn src, pn dst from pairs
        |  union all select pn, sn from pairs),
        |n0 as (select distinct src id from edges),
        |d1 as (select src, count(*) c from edges
        |  join n0 a on src = a.id join n0 b on dst = b.id group by src),
        |n1 as (select src id from d1 where c >= 24),
        |d2 as (select src, count(*) c from edges
        |  join n1 a on src = a.id join n1 b on dst = b.id group by src),
        |n2 as (select src id from d2 where c >= 24),
        |d3 as (select src, count(*) c from edges
        |  join n2 a on src = a.id join n2 b on dst = b.id group by src),
        |n3 as (select src id from d3 where c >= 24)
        |select substring(id, 1, 1) side, count(*) n,
        |  cast(sum(cast(substring(id, 2) as bigint)) as bigint) sum_sfx
        |from n3 group by side order by side""".stripMargin,

    "ext_entropy" ->
      """with c as (select doc_id, tok, count(*) c
        |  from (select doc_id, unnest(list_filter(string_split(text, ' '),
        |      w -> w <> '')) tok from documents)
        |  group by 1, 2)
        |select doc_id, cast(sum(c) as bigint) n_tok,
        |  round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 4) entropy
        |from c group by doc_id order by doc_id limit 100""".stripMargin,

    "ext_decontaminate" ->
      """with tok as (select doc_id,
        |    list_filter(string_split(text, ' '), w -> w <> '') tl
        |  from documents),
        |ng as (select distinct doc_id, array_to_string(tl[i:i+3], ' ') g
        |  from tok, unnest(range(1, len(tl) - 2)) u(i) where len(tl) >= 4),
        |ev as (select distinct g from ng where doc_id % 53 = 0)
        |select doc_id, count(*) n_hit from ng
        |where doc_id % 53 <> 0 and g in (select g from ev)
        |group by doc_id order by doc_id""".stripMargin,

    "ext_repetition" ->
      """with tok as (select doc_id,
        |    list_filter(string_split(text, ' '), w -> w <> '') tl
        |  from documents),
        |g3 as (select doc_id, array_to_string(tl[i:i+2], ' ') g
        |  from tok, unnest(range(1, len(tl) - 1)) u(i) where len(tl) >= 3),
        |c3 as (select doc_id, g, count(*) c from g3 group by 1, 2),
        |a3 as (select doc_id, cast(sum(c) as bigint) n3,
        |    cast(sum(case when c > 1 then c else 0 end) as bigint) dup3
        |  from c3 group by 1),
        |g2 as (select doc_id, array_to_string(tl[i:i+1], ' ') g
        |  from tok, unnest(range(1, len(tl))) u(i) where len(tl) >= 2),
        |c2 as (select doc_id, g, count(*) c from g2 group by 1, 2),
        |a2 as (select doc_id, cast(sum(c) as bigint) n2,
        |    cast(max(c) as bigint) top2
        |  from c2 group by 1)
        |select a3.doc_id, n3, dup3, round(dup3 / n3, 4) dup3_frac,
        |  n2, top2, round(top2 / n2, 4) top2_frac
        |from a3 join a2 using(doc_id) order by a3.doc_id limit 100""".stripMargin,

    "ext_semdedup" ->
      """with u as (select vec_id, embedding from embeddings
        |  union all
        |  select vec_id + 1000000, embedding from embeddings
        |  where vec_id % 29 = 0),
        |n as (select vec_id, embedding e,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> cast(x as double) * x))) nrm
        |  from u),
        |p as (select a.vec_id keeper, b.vec_id dup_id,
        |    list_sum(list_transform(a.e,
        |      (x, i) -> cast(x as double) * b.e[i])) / (a.nrm * b.nrm) cos
        |  from n a join n b on a.vec_id < b.vec_id)
        |select keeper, dup_id, round(cos, 4) cos from p
        |where cos >= 0.99 order by keeper""".stripMargin,

    "ext_mixture" ->
      """with q as (select * from (values ('src0', 24), ('src1', 8),
        |    ('src2', 8)) t(src, qt)),
        |r as (select doc_id, source,
        |    row_number() over (partition by source
        |      order by sha256(cast(doc_id as varchar)), doc_id) rn, qt
        |  from documents join q on source = q.src)
        |select doc_id, source from r where rn <= qt order by doc_id""".stripMargin,

    "ext_bfs" ->
      """with recursive pairs as (select distinct
        |    'S' || l_suppkey sn, 'P' || l_partkey pn from lineitem),
        |edges as (select sn src, pn dst from pairs
        |  union all select pn, sn from pairs),
        |walk(id, hops) as (
        |  select 'S1', 0
        |  union
        |  select e.dst, w.hops + 1 from walk w
        |  join edges e on e.src = w.id where w.hops < 3),
        |d as (select id, min(hops) hops from walk group by id)
        |select cast(hops as bigint) hops, count(*) n,
        |  cast(sum(case when id like 'S%' then 1 else 0 end) as bigint) n_s,
        |  cast(sum(cast(substring(id, 2) as bigint)) as bigint) sum_sfx
        |from d group by hops order by hops""".stripMargin)
}
