package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 extension queries, batch 105: k-D PCA by quantized power
  * iteration (closing E-317's documented "k-D PCA out of relational
  * scope" limitation — the iteration IS relational once every step is
  * integer) and dictionary entity tagging with longest-match-wins
  * (the gazetteer/NER-lite pass of a corpus pipeline).
  */
object ExtensionQueries105 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-443 dominant principal direction (power iteration) -----------------------
  // Top eigenvector of the full 64×64 embedding covariance — E-317
  // solved d=2 in closed form and documented k-D as out of scope; the
  // power method brings k-D back in scope because every step can be
  // made EXACT: covariance entries are cross-multiplied integer sums
  // (n·Σq_iq_j − Σq_i·Σq_j over 1e-6-quantized values, decimal(38,0)
  // — no float fold), scaled to c9 longs, and each iteration
  // w ← C·v renormalizes by SIGN-SAFE integer division (sign·(|w|
  // DIV (max|w| DIV 1e6)) — truncation identical on both engines,
  // where floor-vs-truncate would diverge on negatives). Three
  // iterations; the heavy part (the covariance pass) is one
  // map-side-combinable aggregate, linear in corpus — the iteration
  // itself runs on the fixed 64×64 grid. Output: the 10 heaviest
  // dimensions of the dominant direction.
  def extPcaPower(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("p", "v")))
      .select(col("vec_id"), col("p"),
        round(col("v").cast("double") * 1e6).cast("long").as("q"))
    val sums = emb.groupBy("p")
      .agg(sum(col("q")).cast("decimal(38,0)").as("sq"),
        count(lit(1)).cast("decimal(38,0)").as("nn"))
    val pairs = emb.select(col("vec_id"), col("p").as("i"), col("q").as("qi"))
      .join(emb.select(col("vec_id"), col("p").as("j"), col("q").as("qj")),
        Seq("vec_id"))
      .groupBy("i", "j")
      .agg(sum(col("qi") * col("qj")).cast("decimal(38,0)").as("sqq"))
    val cov = pairs
      .join(sums.select(col("p").as("i"), col("sq").as("si"), col("nn")),
        Seq("i"))
      .join(sums.select(col("p").as("j"), col("sq").as("sj")), Seq("j"))
      .select(col("i"), col("j"),
        expr("""CAST(signum(nn * sqq - si * sj) *
                 (abs(nn * sqq - si * sj) DIV CAST(1000000000 AS DECIMAL(38,0)))
                 AS LONG)""").as("c9"))
      .localCheckpoint()
    var v = cov.select(col("i").as("d")).distinct()
      .select(col("d"), lit(1000000L).as("w"))
    for (_ <- 1 to 3) {
      val prod = cov
        .join(v.select(col("d").as("jd"), col("w").as("vj")),
          col("j") === col("jd"))
        .groupBy("i")
        .agg(sum(col("c9") * col("vj")).as("wi"))
      val mx = prod.agg(max(abs(col("wi"))).as("m")).select(
        greatest(expr("m DIV 1000000"), lit(1L)).as("m"))
      v = prod.crossJoin(broadcast(mx.limit(1)))
        .select(col("i").as("d"),
          (signum(col("wi")).cast("long") *
            expr("abs(wi) DIV m")).as("w"))
        .localCheckpoint()
    }
    // posexplode is 0-based, the oracle's generate_series 1-based:
    // report 1-based dims
    v.select((col("d") + 1).as("dim"), col("w").as("weight"))
      .orderBy(abs(col("weight")).desc, col("dim").asc)
      .limit(10)
  }

  // ---- E-444 gazetteer entity tagging (longest match wins) ------------------------
  // Dictionary-based mention extraction: the gazetteer is the corpus'
  // own top-5 bigrams + top-5 unigrams (count-then-lexicographic tie
  // order, fully deterministic), matched against token positions with
  // LONGEST MATCH WINS — a unigram mention is SUPPRESSED wherever a
  // bigram mention covers its position (starts there or one before),
  // the leftmost-longest discipline of every real tagger. All
  // relational: one positional explode, two broadcast dictionary
  // joins, one anti-join for suppression — no per-row automaton, so
  // the plan is the same at any corpus size. Output: mentions + doc
  // frequency per entity.
  def extGazetteer(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " "))
        .as(Seq("p", "w")))
      .filter(col("w") =!= "")
    val bi = toks.select(col("doc_id"), col("p"), col("w"))
      .join(toks.select(col("doc_id"), (col("p") - 1).as("p"),
        col("w").as("w2")), Seq("doc_id", "p"))
      .select(col("doc_id"), col("p"), concat_ws(" ", col("w"), col("w2"))
        .as("phrase"))
    val topBi = bi.groupBy("phrase").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("phrase")).limit(5)
      .select(col("phrase"))
    val topUni = toks.groupBy(col("w").as("phrase"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("phrase")).limit(5)
      .select(col("phrase"))
    val biMent = bi.join(broadcast(topBi), Seq("phrase"))
      .select(col("doc_id"), col("p"), col("phrase"))
    val uniMent = toks.select(col("doc_id"), col("p"),
        col("w").as("phrase"))
      .join(broadcast(topUni), Seq("phrase"))
      // longest match wins: drop a unigram covered by a bigram mention
      .join(biMent.select(col("doc_id"),
          explode(array(col("p"), col("p") + 1)).as("p")).distinct(),
        Seq("doc_id", "p"), "left_anti")
    biMent.select(col("doc_id"), col("phrase"))
      .unionAll(uniMent.select(col("doc_id"), col("phrase")))
      .groupBy(col("phrase").as("entity"))
      .agg(count(lit(1)).as("n_mentions"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(desc("n_mentions"), asc("entity"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_pca_power" -> (extPcaPower _),
    "ext_gazetteer" -> (extGazetteer _))

  // E-443 oracle: identical cross-multiplied covariance and unrolled
  // sign-safe integer iterations.
  private def pcaOracle(iters: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """with q as (select vec_id, i.p,
        |    cast(round(cast(embedding[i.p] as double) * 1000000.0) as bigint) q
        |  from embeddings, unnest(generate_series(1, 64)) i(p)),
        |sums as (select p, sum(q) sq, count(*) nn from q group by p),
        |pairs as (select a.p i, b.p j, sum(a.q * b.q) sqq
        |  from q a join q b on a.vec_id = b.vec_id group by 1, 2),
        |cov as (select i, j, cast(
        |    case when s.nn * sqq - s.sq * t.sq < 0 then -1 else 1 end *
        |    (abs(s.nn * sqq - s.sq * t.sq) // 1000000000) as bigint) c9
        |  from pairs join sums s on s.p = i join sums t on t.p = j),
        |v0 as (select distinct i d, cast(1000000 as bigint) w from cov),
        |""".stripMargin)
    for (k <- 1 to iters) {
      sb.append(s"p$k as (select i, sum(c9 * v.w) wi from cov ")
      sb.append(s"join v${k - 1} v on v.d = cov.j group by i),\n")
      sb.append(s"m$k as (select greatest(max(abs(wi)) // 1000000, 1) m from p$k),\n")
      sb.append(s"v$k as (select i d, cast(")
      sb.append(s"case when wi < 0 then -1 else 1 end * (abs(wi) // m.m) ")
      sb.append(s"as bigint) w from p$k, m$k m)")
      sb.append(if (k < iters) ",\n" else "\n")
    }
    sb.append(s"select d dim, w weight from v$iters ")
    sb.append("order by abs(w) desc, d limit 10")
    sb.toString
  }

  val oracleSql: Map[String, String] = Map(
    "ext_pca_power" -> pcaOracle(3),

    // E-444: identical dictionary derivation, matches, and
    // longest-match suppression.
    "ext_gazetteer" ->
      """with toks as (select doc_id, t.p, sp[t.p] w from (
        |    select doc_id, string_split(text, ' ') sp from documents) d,
        |    unnest(generate_series(1, len(sp))) t(p)
        |  where sp[t.p] <> ''),
        |bi as (select a.doc_id, a.p, a.w || ' ' || b.w phrase
        |  from toks a join toks b on a.doc_id = b.doc_id and b.p = a.p + 1),
        |topbi as (select phrase from (select phrase, count(*) n from bi
        |  group by 1) t order by n desc, phrase limit 5),
        |topuni as (select phrase from (select w phrase, count(*) n
        |  from toks group by 1) t order by n desc, phrase limit 5),
        |biment as (select doc_id, p, phrase from bi
        |  where phrase in (select phrase from topbi)),
        |cover as (select distinct doc_id, p from (
        |  select doc_id, p from biment
        |  union all select doc_id, p + 1 from biment) t),
        |uniment as (select t.doc_id, t.p, t.w phrase from toks t
        |  where t.w in (select phrase from topuni)
        |    and not exists (select 1 from cover c
        |      where c.doc_id = t.doc_id and c.p = t.p)),
        |ment as (select doc_id, phrase from biment
        |  union all select doc_id, phrase from uniment)
        |select phrase entity, count(*) n_mentions,
        |  count(distinct doc_id) n_docs
        |from ment group by phrase
        |order by n_mentions desc, entity""".stripMargin)
}
