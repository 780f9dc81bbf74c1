package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 54: text-graph analytics —
  * TextRank keyword extraction (PageRank over the df-capped token
  * co-occurrence graph), automatic stopword discovery from document
  * frequency, and a language-profile proximity matrix on exact
  * trigram-count cosines.
  */
object ExtensionQueries54 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-318 TextRank keywords ---------------------------------------------------
  // The famous application of E-32's PageRank: rank tokens by their
  // standing in the ADJACENCY co-occurrence graph (the classic
  // window-2 TextRank form — bigram neighbors link). Edge WEIGHTS ride
  // as multi-edges: one edge instance per adjacent occurrence, so
  // out-degree = total adjacency mass and rank flows proportionally —
  // weighted PageRank without a weighted kernel. 3 damped iterations,
  // ranks on the rounded score, the E-32 oracle's unrolled form.
  // (On a Zipfian vocabulary a df cap prunes glue tokens first; this
  // corpus's 31-token vocabulary needs none.)
  def extTextrank(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(filter(split(col("text"), " "), x => x =!= ""))
          .as(Seq("pos", "tok")))
    val bigrams = toks.select(col("doc_id"), col("pos"), col("tok").as("ta"))
      .join(toks.select(col("doc_id"), (col("pos") - 1).as("pos"),
        col("tok").as("tb")), Seq("doc_id", "pos"))
      .filter(col("ta") =!= col("tb"))
    val edges = bigrams.select(col("ta").as("src"), col("tb").as("dst"))
      .unionAll(bigrams.select(col("tb").as("src"), col("ta").as("dst")))
    PageRank.run(edges, iterations = 3)
      .select(col("id").as("tok"), round(col("pr"), 4).as("pr"))
      .orderBy(desc("pr"), asc("tok"))
      .limit(20)
  }

  // ---- E-319 stopword discovery --------------------------------------------------
  // Learn the stopword list instead of assuming it: tokens ranked by
  // document-frequency share (df/N ≥ 0.4 = candidate glue), with
  // per-occurrence-rate context — integer counts, one division each.
  // The data-derived version of the fixed list E-9's quality score
  // hardcodes.
  def extStopdisc(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val nDocs = docs.agg(countDistinct("doc_id").as("nd"))
    val stats = docs
      .select(col("doc_id"),
        explode(filter(split(col("text"), " "), x => x =!= "")).as("tok"))
      .groupBy("tok")
      .agg(countDistinct("doc_id").as("df"), count(lit(1)).as("tf"))
    stats.crossJoin(broadcast(nDocs))
      .filter(col("df") * 10 >= col("nd") * 4) // df/N >= 0.4, integer
      .select(col("tok"), col("df"), col("tf"),
        round(col("df").cast("double") / col("nd"), 4).as("df_share"),
        round(col("tf").cast("double") / col("df"), 4)
          .as("occ_per_doc"))
      .orderBy(desc("df"), desc("tf"), asc("tok"))
      .limit(20)
  }

  // ---- E-320 language-profile proximity ------------------------------------------
  // Which languages' texts LOOK alike? Character-trigram count
  // profiles per lang, pairwise cosine from EXACT integer sums
  // (Σab/√(Σa²·Σb²) — counts are integers, one settled root) over the
  // profile join keyed on trigram. The confusability matrix behind
  // E-248's observed confusion counts.
  def extLangprox(s: SparkSession, dir: String): DataFrame = {
    val tri = t(s, dir, "documents")
      .filter(length(col("text")) >= 3) // Spark sequence(1,0) descends
      .select(col("lang"),
        explode(sequence(lit(1), length(col("text")) - 2)).as("i"),
        col("text"))
      .select(col("lang"), substring(col("text"), col("i").cast("int"), lit(3))
        .as("g"))
      .groupBy("lang", "g").agg(count(lit(1)).as("c"))
    val norms = tri.groupBy("lang")
      .agg(sum(col("c").cast("decimal(38,0)") * col("c")).as("nrm2"))
    val dots = tri.select(col("lang").as("la"), col("g"), col("c").as("ca"))
      .join(tri.select(col("lang").as("lb"), col("g"), col("c").as("cb")),
        "g")
      .filter(col("la") < col("lb"))
      .groupBy("la", "lb")
      .agg(sum(col("ca").cast("decimal(38,0)") * col("cb")).as("dot"))
    dots
      .join(norms.select(col("lang").as("la"), col("nrm2").as("na")), "la")
      .join(norms.select(col("lang").as("lb"), col("nrm2").as("nb")), "lb")
      .select(col("la"), col("lb"),
        round(col("dot").cast("double") /
          sqrt(col("na").cast("double") * col("nb").cast("double")), 6)
          .as("cosine"))
      .orderBy(desc("cosine"), asc("la"), asc("lb"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_textrank" -> (extTextrank _),
    "ext_stopdisc" -> (extStopdisc _),
    "ext_langprox" -> (extLangprox _))

  val oracleSql: Map[String, String] = Map(
    // E-318: the E-32 oracle's unrolled 3-iteration walk over the
    // windowed multi-edge token graph.
    "ext_textrank" ->
      """with toks as (select doc_id, i - 1 pos, tl[i] tok
        |  from (select doc_id, list_filter(string_split(text, ' '),
        |      w -> w <> '') tl from documents),
        |    unnest(range(1, len(tl) + 1)) u(i)),
        |bi as (select a.tok ta, b.tok tb
        |  from toks a join toks b
        |  on a.doc_id = b.doc_id and b.pos = a.pos + 1
        |  where a.tok <> b.tok),
        |edges as (select ta src, tb dst from bi
        |  union all select tb, ta from bi),
        |nodes as (select distinct src id from edges),
        |outdeg as (select src, count(*) d from edges group by src),
        |p0 as (select id, cast(1.0 as double) pr from nodes),
        |p1 as (select n.id, cast(0.15 as double) + cast(0.85 as double)
        |    * coalesce(sum(p.pr / o.d), 0) pr
        |  from nodes n left join edges e on e.dst = n.id
        |  left join p0 p on p.id = e.src left join outdeg o on o.src = e.src
        |  group by n.id),
        |p2 as (select n.id, cast(0.15 as double) + cast(0.85 as double)
        |    * coalesce(sum(p.pr / o.d), 0) pr
        |  from nodes n left join edges e on e.dst = n.id
        |  left join p1 p on p.id = e.src left join outdeg o on o.src = e.src
        |  group by n.id),
        |p3 as (select n.id, cast(0.15 as double) + cast(0.85 as double)
        |    * coalesce(sum(p.pr / o.d), 0) pr
        |  from nodes n left join edges e on e.dst = n.id
        |  left join p2 p on p.id = e.src left join outdeg o on o.src = e.src
        |  group by n.id)
        |select id tok, round(pr, 4) pr from p3
        |order by pr desc, tok limit 20""".stripMargin,

    // E-319: identical integer df-share cut.
    "ext_stopdisc" ->
      """with nd as (select cast(count(distinct doc_id) as bigint) nd
        |  from documents),
        |stats as (select tok, cast(count(distinct doc_id) as bigint) df,
        |    cast(count(*) as bigint) tf
        |  from (select doc_id, unnest(list_filter(string_split(text, ' '),
        |    w -> w <> '')) tok from documents)
        |  group by tok)
        |select tok, df, tf,
        |  round(cast(df as double) / nd, 4) df_share,
        |  round(cast(tf as double) / df, 4) occ_per_doc
        |from stats cross join nd
        |where df * 10 >= nd * 4
        |order by df desc, tf desc, tok limit 20""".stripMargin,

    // E-320: identical trigram profiles and exact-sum cosine.
    "ext_langprox" ->
      """with tri as (select lang, substring(text, i, 3) g,
        |    cast(count(*) as bigint) c
        |  from documents,
        |    unnest(range(1, greatest(length(text) - 2, 0) + 1)) u(i)
        |  group by lang, substring(text, i, 3)),
        |norms as (select lang, sum(cast(c as hugeint) * c) nrm2
        |  from tri group by lang),
        |dots as (select a.lang la, b.lang lb,
        |    sum(cast(a.c as hugeint) * b.c) dot
        |  from tri a join tri b on a.g = b.g and a.lang < b.lang
        |  group by a.lang, b.lang)
        |select la, lb,
        |  round(cast(dot as double) /
        |    sqrt(cast(na.nrm2 as double) * cast(nb.nrm2 as double)), 6)
        |    cosine
        |from dots join norms na on na.lang = la
        |join norms nb on nb.lang = lb
        |order by cosine desc, la, lb""".stripMargin)
}
