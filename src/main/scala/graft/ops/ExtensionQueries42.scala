package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 42: merchandising, stylometry, and
  * label hygiene — the ABC×XYZ classification matrix (value ×
  * variability), Burrows' Delta authorship distance on quantized
  * z-scores, and a label-noise screen flagging near-duplicate
  * embeddings whose labels disagree.
  */
object ExtensionQueries42 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-284 ABC × XYZ classification --------------------------------------------
  // Merchandising's 9-cell matrix: brands classified by revenue rank
  // (A = top cumulative 70%, B = next 20%, C = rest — E-158's ABC cut)
  // × demand variability (X: CV ≤ 0.8, Y ≤ 1.2, Z above, from exact
  // per-day quantity moments). Output = the cell census — where the
  // forecastable money is. CV thresholds decided on the settled CV,
  // which is one division of exact-moment terms.
  def extAbcxyz(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"), to_date(col("l_shipdate")).as("dy"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("rev"),
        sum(col("l_quantity").cast("long")).as("q"))
    val per = daily.groupBy("brand")
      .agg(sum("rev").as("rev"), count(lit(1)).as("nd"),
        sum("q").as("sq"),
        sum(col("q").cast("decimal(38,0)") * col("q")).as("sqq"))
    val wAll = Window.orderBy(desc("rev"), asc("brand"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = per.agg(sum("rev").as("trev"))
    val classed = per.crossJoin(broadcast(tot))
      .withColumn("cum", sum("rev").over(wAll))
      .withColumn("abc",
        when(col("cum") * 10 <= col("trev") * 7, "A")
          .when(col("cum") * 10 <= col("trev") * 9, "B").otherwise("C"))
      .withColumn("cv",
        sqrt((col("nd").cast("double") * col("sqq").cast("double") -
          col("sq").cast("double") * col("sq").cast("double")) /
          (col("nd").cast("double") * col("nd").cast("double"))) /
          (col("sq").cast("double") / col("nd")))
      .withColumn("xyz",
        when(col("cv") <= 0.8, "X").when(col("cv") <= 1.2, "Y")
          .otherwise("Z"))
    classed.groupBy("abc", "xyz")
      .agg(count(lit(1)).as("n_brands"),
        round(sum("rev").cast("double") / 100, 2).as("revenue"))
      .orderBy("abc", "xyz")
  }

  // ---- E-285 Burrows' Delta ------------------------------------------------------
  // Stylometric distance between sources: per-mille frequencies of the
  // 20 highest-frequency corpus words, z-scored against the
  // across-source distribution, QUANTIZED to 1e-4 (E-257 discipline)
  // so the pairwise mean |z_a − z_b| is an exact integer sum. The
  // top-10 closest source pairs are the stylistic siblings — the
  // same-pipeline-different-name screen for corpus provenance.
  def extBurrows(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("source"),
        explode(filter(split(col("text"), " "), x => x =!= "")).as("tok"))
    val top = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("tok")).limit(20).select("tok")
    val srcTotals = toks.groupBy("source").agg(count(lit(1)).as("nt"))
    val freq = toks.join(broadcast(top), "tok")
      .groupBy("source", "tok").agg(count(lit(1)).as("cw"))
      .join(srcTotals, "source")
      // per-mille frequency on the 1e-3 grid scaled to an integer
      .select(col("source"), col("tok"),
        round(col("cw").cast("double") * 1000000 / col("nt")).cast("long")
          .as("fq")) // frequency in parts-per-million, exact integer
    val stats = freq.groupBy("tok")
      .agg(count(lit(1)).as("ns"),
        sum(col("fq").cast("decimal(38,0)")).as("sf"),
        sum(col("fq").cast("decimal(38,0)") * col("fq")).as("sff"))
    val z = freq.join(stats, "tok")
      .select(col("source"), col("tok"),
        round((col("fq").cast("double") - col("sf").cast("double") /
          col("ns")) /
          sqrt((col("ns").cast("double") * col("sff").cast("double") -
            col("sf").cast("double") * col("sf").cast("double")) /
            (col("ns").cast("double") * col("ns").cast("double"))) * 10000)
          .cast("long").as("zq"))
    val pairs = z.join(z.select(col("source").as("source_b"),
        col("tok"), col("zq").as("zq_b")), "tok")
      .filter(col("source") < col("source_b"))
      .groupBy("source", "source_b")
      .agg(count(lit(1)).as("n_words"),
        sum(abs(col("zq") - col("zq_b"))).as("sum_absdz"))
    pairs.select(col("source"), col("source_b"),
        round(col("sum_absdz").cast("double") / (col("n_words") * 10000), 4)
          .as("delta"))
      .orderBy(asc("delta"), asc("source"), asc("source_b"))
      .limit(10)
  }

  // ---- E-286 label-noise screen --------------------------------------------------
  // Near-duplicate embeddings whose labels DISAGREE are the likeliest
  // labeling errors (the confident-learning intuition, geometric
  // form). Pairs from the exact cosine on the vec_id < 300 audit
  // slice (the sim_pairs_allpairs ORACLE discipline — the production
  // path would block first); the 25 MOST-similar pairs are audited,
  // ranked on the ROUNDED cosine, disagreement an integer flag.
  def extLabelnoise(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = t(s, dir, "embeddings").filter(col("vec_id") < 300).limit(300) // key-range audit slice; limit makes the bound structural (plan gate)
      .select(col("vec_id"), col("embedding"), col("label"))
    val pairs = e.select(col("vec_id").as("id_a"),
        col("embedding").as("va"), col("label").as("la"))
      .crossJoin(e.select(col("vec_id").as("id_b"),
        col("embedding").as("vb"), col("label").as("lb")))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("la"), col("lb"),
        round(call_function("cosine_sim", col("va"), col("vb")), 4)
          .as("cos"))
    pairs.select(col("id_a"), col("id_b"), col("la"), col("lb"), col("cos"),
        (col("la") =!= col("lb")).as("label_mismatch"))
      .orderBy(desc("cos"), asc("id_a"), asc("id_b"))
      .limit(25)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_abcxyz" -> (extAbcxyz _),
    "ext_burrows" -> (extBurrows _),
    "ext_labelnoise" -> (extLabelnoise _))

  val oracleSql: Map[String, String] = Map(
    // E-284: identical cumulative ABC cut and settled CV cuts.
    "ext_abcxyz" ->
      """with daily as (select p_brand brand, cast(l_shipdate as date) dy,
        |    cast(sum(cast(round(l_extendedprice * 100) as bigint))
        |      as bigint) rev,
        |    cast(sum(cast(l_quantity as bigint)) as bigint) q
        |  from lineitem join part on l_partkey = p_partkey
        |  group by 1, 2),
        |per as (select brand, cast(sum(rev) as bigint) rev,
        |    cast(count(*) as bigint) nd, cast(sum(q) as bigint) sq,
        |    sum(cast(q as hugeint) * q) sqq
        |  from daily group by brand),
        |tot as (select sum(rev) trev from per),
        |classed as (select brand, rev, nd, sq, sqq,
        |    sum(rev) over (order by rev desc, brand
        |      rows unbounded preceding) cum
        |  from per),
        |cls as (select brand, rev,
        |    case when cum * 10 <= trev * 7 then 'A'
        |      when cum * 10 <= trev * 9 then 'B' else 'C' end abc,
        |    sqrt((cast(nd as double) * cast(sqq as double) -
        |      cast(sq as double) * cast(sq as double)) /
        |      (cast(nd as double) * cast(nd as double))) /
        |      (cast(sq as double) / nd) cv
        |  from classed cross join tot)
        |select abc,
        |  case when cv <= 0.8 then 'X' when cv <= 1.2 then 'Y' else 'Z' end
        |    xyz,
        |  cast(count(*) as bigint) n_brands,
        |  round(cast(sum(rev) as double) / 100, 2) revenue
        |from cls group by 1, 2 order by abc, xyz""".stripMargin,

    // E-285: identical ppm quantization, z quantization, integer delta.
    "ext_burrows" ->
      """with toks as (select source,
        |    unnest(list_filter(string_split(text, ' '), w -> w <> '')) tok
        |  from documents),
        |top as (select tok from (select tok, count(*) c from toks
        |  group by tok order by c desc, tok limit 20)),
        |st as (select source, cast(count(*) as bigint) nt from toks
        |  group by source),
        |freq as (select t.source, t.tok,
        |    cast(round(cast(count(*) as double) * 1000000 / max(nt))
        |      as bigint) fq
        |  from toks t join top on top.tok = t.tok
        |  join st on st.source = t.source
        |  group by t.source, t.tok),
        |stats as (select tok, cast(count(*) as bigint) ns,
        |    sum(cast(fq as hugeint)) sf,
        |    sum(cast(fq as hugeint) * fq) sff
        |  from freq group by tok),
        |z as (select source, freq.tok,
        |    cast(round((cast(fq as double) - cast(sf as double) / ns) /
        |      sqrt((cast(ns as double) * cast(sff as double) -
        |        cast(sf as double) * cast(sf as double)) /
        |        (cast(ns as double) * cast(ns as double))) * 10000)
        |      as bigint) zq
        |  from freq join stats on stats.tok = freq.tok),
        |pairs as (select a.source, b.source source_b,
        |    cast(count(*) as bigint) n_words,
        |    cast(sum(abs(a.zq - b.zq)) as bigint) sum_absdz
        |  from z a join z b on a.tok = b.tok and a.source < b.source
        |  group by a.source, b.source)
        |select source, source_b,
        |  round(cast(sum_absdz as double) / (n_words * 10000), 4) delta
        |from pairs order by delta, source, source_b limit 10""".stripMargin,

    // E-286: the sim_pairs_allpairs oracle shape with the label columns.
    "ext_labelnoise" ->
      """with e as (select vec_id, cast(embedding as double[]) v, label
        |  from embeddings where vec_id < 300),
        |p as (select a.vec_id id_a, b.vec_id id_b, a.label la, b.label lb,
        |    round(list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v)) *
        |       sqrt(list_dot_product(b.v, b.v))), 4) cos
        |  from e a join e b on a.vec_id < b.vec_id)
        |select id_a, id_b, la, lb, cos, la <> lb label_mismatch
        |from p
        |order by cos desc, id_a, id_b limit 25""".stripMargin)
}
