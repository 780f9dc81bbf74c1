package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 82: phrase mining and in-database
  * mixture modelling — RAKE keyphrases via gaps-and-islands phrase
  * extraction, and a two-component Gaussian mixture on log order
  * totals fit by two unrolled EM steps.
  */
object ExtensionQueries82 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-394 RAKE keyphrases -----------------------------------------------------
  // Rapid automatic keyword extraction: candidate phrases = maximal
  // stopword-free token runs (gaps-and-islands on token positions, run
  // length ≤ 4), word score = deg∕freq over phrase memberships (deg =
  // Σ phrase length — the co-occurrence variant, documented), phrase
  // score = Σ member word scores with 1e-9-quantized word scores so
  // the fold is order-free. Identical phrases aggregate across the
  // corpus; top-15 by (score, support, text).
  def extRake(s: SparkSession, dir: String): DataFrame = {
    val stops = array(Seq("the", "a", "of", "and", "to", "in", "is",
      "on", "for", "with").map(lit): _*)
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "w")
      .filter(col("w") =!= "")
    val nonstop = toks.filter(!array_contains(stops, col("w")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy("p")).cast("long"))
      .withColumn("island", col("p") - col("rn"))
    val phrases = nonstop
      .groupBy(col("doc_id"), col("island"))
      .agg(count(lit(1)).as("plen"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("p"), col("w")))),
          x => x.getField("w"))).as("phrase"))
      .filter(col("plen") <= 4)
    val members = nonstop
      .join(phrases.select(col("doc_id"), col("island"), col("plen"),
        col("phrase")), Seq("doc_id", "island"))
    val wordStats = members.groupBy("w")
      .agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
      .select(col("w"),
        round(col("deg").cast("double") * 1e9 / col("freq")).cast("long")
          .as("wsq"))
    val scored = members.join(wordStats, Seq("w"))
      .groupBy(col("doc_id"), col("island"), col("phrase"))
      .agg(sum("wsq").as("psq"))
    scored.groupBy("phrase")
      .agg(count(lit(1)).as("support"), max("psq").as("psq"))
      .select(col("phrase"), col("support"),
        round(col("psq").cast("double") / 1e9, 4).as("rake_score"))
      .orderBy(desc("rake_score"), desc("support"), asc("phrase"))
      .limit(15)
  }

  // ---- E-395 two-component Gaussian mixture (2 EM steps) -------------------------
  // Is the log order-total distribution one population or two? A
  // 2-component equal-variance GMM fit by TWO unrolled EM steps from
  // a deterministic init (μ at the exact p25∕p75 of 1e-6-quantized
  // log cents, shared σ² = overall variance, π = ½). Responsibilities
  // collapse to one settled logistic per row (shared σ cancels the
  // normalizers); they are 1e-9-quantized before every M-step fold,
  // and parameters re-quantize to integers after each step — both
  // engines walk identical integer states. σ updates against the
  // step's OLD means (documented single-pass simplification).
  def extGmm2(s: SparkSession, dir: String): DataFrame = {
    val x = t(s, dir, "orders")
      .select(round(log(round(col("o_totalprice") * 100)) * 1e6)
        .cast("long").as("x"))
    val init = x.agg(count(lit(1)).as("n"),
        round(expr("percentile(x, 0.25)")).cast("long").as("mu1"),
        round(expr("percentile(x, 0.75)")).cast("long").as("mu2"),
        sum(col("x").cast("decimal(38,0)")).as("s1"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("s2"))
      .select(col("n"), col("mu1"), col("mu2"), lit(500000000L).as("piq"),
        round((col("n") * col("s2") - col("s1") * col("s1")).cast("double") /
          col("n").cast("double") / (col("n") - 1).cast("double"))
          .cast("long").as("s2q"))
      .limit(1)
    def emStep(params: DataFrame): DataFrame = {
      val e = x.crossJoin(broadcast(params))
        .withColumn("d1",
          (col("x") - col("mu1")).cast("double") *
            (col("x") - col("mu1")).cast("double"))
        .withColumn("d2",
          (col("x") - col("mu2")).cast("double") *
            (col("x") - col("mu2")).cast("double"))
        .withColumn("r1q",
          round(lit(1e9) / (lit(1.0) +
            ((lit(1e9) - col("piq")).cast("double") / col("piq")) *
              exp((col("d1") - col("d2")) /
                (lit(2.0) * col("s2q").cast("double"))))).cast("long"))
      e.agg(first("n").as("n"),
          sum(col("r1q").cast("decimal(38,0)")).as("sr"),
          sum(col("r1q").cast("decimal(38,0)") * col("x")).as("srx"),
          sum((lit(1000000000L) - col("r1q")).cast("decimal(38,0)") *
            col("x")).as("srx2"),
          sum(round(col("r1q").cast("double") / 1e9 * col("d1") +
            (lit(1.0) - col("r1q").cast("double") / 1e9) * col("d2"))
            .cast("decimal(38,0)")).as("sv"))
        .select(col("n"),
          round(col("srx").cast("double") / col("sr").cast("double"))
            .cast("long").as("mu1"),
          round(col("srx2").cast("double") /
            (col("n").cast("double") * 1e9 - col("sr").cast("double")))
            .cast("long").as("mu2"),
          round(col("sr").cast("double") / col("n").cast("double"))
            .cast("long").as("piq"),
          round(col("sv").cast("double") / col("n").cast("double"))
            .cast("long").as("s2q"))
        .limit(1)
    }
    val p2 = emStep(emStep(init))
    p2.select(col("n").as("n_orders"),
      round(col("piq").cast("double") / 1e9, 4).as("pi_1"),
      round(col("mu1").cast("double") / 1e6, 4).as("mu1_ln"),
      round(col("mu2").cast("double") / 1e6, 4).as("mu2_ln"),
      round(sqrt(col("s2q").cast("double")) / 1e6, 4).as("sigma_ln"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_rake" -> (extRake _),
    "ext_gmm2" -> (extGmm2 _))

  private val emSql =
    """x as (select cast(round(ln(round(o_totalprice * 100)) * 1e6)
      |    as bigint) x
      |  from orders),
      |init as (select cast(count(*) as bigint) n,
      |    cast(round(quantile_cont(x, 0.25)) as bigint) mu1,
      |    cast(round(quantile_cont(x, 0.75)) as bigint) mu2,
      |    cast(500000000 as bigint) piq,
      |    cast(round(cast(count(*) * sum(cast(x as hugeint) * x) -
      |      sum(cast(x as hugeint)) * sum(cast(x as hugeint))
      |      as double) / cast(count(*) as double) /
      |      cast(count(*) - 1 as double)) as bigint) s2q
      |  from x)""".stripMargin

  private def emStepSql(k: Int): String = {
    val prev = if (k == 1) "init" else s"p${k - 1}"
    s"""e$k as (select x.x, p.n,
       |    cast(x.x - p.mu1 as double) * cast(x.x - p.mu1 as double) d1,
       |    cast(x.x - p.mu2 as double) * cast(x.x - p.mu2 as double) d2,
       |    p.piq, p.s2q
       |  from x cross join $prev p),
       |r$k as (select n, x, d1, d2,
       |    cast(round(1e9 / (1.0 +
       |      (cast(1e9 - piq as double) / piq) *
       |      exp((d1 - d2) / (2.0 * cast(s2q as double)))))
       |      as bigint) r1q
       |  from e$k),
       |p$k as (select any_value(n) n,
       |    cast(round(cast(sum(cast(r1q as hugeint) * x) as double) /
       |      cast(sum(cast(r1q as hugeint)) as double)) as bigint) mu1,
       |    cast(round(cast(sum(cast(1000000000 - r1q as hugeint) * x)
       |        as double) /
       |      (cast(any_value(n) as double) * 1e9 -
       |        cast(sum(cast(r1q as hugeint)) as double))) as bigint) mu2,
       |    cast(round(cast(sum(cast(r1q as hugeint)) as double) /
       |      cast(any_value(n) as double)) as bigint) piq,
       |    cast(round(cast(sum(cast(cast(round(
       |        cast(r1q as double) / 1e9 * d1 +
       |        (1.0 - cast(r1q as double) / 1e9) * d2) as bigint)
       |        as hugeint)) as double) /
       |      cast(any_value(n) as double)) as bigint) s2q
       |  from r$k)""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    // E-394: identical islands, word scores, quantized phrase folds.
    "ext_rake" ->
      """with toks as (select doc_id, p - 1 p, w
        |  from (select doc_id,
        |      unnest(string_split(text, ' ')) w,
        |      generate_subscripts(string_split(text, ' '), 1) p
        |    from documents)
        |  where w <> ''),
        |nonstop as (select doc_id, p, w,
        |    p - row_number() over (partition by doc_id order by p)
        |      island
        |  from toks
        |  where not list_contains(['the', 'a', 'of', 'and', 'to', 'in',
        |    'is', 'on', 'for', 'with'], w)),
        |phrases as (select doc_id, island,
        |    cast(count(*) as bigint) plen,
        |    string_agg(w, ' ' order by p) phrase
        |  from nonstop group by 1, 2
        |  having count(*) <= 4),
        |members as (select n.doc_id, n.island, n.w, ph.plen, ph.phrase
        |  from nonstop n join phrases ph
        |    on ph.doc_id = n.doc_id and ph.island = n.island),
        |ws as (select w,
        |    cast(round(cast(sum(plen) as double) * 1e9 / count(*))
        |      as bigint) wsq
        |  from members group by 1),
        |scored as (select doc_id, island, phrase,
        |    cast(sum(wsq) as bigint) psq
        |  from members join ws using (w)
        |  group by 1, 2, 3)
        |select phrase, cast(count(*) as bigint) support,
        |  round(cast(max(psq) as double) / 1e9, 4) rake_score
        |from scored group by phrase
        |order by rake_score desc, support desc, phrase asc
        |limit 15""".stripMargin,

    // E-395: identical init, two unrolled quantized EM steps.
    "ext_gmm2" ->
      s"""with $emSql,
        |${emStepSql(1)},
        |${emStepSql(2)}
        |select n n_orders,
        |  round(cast(piq as double) / 1e9, 4) pi_1,
        |  round(cast(mu1 as double) / 1e6, 4) mu1_ln,
        |  round(cast(mu2 as double) / 1e6, 4) mu2_ln,
        |  round(sqrt(cast(s2q as double)) / 1e6, 4) sigma_ln
        |from p2""".stripMargin)
}
