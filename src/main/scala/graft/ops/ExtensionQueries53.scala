package graft.ops

import graft.Tables
import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 53: measurement reliability and
  * closed-form dimensionality — intraclass correlation (how much
  * variance is BETWEEN groups), Cronbach's α over the quality items,
  * and exact 2-D PCA via the 2×2 covariance eigen closed form. All
  * moments exact decimals (quantized where the items are ratios).
  */
object ExtensionQueries53 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-315 intraclass correlation ----------------------------------------------
  // ICC(1) over nation groups of balance cents: (MSB − MSW)/(MSB +
  // (k̄−1)·MSW) with the unequal-group-size k̄ correction
  // (k̄ = (N − Σn²/N)/(g−1)) — every SS from exact decimal moments,
  // the statistic one settled form. The "is nation a real grouping"
  // number behind E-243's F.
  def extIcc(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(col("c_nationkey").as("g"),
        round(col("c_acctbal") * 100).cast("long").cast("decimal(38,0)")
          .as("v"))
    val per = c.groupBy("g")
      .agg(count(lit(1)).as("ng"), sum("v").as("sg"))
    val tot = c.agg(count(lit(1)).as("n"), sum("v").as("s"),
      sum(col("v") * col("v")).as("ss"))
    val btw = per.agg(count(lit(1)).as("gcnt"),
      sum(col("sg").cast("double") * col("sg").cast("double") / col("ng"))
        .as("sum_sg2_ng"),
      sum(col("ng") * col("ng")).as("sum_ng2"))
    btw.crossJoin(broadcast(tot))
      .withColumn("ssb", col("sum_sg2_ng") -
        col("s").cast("double") * col("s").cast("double") / col("n"))
      .withColumn("sst", col("ss").cast("double") -
        col("s").cast("double") * col("s").cast("double") / col("n"))
      .withColumn("msb", col("ssb") / (col("gcnt") - 1))
      .withColumn("msw",
        (col("sst") - col("ssb")) / (col("n") - col("gcnt")))
      .withColumn("kbar",
        (col("n").cast("double") -
          col("sum_ng2").cast("double") / col("n")) / (col("gcnt") - 1))
      .select(col("gcnt").cast("long").as("n_groups"), col("n"),
        round(col("kbar"), 4).as("kbar"),
        round((col("msb") - col("msw")) /
          (col("msb") + (col("kbar") - 1) * col("msw")), 6).as("icc1"))
  }

  // ---- E-316 Cronbach's alpha ----------------------------------------------------
  // Internal consistency of the four quality items (length-saturation,
  // distinct ratio, 1 − stop ratio, alnum ratio — the E-9 components),
  // QUANTIZED to 1e-4 ints so item variances and the total-score
  // variance come from exact decimal moments:
  // α = k/(k−1)·(1 − Σvarᵢ/var_total). Low α = the composite score is
  // averaging unrelated signals.
  def extCronbach(s: SparkSession, dir: String): DataFrame = {
    val q = TextAnalysis.qualityFeatures(t(s, dir, "documents"))
      .select(
        round(least(lit(1.0), col("n_tokens") / 100.0) * 10000)
          .cast("long").cast("decimal(38,0)").as("i1"),
        round(col("distinct_ratio") * 10000).cast("long")
          .cast("decimal(38,0)").as("i2"),
        round((lit(1.0) - col("stop_ratio")) * 10000).cast("long")
          .cast("decimal(38,0)").as("i3"),
        round(col("alnum_ratio") * 10000).cast("long")
          .cast("decimal(38,0)").as("i4"))
      .withColumn("tot", col("i1") + col("i2") + col("i3") + col("i4"))
    def varOf(c: String): org.apache.spark.sql.Column =
      (count(lit(1)) * sum(col(c) * col(c)) - sum(col(c)) * sum(col(c)))
        .cast("double")
    val m = q.agg(count(lit(1)).as("n"),
      varOf("i1").as("v1"), varOf("i2").as("v2"), varOf("i3").as("v3"),
      varOf("i4").as("v4"), varOf("tot").as("vt"))
    m.select(col("n"),
      round((col("v1") + col("v2") + col("v3") + col("v4")) / col("vt"), 6)
        .as("item_var_share"),
      round(lit(4.0) / 3 *
        (lit(1.0) - (col("v1") + col("v2") + col("v3") + col("v4")) /
          col("vt")), 6).as("cronbach_alpha"))
  }

  // ---- E-317 closed-form 2-D PCA -------------------------------------------------
  // Exact principal axes of embedding dims (0, 1), quantized to the
  // 1e-4 grid: the 2×2 covariance eigenvalues are
  // (cxx+cyy)/2 ± √(((cxx−cyy)/2)² + cxy²) in closed form — no
  // iteration, no library — giving the rotation angle and the
  // explained-variance share. The honest miniature of PCA whitening
  // (the k-D version is out of relational scope and documented so).
  def extPca2d(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "embeddings")
      .select(
        round(element_at(col("embedding"), 1).cast("double") * 10000)
          .cast("long").cast("decimal(38,0)").as("x"),
        round(element_at(col("embedding"), 2).cast("double") * 10000)
          .cast("long").cast("decimal(38,0)").as("y"))
    val m = d.agg(count(lit(1)).as("n"), sum("x").as("sx"),
      sum("y").as("sy"), sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    m.select(col("n"),
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
          .as("cxx"),
        (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
          .as("cyy"),
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          .as("cxy"))
      .withColumn("mid", (col("cxx") + col("cyy")) / 2)
      .withColumn("rad", sqrt(((col("cxx") - col("cyy")) / 2) *
        ((col("cxx") - col("cyy")) / 2) + col("cxy") * col("cxy")))
      .select(col("n"),
        round((col("mid") + col("rad")) / (col("mid") * 2), 6)
          .as("pc1_var_share"),
        round(atan2(col("mid") + col("rad") - col("cxx"), col("cxy")), 6)
          .as("pc1_angle_rad"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_icc" -> (extIcc _),
    "ext_cronbach" -> (extCronbach _),
    "ext_pca2d" -> (extPca2d _))

  val oracleSql: Map[String, String] = Map(
    // E-315: identical SS decomposition and k̄ correction.
    "ext_icc" ->
      """with c as (select c_nationkey g,
        |    cast(cast(round(c_acctbal * 100) as bigint) as hugeint) v
        |  from customer),
        |per as (select g, cast(count(*) as bigint) ng, sum(v) sg
        |  from c group by g),
        |tot as (select cast(count(*) as bigint) n, sum(v) s,
        |    sum(v * v) ss from c),
        |btw as (select cast(count(*) as bigint) gcnt,
        |    sum(cast(sg as double) * cast(sg as double) / ng) sum_sg2_ng,
        |    cast(sum(ng * ng) as bigint) sum_ng2
        |  from per),
        |f as (select gcnt, n,
        |    sum_sg2_ng - cast(s as double) * cast(s as double) / n ssb,
        |    cast(ss as double) - cast(s as double) * cast(s as double) / n
        |      sst,
        |    (cast(n as double) - cast(sum_ng2 as double) / n) / (gcnt - 1)
        |      kbar
        |  from btw cross join tot),
        |g2 as (select gcnt n_groups, n, kbar,
        |    ssb / (gcnt - 1) msb, (sst - ssb) / (n - gcnt) msw
        |  from f)
        |select n_groups, n, round(kbar, 4) kbar,
        |  round((msb - msw) / (msb + (kbar - 1) * msw), 6) icc1
        |from g2""".stripMargin,

    // E-316: identical quantized items (the ext_budget quality CTE
    // components) and variance shares.
    "ext_cronbach" ->
      """with f as (select doc_id,
        |  cast(len(list_filter(string_split(text,' '), t -> t <> '')) as double) nt,
        |  cast(len(list_filter(string_split(text,' '),
        |    t -> t in ('the','a','of','and','to','in','is','on','for','with'))) as double) nstop,
        |  cast(len(list_distinct(list_filter(string_split(text,' '), t -> t <> ''))) as double) nd,
        |  cast(length(text) as double) nc,
        |  cast(length(regexp_replace(text, '[^a-z0-9]', '', 'g')) as double) nalnum
        |  from documents),
        |items as (select
        |    cast(round(least(1.0, nt / 100.0) * 10000) as hugeint) i1,
        |    cast(round(round(case when nt > 0 then nd / nt else 0 end, 4)
        |      * 10000) as hugeint) i2,
        |    cast(round((1.0 - round(case when nt > 0 then nstop / nt
        |      else 0 end, 4)) * 10000) as hugeint) i3,
        |    cast(round(round(case when nc > 0 then nalnum / nc else 0 end,
        |      4) * 10000) as hugeint) i4
        |  from f),
        |w as (select i1, i2, i3, i4, i1 + i2 + i3 + i4 tot from items),
        |m as (select cast(count(*) as bigint) n,
        |    cast(count(*) * sum(i1 * i1) - sum(i1) * sum(i1) as double) v1,
        |    cast(count(*) * sum(i2 * i2) - sum(i2) * sum(i2) as double) v2,
        |    cast(count(*) * sum(i3 * i3) - sum(i3) * sum(i3) as double) v3,
        |    cast(count(*) * sum(i4 * i4) - sum(i4) * sum(i4) as double) v4,
        |    cast(count(*) * sum(tot * tot) - sum(tot) * sum(tot) as double)
        |      vt
        |  from w)
        |select n,
        |  round((v1 + v2 + v3 + v4) / vt, 6) item_var_share,
        |  round(4.0 / 3 * (1.0 - (v1 + v2 + v3 + v4) / vt), 6)
        |    cronbach_alpha
        |from m""".stripMargin,

    // E-317: identical quantization and 2×2 eigen closed form.
    "ext_pca2d" ->
      """with d as (select
        |    cast(cast(round(cast(embedding[1] as double) * 10000) as bigint)
        |      as hugeint) x,
        |    cast(cast(round(cast(embedding[2] as double) * 10000) as bigint)
        |      as hugeint) y
        |  from embeddings),
        |m as (select cast(count(*) as bigint) n, sum(x) sx, sum(y) sy,
        |    sum(x * x) sxx, sum(y * y) syy, sum(x * y) sxy from d),
        |c as (select n,
        |    cast(n * sxx - sx * sx as double) cxx,
        |    cast(n * syy - sy * sy as double) cyy,
        |    cast(n * sxy - sx * sy as double) cxy
        |  from m),
        |e as (select n, cxx, cxy,
        |    (cxx + cyy) / 2 mid,
        |    sqrt(((cxx - cyy) / 2) * ((cxx - cyy) / 2) + cxy * cxy) rad
        |  from c)
        |select n,
        |  round((mid + rad) / (mid * 2), 6) pc1_var_share,
        |  round(atan2(mid + rad - cxx, cxy), 6) pc1_angle_rad
        |from e""".stripMargin)
}
