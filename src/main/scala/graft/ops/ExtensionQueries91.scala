package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 91: ordered-alternative rank tests
  * — Jonckheere-Terpstra across the five order priorities and Page's
  * trend test over the document-quality metric trio, closing the
  * ordered-hypothesis gap beside Kruskal-Wallis∕Friedman.
  */
object ExtensionQueries91 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-416 Jonckheere-Terpstra test --------------------------------------------
  // Does order value trend MONOTONICALLY across the ordered
  // priorities (1-URGENT → 5-LOW)? JT = Σ_{i<j} U_ij with every
  // Mann-Whitney count built from the VALUE-COLLAPSED grid (strict
  // "before" prefix + ½·tie products — half-integers exact in
  // doubles, E-244 discipline), so no cross pair is ever
  // materialized. E[JT] exact integers; the no-ties variance formula
  // is the documented approximation (cent values make ties rare);
  // |z| verdict at the pinned 1.959964.
  def extJonckheere(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(substring(col("o_orderpriority"), 1, 1).cast("long").as("g"),
        round(col("o_totalprice") * 100).cast("long").as("v"))
    val byVal = o.groupBy("v", "g").agg(count(lit(1)).as("c"))
    val wg = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val pre = byVal.withColumn("p", coalesce(sum("c").over(wg), lit(0L)))
    // per value: counts+prefix for every group pair (i<j): join on v
    val pairs = pre.select(col("v"), col("g").as("gi"),
        col("c").as("ci"), col("p").as("pi"))
      .join(pre.select(col("v"), col("g").as("gj"), col("c").as("cj")),
        Seq("v"))
      .filter(col("gi") < col("gj"))
      .select((col("cj").cast("double") * col("pi") +
        lit(0.5) * col("ci") * col("cj")).as("u"))
    val jt = pairs.agg(sum("u").as("jt")).limit(1)
    val sizes = o.groupBy("g").agg(count(lit(1)).as("n"))
    val mom = sizes.agg(sum("n").as("nn"),
        sum(col("n") * col("n")).as("sn2"),
        sum(col("n").cast("decimal(38,0)") * col("n") *
          (lit(2) * col("n") + 3)).as("sn3"))
      .limit(1)
    jt.crossJoin(broadcast(mom))
      .select(round(col("jt"), 1).as("jt_stat"),
        ((col("nn") * col("nn") - col("sn2")).cast("double") / 4)
          .as("e_raw"),
        sqrt((col("nn").cast("decimal(38,0)") * col("nn") *
          (lit(2) * col("nn") + 3) - col("sn3")).cast("double") / 72)
          .as("sd_jt"))
      .select(col("jt_stat"), round(col("e_raw"), 2).as("e_jt"),
        round((col("jt_stat") - col("e_raw")) / col("sd_jt"), 4).as("z"),
        (abs((col("jt_stat") - col("e_raw")) / col("sd_jt")) >
          lit(1.959964)).as("reject_no_trend"))
  }

  // ---- E-417 Page's trend test ---------------------------------------------------
  // The ORDERED version of Friedman (E-350): with the hypothesized
  // treatment order m1 < m2 < m3 over the per-doc quality-ratio trio,
  // L = Σ_j j·R_j from the same deterministic within-doc ranks;
  // E[L] = n·k(k+1)²∕4 and Var = n·k²(k+1)(k²−1)∕144 exact integers,
  // one settled z, one-sided verdict at pinned 1.644854.
  def extPagetest(s: SparkSession, dir: String): DataFrame = {
    val toksAll = filter(split(col("text"), " "), x => x =!= "")
    val stops = array(Seq("the", "a", "of", "and", "to", "in", "is",
      "on", "for", "with").map(lit): _*)
    val m = t(s, dir, "documents")
      .select(col("doc_id"),
        size(toksAll).cast("double").as("nt"),
        size(filter(toksAll, x => array_contains(stops, x)))
          .cast("double").as("nstop"),
        size(array_distinct(toksAll)).cast("double").as("nd"),
        length(regexp_replace(col("text"), "[^a-z0-9]", ""))
          .cast("double").as("nalnum"),
        length(col("text")).cast("double").as("nc"))
      .filter(col("nt") > 0 && col("nc") > 0)
      .select(col("doc_id"),
        (col("nstop") / col("nt")).as("m1"),
        (col("nd") / col("nt")).as("m2"),
        (col("nalnum") / col("nc")).as("m3"))
    val ranked = m.select(col("doc_id"),
        explode(array(
          struct(col("m1").as("v"), lit(1L).as("j")),
          struct(col("m2").as("v"), lit(2L).as("j")),
          struct(col("m3").as("v"), lit(3L).as("j")))).as("e"))
      .select(col("doc_id"), col("e.v").as("v"), col("e.j").as("j"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy("v", "j")).cast("long"))
    val rs = ranked.groupBy("j")
      .agg(count(lit(1)).as("n"), sum("rk").as("rj"))
    rs.agg(max("n").as("n"),
        sum(col("j") * col("rj")).as("l"))
      .select(col("n").as("n_docs"), col("l").as("page_l"),
        (col("n").cast("double") * 3 * 16 / 4).as("e_l"),
        sqrt(col("n").cast("double") * 9 * 4 * 8 / 144).as("sd_l"))
      .select(col("n_docs"), col("page_l"),
        round(col("e_l"), 1).as("e_l"),
        round((col("page_l").cast("double") - col("e_l")) / col("sd_l"),
          4).as("z"),
        ((col("page_l").cast("double") - col("e_l")) / col("sd_l") >
          lit(1.644854)).as("reject_no_order"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_jonckheere" -> (extJonckheere _),
    "ext_pagetest" -> (extPagetest _))

  val oracleSql: Map[String, String] = Map(
    // E-416: identical collapsed-grid U counts, moments, z.
    "ext_jonckheere" ->
      """with o as (select
        |    cast(substr(o_orderpriority, 1, 1) as bigint) g,
        |    cast(round(o_totalprice * 100) as bigint) v
        |  from orders),
        |byval as (select v, g, cast(count(*) as bigint) c
        |  from o group by 1, 2),
        |pre as (select v, g, c,
        |    cast(coalesce(sum(c) over (partition by g order by v
        |      rows between unbounded preceding and 1 preceding), 0)
        |      as bigint) p
        |  from byval),
        |pairs as (select cast(b.c as double) * a.p +
        |      0.5 * a.c * b.c u
        |  from pre a join pre b on a.v = b.v and a.g < b.g),
        |jt as (select sum(u) jt from pairs),
        |sizes as (select g, cast(count(*) as bigint) n from o
        |  group by 1),
        |mom as (select cast(sum(n) as bigint) nn,
        |    cast(sum(n * n) as bigint) sn2,
        |    sum(cast(n as hugeint) * n * (2 * n + 3)) sn3
        |  from sizes)
        |select round(jt, 1) jt_stat,
        |  round(cast(cast(nn as hugeint) * nn - sn2 as double) / 4, 2)
        |    e_jt,
        |  round((round(jt, 1) -
        |    cast(cast(nn as hugeint) * nn - sn2 as double) / 4) /
        |    sqrt(cast(cast(nn as hugeint) * nn * (2 * nn + 3) - sn3
        |      as double) / 72), 4) z,
        |  (abs((round(jt, 1) -
        |    cast(cast(nn as hugeint) * nn - sn2 as double) / 4) /
        |    sqrt(cast(cast(nn as hugeint) * nn * (2 * nn + 3) - sn3
        |      as double) / 72)) > 1.959964) reject_no_trend
        |from jt cross join mom""".stripMargin,

    // E-417: identical ranks, L fold, exact moments.
    "ext_pagetest" ->
      """with m as (select doc_id,
        |    cast(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |      as double) nt,
        |    cast(len(list_filter(string_split(text, ' '),
        |      x -> list_contains(['the', 'a', 'of', 'and', 'to', 'in',
        |        'is', 'on', 'for', 'with'], x))) as double) nstop,
        |    cast(len(list_distinct(list_filter(string_split(text, ' '),
        |      x -> x <> ''))) as double) nd,
        |    cast(len(regexp_replace(text, '[^a-z0-9]', '', 'g'))
        |      as double) nalnum,
        |    cast(len(text) as double) nc
        |  from documents),
        |mm as (select doc_id, nstop / nt m1, nd / nt m2, nalnum / nc m3
        |  from m where nt > 0 and nc > 0),
        |ranked as (select doc_id, j, v,
        |    cast(row_number() over (partition by doc_id
        |      order by v, j) as bigint) rk
        |  from (select doc_id, 1 j, m1 v from mm
        |    union all select doc_id, 2, m2 from mm
        |    union all select doc_id, 3, m3 from mm)),
        |rs as (select j, cast(count(*) as bigint) n,
        |    cast(sum(rk) as bigint) rj
        |  from ranked group by 1),
        |agg as (select cast(max(n) as bigint) n,
        |    cast(sum(j * rj) as bigint) l
        |  from rs)
        |select n n_docs, l page_l,
        |  round(cast(n as double) * 3 * 16 / 4, 1) e_l,
        |  round((cast(l as double) - cast(n as double) * 3 * 16 / 4) /
        |    sqrt(cast(n as double) * 9 * 4 * 8 / 144), 4) z,
        |  ((cast(l as double) - cast(n as double) * 3 * 16 / 4) /
        |    sqrt(cast(n as double) * 9 * 4 * 8 / 144) > 1.644854)
        |    reject_no_order
        |from agg""".stripMargin)
}
