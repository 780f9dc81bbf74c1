package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 90: ML split engineering — the
  * stratified train/val/test assignment audit and the temporal-split
  * entity-leakage audit, the two checks every model pipeline should
  * run before its first fit.
  */
object ExtensionQueries90 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def h60(c: org.apache.spark.sql.Column) =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  // ---- E-414 stratified split audit ----------------------------------------------
  // The 70∕15∕15 portable-hash split (twentieths 0-13∕14-16∕17-19 of
  // the E-194 assignment hash), audited per segment: cell counts,
  // within-segment shares, and the segment×split independence χ²
  // (1e-9-quantized terms, pinned χ²₈ 15.507313) — a skewed split
  // biases every per-segment metric downstream.
  def extStratsplit(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(col("c_mktsegment").as("seg"),
        pmod(h60(col("c_custkey").cast("string")), lit(20L)).as("f"))
      .withColumn("split",
        when(col("f") < 14, "1_train").when(col("f") < 17, "2_val")
          .otherwise("3_test"))
    val cells = c.groupBy("seg", "split").agg(count(lit(1)).as("n"))
    val segTot = cells.groupBy("seg").agg(sum("n").as("ns"))
    val splitTot = cells.groupBy("split").agg(sum("n").as("np"))
    val tot = cells.agg(sum("n").as("nn")).limit(1)
    val terms = cells.join(segTot, Seq("seg"))
      .join(broadcast(splitTot), Seq("split"))
      .crossJoin(broadcast(tot))
      .withColumn("exp",
        col("ns").cast("double") * col("np") / col("nn"))
      .withColumn("tq",
        round((col("n") - col("exp")) * (col("n") - col("exp")) /
          col("exp") * lit(1e9)).cast("long"))
    val chi = terms.agg(
        round(sum("tq").cast("double") / 1e9, 4).as("chi2"),
        (sum("tq").cast("double") / 1e9 > lit(15.507313))
          .as("reject_independence")).limit(1)
    terms.crossJoin(broadcast(chi))
      .select(col("seg"), col("split"), col("n"),
        round(col("n").cast("double") / col("ns"), 4)
          .as("share_in_segment"),
        col("chi2"), col("reject_independence"))
      .orderBy("seg", "split")
  }

  // ---- E-415 temporal-split leakage audit ----------------------------------------
  // Split orders at the exact p80 order date and count the customers
  // appearing on BOTH sides — the entity-overlap surface a
  // random-by-row split silently trains on. Overlap share of test
  // entities, plus the train→test revenue mean shift (exact cents
  // moments) that tells you whether the test period is even
  // exchangeable. All integers until three display divisions.
  def extTimeleakage(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_custkey"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01"))
          .cast("long").as("di"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val cut = o.agg(expr("percentile(di, 0.8)").as("cutd")).limit(1)
    val marked = o.crossJoin(broadcast(cut))
      .withColumn("is_train", col("di").cast("double") < col("cutd"))
    val ents = marked.groupBy("o_custkey")
      .agg(max(when(col("is_train"), 1L).otherwise(0L)).as("in_train"),
        max(when(!col("is_train"), 1L).otherwise(0L)).as("in_test"))
    val eAgg = ents.agg(
      sum("in_train").as("n_train_cust"),
      sum("in_test").as("n_test_cust"),
      sum(when(col("in_train") === 1 && col("in_test") === 1, 1L)
        .otherwise(0L)).as("n_overlap")).limit(1)
    val rAgg = marked.agg(
      sum(when(col("is_train"), 1L).otherwise(0L)).as("ntr"),
      sum(when(col("is_train"),
        col("cents").cast("decimal(38,0)")).otherwise(lit(0)
        .cast("decimal(38,0)"))).as("str"),
      sum(when(!col("is_train"), 1L).otherwise(0L)).as("nte"),
      sum(when(!col("is_train"),
        col("cents").cast("decimal(38,0)")).otherwise(lit(0)
        .cast("decimal(38,0)"))).as("ste")).limit(1)
    eAgg.crossJoin(broadcast(rAgg))
      .select(col("n_train_cust"), col("n_test_cust"), col("n_overlap"),
        round(col("n_overlap").cast("double") / col("n_test_cust"), 4)
          .as("overlap_share_of_test"),
        round((col("ste").cast("double") / col("nte") -
          col("str").cast("double") / col("ntr")) / 100, 2)
          .as("mean_order_shift_dollars"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_stratsplit" -> (extStratsplit _),
    "ext_timeleakage" -> (extTimeleakage _))

  val oracleSql: Map[String, String] = Map(
    // E-414: identical hash split, cells, quantized χ² terms.
    "ext_stratsplit" ->
      """with c as (select c_mktsegment seg,
        |    case when ('0x' || substr(sha256(cast(c_custkey as varchar)),
        |        1, 15))::bigint % 20 < 14 then '1_train'
        |      when ('0x' || substr(sha256(cast(c_custkey as varchar)),
        |        1, 15))::bigint % 20 < 17 then '2_val'
        |      else '3_test' end split
        |  from customer),
        |cells as (select seg, split, cast(count(*) as bigint) n
        |  from c group by 1, 2),
        |segtot as (select seg, cast(sum(n) as bigint) ns
        |  from cells group by 1),
        |splittot as (select split, cast(sum(n) as bigint) np
        |  from cells group by 1),
        |tot as (select cast(sum(n) as bigint) nn from cells),
        |terms as (select seg, split, n, ns,
        |    cast(round((n - cast(ns as double) * np / nn) *
        |      (n - cast(ns as double) * np / nn) /
        |      (cast(ns as double) * np / nn) * 1e9) as bigint) tq
        |  from cells
        |  join segtot using (seg)
        |  join splittot using (split)
        |  cross join tot),
        |chi as (select round(cast(sum(tq) as double) / 1e9, 4) chi2,
        |    (cast(sum(tq) as double) / 1e9 > 15.507313)
        |      reject_independence
        |  from terms)
        |select seg, split, n,
        |  round(cast(n as double) / ns, 4) share_in_segment,
        |  chi2, reject_independence
        |from terms cross join chi
        |order by seg, split""".stripMargin,

    // E-415: identical p80 cut, entity overlap, exact moments.
    "ext_timeleakage" ->
      """with o as (select o_custkey,
        |    date_diff('day', date '1995-01-01',
        |      cast(o_orderdate as date)) di,
        |    cast(round(o_totalprice * 100) as bigint) cents
        |  from orders),
        |cut as (select quantile_cont(di, 0.8) cutd from o),
        |marked as (select o_custkey, cents,
        |    cast(di as double) < cutd is_train
        |  from o cross join cut),
        |ents as (select o_custkey,
        |    max(case when is_train then 1 else 0 end) in_train,
        |    max(case when not is_train then 1 else 0 end) in_test
        |  from marked group by 1),
        |eagg as (select cast(sum(in_train) as bigint) n_train_cust,
        |    cast(sum(in_test) as bigint) n_test_cust,
        |    cast(sum(case when in_train = 1 and in_test = 1 then 1
        |      else 0 end) as bigint) n_overlap
        |  from ents),
        |ragg as (select
        |    cast(sum(case when is_train then 1 else 0 end) as bigint)
        |      ntr,
        |    sum(case when is_train then cast(cents as hugeint)
        |      else 0 end) str1,
        |    cast(sum(case when not is_train then 1 else 0 end)
        |      as bigint) nte,
        |    sum(case when not is_train then cast(cents as hugeint)
        |      else 0 end) ste
        |  from marked)
        |select n_train_cust, n_test_cust, n_overlap,
        |  round(cast(n_overlap as double) / n_test_cust, 4)
        |    overlap_share_of_test,
        |  round((cast(ste as double) / nte -
        |    cast(str1 as double) / ntr) / 100, 2)
        |    mean_order_shift_dollars
        |from eagg cross join ragg""".stripMargin)
}
