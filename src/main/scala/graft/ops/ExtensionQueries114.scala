package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 extension queries, batch 114: the two classic "learn from
  * co-occurrence counts" serving tables — item-item nearest-neighbor
  * recommendations (the ranked list E-59's association rules stop short
  * of) and a multinomial Naive Bayes classifier trained and scored
  * entirely in the plan. Float discipline: similarity ratios are single
  * IEEE divisions of exact integers (correctly rounded, engine-stable);
  * NB log-likelihoods are ln() quantized to 1e-9 ONCE per (token,
  * class), then every doc score is an EXACT decimal dot product of the
  * quantized table — the E-375/E-446 quantize-then-fold discipline.
  */
object ExtensionQueries114 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-456 item-item recommendation serving table ----------------------------------
  // Brand-level item-item collaborative filtering over order baskets:
  // jaccard(a,b) = |baskets(a) ∩ baskets(b)| / |baskets(a) ∪ baskets(b)|,
  // top-3 neighbors per brand. The pair join is one equi-join on the
  // basket key with a.brand < b.brand (never brand × brand × orders),
  // fan-out bounded by basket width — E-59's candidate discipline; the
  // new piece is the per-item RANKED neighbor list (the serving table a
  // recommender actually reads), with a full deterministic tiebreak.
  def extItemItemRec(s: SparkSession, dir: String): DataFrame = {
    val presence = t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("brand"))
      .distinct()
    val counts = presence.groupBy("brand").agg(count(lit(1)).as("n"))
    val co = presence.as("a")
      .join(presence.as("b"), col("a.ok") === col("b.ok") &&
        col("a.brand") < col("b.brand"))
      .groupBy(col("a.brand").as("ba"), col("b.brand").as("bb"))
      .agg(count(lit(1)).as("co"))
    // symmetrize so every brand gets a neighbor list in one ranked pass
    val directed = co.select(col("ba").as("item"), col("bb").as("nbr"), col("co"))
      .unionAll(co.select(col("bb").as("item"), col("ba").as("nbr"), col("co")))
      .join(counts.withColumnRenamed("brand", "item").withColumnRenamed("n", "ni"), Seq("item"))
      .join(counts.withColumnRenamed("brand", "nbr").withColumnRenamed("n", "nn"), Seq("nbr"))
      .withColumn("jaccard",
        col("co").cast("double") / (col("ni") + col("nn") - col("co")).cast("double"))
    val w = Window.partitionBy("item")
      .orderBy(col("jaccard").desc, col("co").desc, col("nbr").asc)
    directed.withColumn("rec_rank", row_number().over(w))
      .filter(col("rec_rank") <= 3)
      .select(col("item"), col("rec_rank"), col("nbr"), col("co"),
        round(col("jaccard"), 6).as("jaccard6"))
      .orderBy("item", "rec_rank")
  }

  // ---- E-457 multinomial Naive Bayes --------------------------------------------------
  // Train on even doc_ids (class = lang, add-one smoothing over the
  // TRAIN vocabulary), score odd doc_ids, emit the confusion matrix.
  // ll(w,c) = round(ln((n_wc + 1) / (n_c + V)), 9) is quantized once on
  // the small (vocab × class) table; each doc's class score is then the
  // exact decimal sum of quantized lls over its token OCCURRENCES plus
  // the quantized log-prior. Test tokens outside the train vocabulary
  // are ignored (standard multinomial NB practice — stated contract).
  // argmax tiebreak: score desc, lang asc. Vocab size enters the plan
  // as a broadcast 1-row aggregate, never a driver collect.
  def extNaiveBayes(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
    val train = docs.filter(col("doc_id") % 2 === 0)
    val test = docs.filter(col("doc_id") % 2 === 1)

    val trainTok = train.select(col("lang"), explode(col("toks")).as("w"))
    val nwc = trainTok.groupBy("lang", "w").agg(count(lit(1)).as("nwc"))
    val nc = trainTok.groupBy("lang").agg(count(lit(1)).as("nc"))
    val vsize = trainTok.select("w").distinct()
      .agg(count(lit(1)).as("v"))
    // smoothed log-likelihood for every (train-vocab token, class) cell;
    // the class table is domain-capped (ordered limit, E-series
    // discipline) so the cross join's small side is PROVABLY bounded —
    // a blown class domain yields a deterministic prefix the gated
    // oracle run catches as a hash mismatch
    val ll = trainTok.select("w").distinct()
      .crossJoin(broadcast(nc.orderBy(col("lang").asc).limit(64)))
      .crossJoin(broadcast(vsize))
      .join(nwc, Seq("lang", "w"), "left")
      .select(col("w"), col("lang"),
        round(log((coalesce(col("nwc"), lit(0L)) + 1).cast("double") /
          (col("nc") + col("v")).cast("double")), 9)
          .cast("decimal(38,9)").as("ll"))

    val priors = train.groupBy("lang").agg(count(lit(1)).as("ndc"))
      .crossJoin(broadcast(train.agg(count(lit(1)).as("nd"))))
      .select(col("lang"),
        round(log(col("ndc").cast("double") / col("nd").cast("double")), 9)
          .cast("decimal(38,9)").as("lprior"))

    val testTok = test.select(col("doc_id"), col("lang").as("actual"),
      explode(col("toks")).as("w"))
    val scored = testTok.join(ll, Seq("w"))
      .groupBy(col("doc_id"), col("actual"), col("lang"))
      .agg(sum(col("ll")).as("sll"))
      .join(broadcast(priors), Seq("lang"))
      .select(col("doc_id"), col("actual"), col("lang"),
        (col("sll") + col("lprior")).as("score"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("lang").asc)
    // domain_ok pins the class-cap contract IN the output: if the train
    // class domain ever outgrows the ordered limit(64), every row flips
    // to false and the oracle (which computes the uncapped domain size)
    // mismatches loudly — not as an unexplained hash drift (round-9
    // advisor note)
    val domainOk = nc.agg((count(lit(1)) <= 64).as("domain_ok"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .groupBy(col("actual"), col("lang").as("pred"))
      .agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(domainOk))
      .orderBy("actual", "pred")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_itemrec" -> (extItemItemRec _),
    "ext_naivebayes" -> (extNaiveBayes _))

  val oracleSql: Map[String, String] = Map(
    // E-456: identical pair join + IEEE-exact jaccard ranking.
    "ext_itemrec" ->
      """with presence as (
        |  select distinct l_orderkey ok, p_brand brand
        |  from lineitem join part on l_partkey = p_partkey),
        |counts as (select brand, count(*) n from presence group by 1),
        |co as (select a.brand ba, b.brand bb, count(*) co
        |  from presence a join presence b
        |    on a.ok = b.ok and a.brand < b.brand group by 1, 2),
        |directed as (
        |  select ba item, bb nbr, co from co
        |  union all
        |  select bb item, ba nbr, co from co),
        |sim as (select d.item, d.nbr, d.co,
        |    cast(d.co as double) / cast(ci.n + cn.n - d.co as double) jaccard
        |  from directed d
        |  join counts ci on ci.brand = d.item
        |  join counts cn on cn.brand = d.nbr),
        |ranked as (select item, nbr, co, jaccard,
        |    row_number() over (partition by item
        |      order by jaccard desc, co desc, nbr asc) rec_rank
        |  from sim)
        |select item, rec_rank, nbr, co, round(jaccard, 6) jaccard6
        |from ranked where rec_rank <= 3 order by item, rec_rank""".stripMargin,
    // E-457: quantize-then-fold NB scores; confusion matrix contract.
    "ext_naivebayes" ->
      """with docs as (select doc_id, lang, string_split(text, ' ') toks
        |  from documents),
        |train as (select * from docs where doc_id % 2 = 0),
        |test as (select * from docs where doc_id % 2 = 1),
        |traintok as (select lang, unnest(toks) w from train),
        |nwc as (select lang, w, count(*) nwc from traintok group by 1, 2),
        |nc as (select lang, count(*) nc from traintok group by 1
        |  order by lang limit 64),
        |vsize as (select count(distinct w) v from traintok),
        |ll as (select vv.w, nc.lang,
        |    cast(round(ln(cast(coalesce(nwc.nwc, 0) + 1 as double) /
        |      cast(nc.nc + vsize.v as double)), 9) as decimal(38,9)) ll
        |  from (select distinct w from traintok) vv
        |  cross join nc cross join vsize
        |  left join nwc on nwc.lang = nc.lang and nwc.w = vv.w),
        |priors as (select lang,
        |    cast(round(ln(cast(count(*) as double) /
        |      cast((select count(*) from train) as double)), 9)
        |      as decimal(38,9)) lprior
        |  from train group by 1),
        |testtok as (select doc_id, lang actual, unnest(toks) w from test),
        |scored as (select tt.doc_id, tt.actual, ll.lang,
        |    sum(ll.ll) + any_value(p.lprior) score
        |  from testtok tt join ll on ll.w = tt.w
        |  join priors p on p.lang = ll.lang
        |  group by 1, 2, 3),
        |pred as (select doc_id, actual, lang,
        |    row_number() over (partition by doc_id
        |      order by score desc, lang asc) rk
        |  from scored)
        |select actual, lang pred, count(*) n_docs,
        |  (select count(distinct lang) from traintok) <= 64 domain_ok
        |from pred
        |where rk = 1 group by 1, 2 order by 1, 2""".stripMargin)
}
