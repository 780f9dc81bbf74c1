package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 49: pipeline tuning and diffing —
  * the dedup threshold-sensitivity curve (how many pairs each τ cut
  * keeps), corpus snapshot diffing by content hash (the ingest
  * accounting ledger), and funnel abandonment timing (how long users
  * dwell before converting vs before giving up).
  */
object ExtensionQueries49 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-304 dedup threshold curve -----------------------------------------------
  // Before picking τ for near-dup removal: exact token-set Jaccard on
  // the consecutive-doc audit pairs (E-250's frame), counted at each
  // τ ∈ {0.1 … 0.9} — integer pair counts per threshold from one pass
  // × the 9-row spine; the knob-tuning curve that shows where the
  // pair volume cliffs.
  def extThreshcurve(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id").cast("long").as("id"),
        explode(array_distinct(filter(split(col("text"), " "),
          x => x =!= ""))).as("tok"))
    val sizes = toks.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = toks.join(
        toks.select((col("id") - 1).as("id"), col("tok")), Seq("id", "tok"))
      .groupBy("id").agg(count(lit(1)).as("ni"))
    val pairs = sizes
      .join(sizes.select((col("id") - 1).as("id"), col("sz").as("szb")),
        Seq("id"))
      .join(inter, Seq("id"), "left")
      .select(coalesce(col("ni"), lit(0L)).as("ni"),
        (col("sz") + col("szb") - coalesce(col("ni"), lit(0L))).as("nu"))
    val ths = t(s, dir, "documents").sparkSession.range(1, 10)
      .select(col("id").cast("long").as("tq"))
    pairs.crossJoin(broadcast(ths))
      .groupBy("tq")
      .agg(count(lit(1)).as("n_pairs"),
        // jaccard >= tq/10  ⇔  10·ni >= tq·nu  (integer cross-multiply)
        sum(when(col("ni") * 10 >= col("tq") * col("nu"), 1L)
          .otherwise(0L)).as("n_over"))
      .select(round(col("tq").cast("double") / 10, 1).as("tau"),
        col("n_pairs"), col("n_over"),
        round(col("n_over").cast("double") / col("n_pairs"), 6)
          .as("share_over"))
      .orderBy("tau")
  }

  // ---- E-305 corpus snapshot diff ------------------------------------------------
  // Ingest accounting between snapshot A (the fixture) and a
  // synthesized snapshot B (every 7th doc's text updated, every 13th
  // dropped, an 11th-slice of NEW ids added): added / removed /
  // changed / unchanged by doc_id with change detected by sha256 —
  // the corpus-level E-88 tablediff, counting bytes so storage deltas
  // reconcile too.
  def extCorpusdiff(s: SparkSession, dir: String): DataFrame = {
    val a = t(s, dir, "documents")
      .select(col("doc_id").cast("long").as("id"), col("text"))
    val b0 = a.filter(pmod(col("id"), lit(13L)) =!= 0)
      .select(col("id"),
        when(pmod(col("id"), lit(7L)) === 0, concat(col("text"),
          lit(" updated"))).otherwise(col("text")).as("text"))
    val bNew = a.filter(pmod(col("id"), lit(11L)) === 0)
      .select((col("id") + 1000000L).as("id"), col("text"))
    val b = b0.unionAll(bNew)
    val j = a.select(col("id"), sha2(col("text"), 256).as("ha"),
        length(col("text")).cast("long").as("la"))
      .join(b.select(col("id"), sha2(col("text"), 256).as("hb"),
        length(col("text")).cast("long").as("lb")), Seq("id"), "full")
    j.agg(
        sum(when(col("ha").isNull, 1L).otherwise(0L)).as("added"),
        sum(when(col("hb").isNull, 1L).otherwise(0L)).as("removed"),
        sum(when(col("ha").isNotNull && col("hb").isNotNull &&
          col("ha") =!= col("hb"), 1L).otherwise(0L)).as("changed"),
        sum(when(col("ha") === col("hb"), 1L).otherwise(0L))
          .as("unchanged"),
        sum(coalesce(col("lb"), lit(0L)) - coalesce(col("la"), lit(0L)))
          .as("bytes_delta"))
  }

  // ---- E-306 funnel abandonment timing -------------------------------------------
  // After the FIRST view, does a click follow within 6 h — and how
  // fast? Converters report mean minutes view→first-click; abandoners
  // (no click in the window) are counted with their remaining
  // same-session dwell. All integer µs until the display divisions.
  def extAbandonment(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val firstView = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("v_us"))
    val firstClick = e.filter(col("event_type") === "click")
      .join(firstView, "user_id")
      .filter(col("us") >= col("v_us"))
      .groupBy("user_id").agg(min("us").as("c_us"), min("v_us").as("v_us"))
    val joined = firstView
      .join(firstClick.select(col("user_id"), col("c_us")),
        Seq("user_id"), "left")
      .withColumn("converted",
        col("c_us").isNotNull &&
          col("c_us") - col("v_us") <= 6L * 3600L * 1000000L)
    joined.agg(count(lit(1)).as("n_viewers"),
        sum(when(col("converted"), 1L).otherwise(0L)).as("n_converted"),
        sum(when(col("converted"), col("c_us") - col("v_us"))
          .otherwise(0L)).as("sum_latency_us"))
      .select(col("n_viewers"), col("n_converted"),
        (col("n_viewers") - col("n_converted")).as("n_abandoned"),
        round(col("n_converted").cast("double") / col("n_viewers"), 6)
          .as("conversion_rate"),
        round(col("sum_latency_us").cast("double") / col("n_converted") /
          60000000L, 4).as("mean_minutes_to_click"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_threshcurve" -> (extThreshcurve _),
    "ext_corpusdiff" -> (extCorpusdiff _),
    "ext_abandonment" -> (extAbandonment _))

  val oracleSql: Map[String, String] = Map(
    // E-304: identical audit pairs and cross-multiplied threshold.
    "ext_threshcurve" ->
      """with toks as (select cast(doc_id as bigint) id,
        |    unnest(list_distinct(list_filter(string_split(text, ' '),
        |      w -> w <> ''))) tok
        |  from documents),
        |sizes as (select id, cast(count(*) as bigint) sz
        |  from toks group by id),
        |inter as (select a.id, cast(count(*) as bigint) ni
        |  from toks a join toks b on b.id = a.id + 1 and b.tok = a.tok
        |  group by a.id),
        |pairs as (select coalesce(ni, 0) ni,
        |    sa.sz + sb.sz - coalesce(ni, 0) nu
        |  from sizes sa join sizes sb on sb.id = sa.id + 1
        |  left join inter on inter.id = sa.id),
        |curve as (select tq, cast(count(*) as bigint) n_pairs,
        |    cast(sum(case when ni * 10 >= tq * nu then 1 else 0 end)
        |      as bigint) n_over
        |  from pairs cross join unnest(range(1, 10)) u(tq)
        |  group by tq)
        |select round(cast(tq as double) / 10, 1) tau, n_pairs, n_over,
        |  round(cast(n_over as double) / n_pairs, 6) share_over
        |from curve order by tau""".stripMargin,

    // E-305: identical synthesized snapshot and full-outer accounting.
    "ext_corpusdiff" ->
      """with a as (select cast(doc_id as bigint) id, text from documents),
        |b as (
        |  select id, case when id % 7 = 0 then text || ' updated'
        |    else text end "text"
        |  from a where id % 13 <> 0
        |  union all
        |  select id + 1000000, text from a where id % 11 = 0),
        |ha as (select id, sha256(text) h, cast(length(text) as bigint) l
        |  from a),
        |hb as (select id, sha256(text) h, cast(length(text) as bigint) l
        |  from b),
        |j as (select ha.id ida, hb.id idb, ha.h hha, hb.h hhb,
        |    ha.l la, hb.l lb
        |  from ha full join hb on ha.id = hb.id)
        |select cast(sum(case when hha is null then 1 else 0 end) as bigint)
        |    added,
        |  cast(sum(case when hhb is null then 1 else 0 end) as bigint)
        |    removed,
        |  cast(sum(case when hha is not null and hhb is not null
        |    and hha <> hhb then 1 else 0 end) as bigint) changed,
        |  cast(sum(case when hha = hhb then 1 else 0 end) as bigint)
        |    unchanged,
        |  cast(sum(coalesce(lb, 0) - coalesce(la, 0)) as bigint)
        |    bytes_delta
        |from j""".stripMargin,

    // E-306: identical first-view/first-click windowed semantics.
    "ext_abandonment" ->
      """with e as (select user_id, event_type, epoch_us(ts) us
        |  from events),
        |fv as (select user_id, min(us) v_us from e
        |  where event_type = 'view' group by user_id),
        |fc as (select e.user_id, min(us) c_us, min(v_us) v_us
        |  from e join fv on fv.user_id = e.user_id
        |  where event_type = 'click' and us >= v_us
        |  group by e.user_id),
        |j as (select fv.user_id, fv.v_us, fc.c_us,
        |    fc.c_us is not null and fc.c_us - fv.v_us <= 21600000000
        |      converted
        |  from fv left join fc on fc.user_id = fv.user_id)
        |select cast(count(*) as bigint) n_viewers,
        |  cast(sum(case when converted then 1 else 0 end) as bigint)
        |    n_converted,
        |  cast(count(*) - sum(case when converted then 1 else 0 end)
        |    as bigint) n_abandoned,
        |  round(cast(sum(case when converted then 1 else 0 end) as double)
        |    / count(*), 6) conversion_rate,
        |  round(cast(sum(case when converted then c_us - v_us else 0 end)
        |    as double) / sum(case when converted then 1 else 0 end)
        |    / 60000000, 4) mean_minutes_to_click
        |from j""".stripMargin)
}
