package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 contract queries: the Spark 4 SQL-surface round-out — pipe
  * syntax, lateral column aliases, EXECUTE IMMEDIATE, and observed
  * metrics (`Dataset.observe`). Each is a user-facing entry point a
  * reference migrant would reach for; the oracles re-express the same
  * semantics in plain ANSI SQL.
  */
object ContractQueries6 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- Q120 SQL pipe syntax (Q-PIPE) -----------------------------------------
  // The Spark 4 `|>` operator chain: FROM |> WHERE |> AGGREGATE |>
  // EXTEND |> SELECT |> ORDER BY — same logical plan as the nested
  // form (Catalyst sees identical operators), so this is purely a
  // parser surface, but one a pipeline author will actually use.
  // Quantities and cents stay integer-exact inside the aggregate.
  def q120Pipe(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """FROM lineitem
        ||> WHERE l_shipdate <= DATE '1998-09-02'
        ||> AGGREGATE SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
        |     COUNT(*) AS n,
        |     SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS cents
        |     GROUP BY l_returnflag, l_linestatus
        ||> EXTEND ROUND(CAST(cents AS DOUBLE) / 100.0 / n, 2) AS avg_price
        ||> SELECT l_returnflag, l_linestatus, sum_qty, n, cents, avg_price
        ||> ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  // ---- Q121 lateral column aliases (Q-LCA) -----------------------------------
  // A SELECT item referencing an alias defined earlier in the SAME
  // select list — the spreadsheet-style derivation chain (cents →
  // fee → total) with each step an exact integer expression.
  def q121Lca(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT o_orderkey,
        |  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
        |  cents + 250 AS cents_fee,
        |  cents_fee * 2 AS cents_x2
        |FROM orders WHERE o_orderkey <= 1000
        |ORDER BY o_orderkey""".stripMargin)
  }

  // ---- Q122 EXECUTE IMMEDIATE (Q-EXECIMM) ------------------------------------
  // Dynamic SQL with a positional parameter — the templated-query
  // entry point (Spark 4). The parameter binds as a literal, so the
  // optimizer still sees a constant predicate to push down.
  def q122ExecImm(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """EXECUTE IMMEDIATE
        |  'SELECT c_nationkey, COUNT(*) AS n,
        |     SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS cents
        |   FROM customer WHERE c_custkey <= ?
        |   GROUP BY c_nationkey ORDER BY c_nationkey'
        |  USING 500""".stripMargin)
  }

  private val obsId = new java.util.concurrent.atomic.AtomicLong(0)

  // ---- Q123 observed metrics (S-21) ------------------------------------------
  // `Dataset.observe`: pipeline health metrics piggyback on the SAME
  // pass as the real action (here a noop-sink write) — at 100 TB this
  // is the difference between free row counts and a second full scan.
  // The observation name is unique per call (listener registry), but
  // the OUTPUT is the metrics row itself, which is deterministic.
  def q123Observe(s: SparkSession, dir: String): DataFrame = {
    val obs = new org.apache.spark.sql.Observation(
      s"q123_obs_${obsId.incrementAndGet()}")
    val base = t(s, dir, "orders").observe(obs,
      count(lit(1)).as("n_rows"),
      sum(round(col("o_totalprice") * 100).cast("long")).as("cents_total"),
      min(round(col("o_totalprice") * 100).cast("long")).as("cents_min"),
      max(round(col("o_totalprice") * 100).cast("long")).as("cents_max"))
    base.write.format("noop").mode("overwrite").save()
    val m = obs.get
    import s.implicits._
    Seq((m("n_rows").asInstanceOf[Long], m("cents_total").asInstanceOf[Long],
      m("cents_min").asInstanceOf[Long], m("cents_max").asInstanceOf[Long]))
      .toDF("n_rows", "cents_total", "cents_min", "cents_max")
  }

  // ---- Q124 nearest as-of join (J-7c) ----------------------------------------
  // The missing direction of the as-of family (backward Q20, forward
  // q70, tolerance q91): the single order MINIMIZING |order − event|
  // regardless of side, ties to the earlier order then the smaller
  // key. Spec form: inequality-free pair join per user + one
  // (gap, date, key) rank — the oracle shape; the linear merge of
  // ops.AsOf generalizes the same way at scale (min of the backward
  // and forward candidates per row).
  def q124AsofNearest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = t(s, dir, "events").select("event_id", "user_id", "ts")
    val o = t(s, dir, "orders")
      .select("o_custkey", "o_orderkey", "o_orderdate")
    val gap = abs(unix_micros(col("o_orderdate").cast("timestamp")) -
      unix_micros(col("ts")))
    val w = Window.partitionBy("event_id")
      .orderBy(col("gap"), col("o_orderdate"), col("o_orderkey"))
    e.join(o, col("o_custkey") === col("user_id"))
      .withColumn("gap", gap)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("o_orderkey"), col("gap"))
      .orderBy("event_id")
      .limit(50)
  }

  // ---- Q125 case-insensitive collation (Q-COLL) ------------------------------
  // Spark 4 collations: grouping under UTF8_LCASE folds case variants
  // (synthesized: every even custkey's segment lower-cased) into one
  // group. The output key is normalized through lower() so the
  // representative choice can't leak engine internals; the oracle is
  // the classic lower() rewrite — same groups, same counts.
  def q125Collate(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT lower(seg2 COLLATE UTF8_LCASE) AS seg, COUNT(*) AS n,
        |  COUNT(DISTINCT seg2) AS n_variants
        |FROM (
        |  SELECT CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
        |    ELSE c_mktsegment END AS seg2
        |  FROM customer)
        |GROUP BY seg2 COLLATE UTF8_LCASE
        |ORDER BY seg""".stripMargin)
  }

  // ---- Q126 named WINDOW clause (Q-NAMEDWIN) ---------------------------------
  // One WINDOW definition shared by four window functions — the SQL
  // surface that keeps analytic queries readable; semantically
  // identical to inlining the spec four times (which is the oracle).
  def q126NamedWin(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT o_custkey,
        |  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
        |  ROW_NUMBER() OVER w AS rn,
        |  RANK() OVER w AS rk,
        |  LAG(o_orderkey) OVER w AS prev_key,
        |  SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w AS run_cents
        |FROM orders
        |WHERE o_custkey <= 20
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin)
  }

  // ---- Q127 inline VALUES lookup (Q-VALUES) ----------------------------------
  // The literal lookup-table join every ad-hoc report uses: priority →
  // SLA-days via an inline VALUES relation, joined and aggregated.
  // Catalyst treats VALUES as a LocalRelation — broadcast for free.
  def q127Values(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT v.sla_days, COUNT(*) AS n_orders,
        |  SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
        |FROM orders
        |JOIN (VALUES ('1-URGENT', 1), ('2-HIGH', 2), ('3-MEDIUM', 5),
        |  ('4-NOT SPECIFIED', 7), ('5-LOW', 10)) AS v(prio, sla_days)
        |  ON o_orderpriority = v.prio
        |GROUP BY v.sla_days
        |ORDER BY v.sla_days""".stripMargin)
  }

  // ---- Q128 month-boundary semantics (F-2f) ----------------------------------
  // The month-arithmetic edge cases every report eventually hits,
  // pinned on a spine of boundary dates: last_day, add_months ±1 with
  // end-of-month CLAMPING (Jan 31 + 1 month = Feb 29 in a leap year,
  // Feb 28 otherwise — both engines clamp, and this query proves it),
  // and next-month-end composition.
  def q128MonthEnd(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val spine = Seq("1996-01-31", "1996-01-30", "1996-02-29", "1995-02-28",
      "1995-01-31", "1996-12-31", "1996-08-31", "1996-04-30")
      .toDF("ds").select(col("ds").cast("date").as("d"))
    spine.select(col("d").cast("string").as("d"),
        last_day(col("d")).cast("string").as("month_end"),
        add_months(col("d"), 1).cast("string").as("plus_1m"),
        add_months(col("d"), -1).cast("string").as("minus_1m"),
        last_day(add_months(col("d"), 1)).cast("string")
          .as("next_month_end"))
      .orderBy("d")
  }

  // ---- Q129 permissive JSON with corrupt capture (S-22) ----------------------
  // JSONL ingestion under PERMISSIVE mode with a _corrupt_record
  // column: good rows parse, malformed lines survive AS DATA (the
  // quarantine pattern — q115's DROPMALFORMED silently discards
  // instead). Three corrupt lines are planted; the gate pins both the
  // good-row aggregate and the quarantine count.
  def q129BadJson(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // per-JVM unique dir: a fixed hash-derived path raced concurrent
    // sessions on the same fixture (and math.abs(Int.MinValue) < 0).
    // Registered for recursive delete at JVM exit — the returned frame
    // reads the dir lazily, so deletion can only happen at shutdown.
    val tmpDir = java.nio.file.Files.createTempDirectory("graft_badjson_")
    val tmp = tmpDir.toString
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files => F}
      import scala.jdk.CollectionConverters._
      try F.walk(tmpDir).iterator().asScala.toSeq.reverse
        .foreach(p => F.deleteIfExists(p))
      catch { case _: Throwable => () } // best-effort cleanup
    }))
    val clean = t(s, dir, "nation")
      .select(to_json(struct(col("n_nationkey"), col("n_name"),
        col("n_regionkey"))))
      .as[String].collect() // 25 rows — bounded fixture write
    s.createDataset(
        clean.toSeq ++ Seq("{not json", "[1,2", "{\"n_nationkey\": }"))
      .coalesce(1).write.mode("overwrite").text(tmp)
    s.read
      .schema("n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT, " +
        "_corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(tmp)
      .agg(
        sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L))
          .as("n_good"),
        sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L))
          .as("n_quarantined"),
        sum("n_nationkey").as("key_sum"),
        countDistinct("n_regionkey").as("n_regions"))
  }

  // ---- Q130 IDENTIFIER clause (Q-IDENT) --------------------------------------
  // Templated object names the injection-safe way: IDENTIFIER(:tbl)
  // resolves a parameter to a table reference (Spark 4) — the DDL/DML
  // templating primitive; the oracle is the resolved plain query.
  def q130Identifier(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT r_regionkey, r_name FROM IDENTIFIER(:tbl)
        |ORDER BY r_regionkey""".stripMargin,
      Map("tbl" -> "region"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q130_identifier" -> (q130Identifier _),
    "q129_badjson" -> (q129BadJson _),
    "q128_monthend" -> (q128MonthEnd _),
    "q126_namedwin" -> (q126NamedWin _),
    "q127_values" -> (q127Values _),
    "q125_collate" -> (q125Collate _),
    "q124_asof_nearest" -> (q124AsofNearest _),
    "q120_pipe" -> (q120Pipe _),
    "q121_lca" -> (q121Lca _),
    "q122_execimm" -> (q122ExecImm _),
    "q123_observe" -> (q123Observe _))

  val oracleSql: Map[String, String] = Map(
    // q130: the resolved plain query.
    "q130_identifier" ->
      """select cast(r_regionkey as bigint) r_regionkey, r_name
        |from region order by r_regionkey""".stripMargin,

    // q129: good rows replay from nation; the 3 planted corrupt lines
    // are part of the op's spec (the synthesis is deterministic).
    "q129_badjson" ->
      """select cast(count(*) as bigint) n_good,
        |  cast(3 as bigint) n_quarantined,
        |  cast(sum(n_nationkey) as bigint) key_sum,
        |  cast(count(distinct n_regionkey) as bigint) n_regions
        |from nation""".stripMargin,

    // q128: DuckDB's interval arithmetic clamps the same way.
    "q128_monthend" ->
      """with spine as (select cast(ds as date) d from (values
        |  ('1996-01-31'), ('1996-01-30'), ('1996-02-29'), ('1995-02-28'),
        |  ('1995-01-31'), ('1996-12-31'), ('1996-08-31'), ('1996-04-30'))
        |  v(ds))
        |select strftime(d, '%Y-%m-%d') d,
        |  strftime(last_day(d), '%Y-%m-%d') month_end,
        |  strftime(cast(d + interval 1 month as date), '%Y-%m-%d') plus_1m,
        |  strftime(cast(d - interval 1 month as date), '%Y-%m-%d') minus_1m,
        |  strftime(last_day(cast(d + interval 1 month as date)),
        |    '%Y-%m-%d') next_month_end
        |from spine order by d""".stripMargin,

    // q126: the window spec inlined (DuckDB also supports WINDOW, but
    // the inline form proves semantic equality, not parser parity).
    "q126_namedwin" ->
      """select o_custkey,
        |  cast(round(o_totalprice * 100) as bigint) cents,
        |  row_number() over (partition by o_custkey
        |    order by o_orderdate, o_orderkey) rn,
        |  rank() over (partition by o_custkey
        |    order by o_orderdate, o_orderkey) rk,
        |  lag(o_orderkey) over (partition by o_custkey
        |    order by o_orderdate, o_orderkey) prev_key,
        |  cast(sum(cast(round(o_totalprice * 100) as bigint)) over (
        |    partition by o_custkey order by o_orderdate, o_orderkey
        |    rows unbounded preceding) as bigint) run_cents
        |from orders where o_custkey <= 20
        |order by o_custkey, rn""".stripMargin,

    // q127: identical VALUES lookup.
    "q127_values" ->
      """select v.sla_days, cast(count(*) as bigint) n_orders,
        |  cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint)
        |    cents
        |from orders
        |join (values ('1-URGENT', 1), ('2-HIGH', 2), ('3-MEDIUM', 5),
        |  ('4-NOT SPECIFIED', 7), ('5-LOW', 10)) v(prio, sla_days)
        |  on o_orderpriority = v.prio
        |group by v.sla_days
        |order by v.sla_days""".stripMargin,

    // q125: the lower() rewrite — same groups, same counts.
    "q125_collate" ->
      """with m as (select case when c_custkey % 2 = 0
        |    then lower(c_mktsegment) else c_mktsegment end seg2
        |  from customer)
        |select lower(seg2) seg, cast(count(*) as bigint) n,
        |  cast(count(distinct seg2) as bigint) n_variants
        |from m group by lower(seg2) order by seg""".stripMargin,

    // q124: identical (gap, date, key) rank per event.
    "q124_asof_nearest" ->
      """with j as (select event_id, user_id, o_orderkey, o_orderdate,
        |    abs(epoch_us(o_orderdate) - epoch_us(ts)) gap
        |  from events join orders on o_custkey = user_id),
        |r as (select event_id, user_id, o_orderkey, gap,
        |    row_number() over (partition by event_id
        |      order by gap, o_orderdate, o_orderkey) rn
        |  from j)
        |select event_id, user_id, o_orderkey, cast(gap as bigint) gap
        |from r where rn = 1 order by event_id limit 50""".stripMargin,

    // q120: the pipe chain re-nested as plain SQL.
    "q120_pipe" ->
      """with agg as (select l_returnflag, l_linestatus,
        |    cast(sum(cast(l_quantity as bigint)) as bigint) sum_qty,
        |    cast(count(*) as bigint) n,
        |    cast(sum(cast(round(l_extendedprice * 100) as bigint)) as bigint)
        |      cents
        |  from lineitem where l_shipdate <= date '1998-09-02'
        |  group by l_returnflag, l_linestatus)
        |select l_returnflag, l_linestatus, sum_qty, n, cents,
        |  round(cast(cents as double) / 100.0 / n, 2) avg_price
        |from agg order by l_returnflag, l_linestatus""".stripMargin,

    // q121: the alias chain expanded.
    "q121_lca" ->
      """select o_orderkey,
        |  cast(round(o_totalprice * 100) as bigint) cents,
        |  cast(round(o_totalprice * 100) as bigint) + 250 cents_fee,
        |  (cast(round(o_totalprice * 100) as bigint) + 250) * 2 cents_x2
        |from orders where o_orderkey <= 1000
        |order by o_orderkey""".stripMargin,

    // q122: the parameter inlined.
    "q122_execimm" ->
      """select c_nationkey, cast(count(*) as bigint) n,
        |  cast(sum(cast(round(c_acctbal * 100) as bigint)) as bigint) cents
        |from customer where c_custkey <= 500
        |group by c_nationkey order by c_nationkey""".stripMargin,

    // q123: the observed metrics recomputed as a plain aggregate.
    "q123_observe" ->
      """select cast(count(*) as bigint) n_rows,
        |  cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint)
        |    cents_total,
        |  cast(min(cast(round(o_totalprice * 100) as bigint)) as bigint)
        |    cents_min,
        |  cast(max(cast(round(o_totalprice * 100) as bigint)) as bigint)
        |    cents_max
        |from orders""".stripMargin)
}
