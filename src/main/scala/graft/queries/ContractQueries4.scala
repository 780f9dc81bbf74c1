package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-3 contract queries (batch 3): the ANSI linear-regression
  * aggregate family and higher-moment / bitwise aggregates.
  *
  * Same determinism discipline as the earlier files (SURVEY §5.2):
  * doubles rounded in-query, BIGINT-aligned ints, total ORDER BY.
  */
object ContractQueries4 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- Q85 linear-regression aggregates (A-19) ---------------------------
  // The full ANSI regr_* family over lineitem: price regressed on
  // quantity per return flag. Both engines implement the same textbook
  // covar_pop/var_pop forms; rounding absorbs last-ulp division noise.
  def q85Regr(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("regr_count(l_extendedprice, l_quantity)").cast("long").as("rc"),
        round(expr("regr_avgx(l_extendedprice, l_quantity)"), 4).as("ax"),
        round(expr("regr_avgy(l_extendedprice, l_quantity)"), 4).as("ay"),
        round(expr("regr_slope(l_extendedprice, l_quantity)"), 4).as("sl"),
        round(expr("regr_intercept(l_extendedprice, l_quantity)"), 4).as("ic"),
        round(expr("regr_r2(l_extendedprice, l_quantity)"), 6).as("r2"))
      .orderBy("l_returnflag")

  // ---- Q86 higher moments + bitwise aggregates (A-20, F-9b) --------------
  // Spark's skewness/kurtosis are the POPULATION forms ((Σd³/n)/(Σd²/n)^1.5
  // and (Σd⁴/n)/(Σd²/n)² − 3); DuckDB's built-ins are the sample-corrected
  // forms, so the oracle spells out the population moments explicitly —
  // an honest cross-engine pin of the definition, not just the name.
  def q86Moments(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        round(skewness(col("o_totalprice")), 6).as("sk"),
        round(kurtosis(col("o_totalprice")), 6).as("kt"),
        expr("bit_and(o_custkey)").cast("long").as("ba"),
        expr("bit_or(o_custkey)").cast("long").as("bo"),
        expr("bit_xor(o_custkey)").cast("long").as("bx"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  // ---- Q87 parquet schema evolution / mergeSchema (S-16) -----------------
  // The schema-drift reality of a 100 TB table: batch 1 lands without
  // c_acctbal, batch 2 appends WITH it; a mergeSchema read must surface
  // the union schema with nulls for the early rows. The read-back
  // rollup (count vs count(acctbal) per segment) hash-matches an oracle
  // computing the expected post-merge state from the source table.
  def q87MergeSchema(s: SparkSession, dir: String): DataFrame = {
    val tmp = s"/tmp/graft_merge_${math.abs(dir.hashCode)}/customer"
    val c = t(s, dir, "customer")
    c.filter(col("c_custkey") % 2 === 0)
      .select("c_custkey", "c_mktsegment")
      .write.mode("overwrite").parquet(tmp)
    c.filter(col("c_custkey") % 2 === 1)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
      .write.mode("append").parquet(tmp)
    s.read.option("mergeSchema", "true").parquet(tmp)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), count(col("c_acctbal")).as("n_bal"),
        round(sum("c_acctbal"), 2).as("bal"))
      .orderBy("c_mktsegment")
  }

  // ---- Q88 URL parsing (F-11) ---------------------------------------------
  // parse_url over URLs synthesized from table columns; the oracle
  // derives every part independently from the same columns, pinning
  // Spark's extraction semantics (HOST/PATH/QUERY + keyed QUERY) rather
  // than echoing them.
  def q88Url(s: SparkSession, dir: String): DataFrame = {
    val url = concat(lit("https://shop.example.com/seg/"),
      lower(col("c_mktsegment")), lit("/item?k="), col("c_custkey"),
      lit("&v=1"))
    t(s, dir, "customer")
      .select(col("c_custkey"), url.as("url"))
      .select(col("c_custkey"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY")).as("query"),
        parse_url(col("url"), lit("QUERY"), lit("k")).cast("long").as("k"))
      .orderBy("c_custkey")
      .limit(100)
  }

  // ---- Q89 inline generator over array-of-struct (X-4c) ------------------
  // arrays_zip builds the struct array (token, position) with zero
  // shuffle; inline_outer flattens it and must KEEP parents of empty
  // arrays as a null row (every 7th doc's array is emptied to force the
  // case). The oracle reproduces outer-unnest with a union.
  def q89Inline(s: SparkSession, dir: String): DataFrame = {
    val toks = slice(filter(split(col("text"), " "), t => t =!= ""), 1, 3)
    val emptied = when(col("doc_id") % 7 === 0, array().cast("array<string>"))
      .otherwise(toks)
    t(s, dir, "documents")
      .select(col("doc_id"),
        arrays_zip(emptied,
          when(col("doc_id") % 7 === 0, array().cast("array<int>"))
            .otherwise(sequence(lit(1), size(emptied)))).as("zipped"))
      .select(col("doc_id"), inline_outer(col("zipped")))
      .toDF("doc_id", "tok", "pos")
      .select(col("doc_id"), col("tok"), col("pos").cast("long").as("pos"))
      .orderBy("doc_id", "pos")
      .limit(200)
  }

  // ---- Q90 running distinct count over a window (W-10) -------------------
  // Spark has no DISTINCT in window functions; the engine's rewrite is
  // the first-occurrence-flag identity: mark the first (date, key) row
  // of each (customer, priority), then a running sum of flags equals
  // the running distinct-priority count. The oracle runs DuckDB's
  // native count(distinct) over the identical total order, pinning the
  // rewrite, not just the numbers.
  def q90RunDistinct(s: SparkSession, dir: String): DataFrame = {
    val wFirst = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey", "o_orderpriority")
      .orderBy("o_orderdate", "o_orderkey")
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    t(s, dir, "orders")
      .filter(col("o_custkey") <= 200)
      .withColumn("first_seen",
        when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
      .select(col("o_custkey"), col("o_orderkey"),
        sum("first_seen").over(wRun).as("rd"))
      .orderBy("o_custkey", "o_orderkey")
      .limit(300)
  }

  // ---- Q91 as-of join with tolerance (J-7b) --------------------------------
  // Backward as-of (nearest earlier order per event) that only matches
  // within an 8300-day window (the fixture's events run decades after
  // its orders; 8300 days splits the matched-gap distribution near its
  // median): the nearest match is the unique candidate,
  // so tolerance is a post-filter on its gap — same linear merge as
  // q20_merge, no re-ranking.
  def q91AsofTol(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select("event_id", "user_id", "ts")
    val o = t(s, dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    graft.ops.AsOf.backward(e, "user_id", "ts", o, "o_custkey",
        "o_orderdate", "o_orderkey", Seq("o_orderkey", "o_orderdate"))
      .withColumn("gap",
        datediff(col("ts").cast("date"), col("o_orderdate").cast("date"))
          .cast("long"))
      .filter(col("gap") <= 8300)
      .select("event_id", "user_id", "o_orderkey", "gap")
      .orderBy("event_id")
      .limit(50)
  }

  // ---- Q92 ordered-set aggregates: percentile_disc/cont (A-8c) -----------
  // WITHIN GROUP syntax; percentile_disc picks an actual data element
  // (lowest value with cume_dist >= p — bit-identical across engines,
  // no rounding needed), percentile_cont interpolates.
  def q92Pdisc(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        expr("percentile_disc(0.5) within group (order by o_totalprice)")
          .as("pd"),
        round(expr("percentile_cont(0.25) within group (order by o_totalprice)"),
          4).as("pc"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  // ---- Q93 date formatting + epoch seconds (F-2c) --------------------------
  // The portable pattern subset (zero-padded numeric fields only — no
  // locale-dependent names): Spark's SimpleDateFormat-style patterns vs
  // DuckDB strftime, plus unix_timestamp under the UTC session.
  def q93DateFmt(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"),
        date_format(col("ts"), "yyyy-MM").as("ym"),
        date_format(col("ts"), "HH").as("hh"),
        date_format(col("ts"), "DDD").as("doy"),
        unix_timestamp(col("ts")).as("es"))
      .orderBy("event_id")
      .limit(100)

  // ---- Q94 map construction + map_zip_with (F-7c) --------------------------
  // map_from_arrays / map_zip_with / map_entries / map_contains_key over
  // maps constructed from the JSON props value; the oracle derives every
  // output from the raw value arithmetically (q76 pattern).
  def q94Maps2(s: SparkSession, dir: String): DataFrame = {
    val m = from_json(col("props"), org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.IntegerType))
    t(s, dir, "events")
      .select(col("event_id"), element_at(m, "k").as("kv"))
      .select(col("event_id"),
        map_from_arrays(array(lit("a"), lit("b")),
          array(col("kv"), col("kv") * 2)).as("m1"),
        map_from_arrays(array(lit("a"), lit("b")),
          array(lit(10), lit(20))).as("m2"))
      .select(col("event_id"),
        element_at(map_zip_with(col("m1"), col("m2"),
          (_, v1, v2) => v1 + v2), "a").cast("long").as("za"),
        element_at(map_zip_with(col("m1"), col("m2"),
          (_, v1, v2) => v1 + v2), "b").cast("long").as("zb"),
        array_join(transform(map_entries(col("m1")),
          e => concat(e.getField("key"), lit(":"), e.getField("value"))),
          ",").as("ents"),
        map_contains_key(col("m1"), "a").as("has_a"))
      .orderBy("event_id")
      .limit(100)
  }

  // ---- Q95 GROUP BY ALL / ORDER BY ALL (Q-ALL) ------------------------------
  // The SQL-surface sugar both engines ship: grouping keys inferred
  // from the non-aggregate select items, ordering over all output
  // columns left to right.
  def q95GroupByAll(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("graft_orders_v")
    s.sql("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                    round(sum(o_totalprice), 2) AS total
             FROM graft_orders_v GROUP BY ALL ORDER BY ALL""")
  }

  // ---- Q96 IGNORE NULLS window navigation (W-11) ----------------------------
  // Carry-forward (last_value IGNORE NULLS) and previous-non-null (lag
  // IGNORE NULLS) over a sparsified measure — only 'click' events carry
  // a value, other rows must see through the gaps.
  def q96IgnoreNulls(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val wRows = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    t(s, dir, "events")
      .withColumn("v",
        when(col("event_type") === "click", round(col("value"), 2)))
      .select(col("event_id"), col("user_id"),
        last(col("v"), ignoreNulls = true).over(wRows).as("carried"),
        lag(col("v"), 1, null, ignoreNulls = true).over(w).as("prev_v"))
      .orderBy("event_id")
      .limit(200)
  }

  // ---- Q97 error-safe arithmetic: try_add / try_multiply (P-6b) -------------
  // Overflow → NULL instead of error (q69's try_divide/try_cast
  // completed with the arithmetic family). Near-Long.MaxValue anchors
  // make overflow depend on the data: ta overflows iff o_custkey > 100,
  // tm for any o_custkey >= 2 — the oracle derives both cases lazily
  // (SQL CASE) so DuckDB never evaluates the overflowing branch.
  def q97Try2(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        expr("try_add(cast('9223372036854775707' as bigint), o_custkey)")
          .as("ta"),
        expr("try_multiply(o_custkey, cast('9223372036854775707' as bigint))")
          .as("tm"))
      .orderBy("o_orderkey")
      .limit(100)

  // ---- Q98 array set operations (F-4d) --------------------------------------
  // array_intersect / array_union / array_except (all set-semantics:
  // results deduplicate). Engines order set results differently —
  // array_sort before joining pins element order.
  def q98ArrSet(s: SparkSession, dir: String): DataFrame = {
    val toks = filter(split(col("text"), " "), t => t =!= "")
    val a = array_distinct(slice(toks, 1, 10))
    val b = array(lit("the"), lit("a"), lit("spark"), lit("data"))
    t(s, dir, "documents")
      .select(col("doc_id"),
        array_join(array_sort(array_intersect(a, b)), ",").as("ai"),
        array_join(array_sort(array_union(a, b)), ",").as("au"),
        array_join(array_sort(array_except(a, b)), ",").as("ae"))
      .orderBy("doc_id")
      .limit(100)
  }

  // ---- Q99 calendar spine / gap-filled monthly rollup (F-2d) ---------------
  // Reporting-grade time series: a month spine generated from the
  // data's own bounds (1-row aggregate → sequence explode — never the
  // driver), left-joined to the monthly rollup so empty months surface
  // as zeros. Pins sequence(timestamp, timestamp, interval) semantics
  // against generate_series.
  def q99DateGrid(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val spine = o
      .agg(date_trunc("month", min(col("o_orderdate"))).as("lo"),
        date_trunc("month", max(col("o_orderdate"))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 month"))).as("m"))
    val counts = o
      .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
    spine.join(counts, Seq("m"), "left")
      .select(col("m"), coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("total"), lit(0.0)).as("total"))
      .orderBy("m")
  }

  // ---- Q100 SCD Type-2 dimension build (OP-SCD2) ----------------------------
  // The warehouse-classic temporal dimension: a change log (events as
  // per-user attribute updates) becomes validity intervals —
  // valid_from = change time, valid_to = next change (NULL while
  // current). One window per key; at scale this is a single shuffle on
  // the dimension key, the same shape as CDC upsert (E-15) but keeping
  // full history instead of folding to latest.
  def q100Scd2(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("valid_from", "event_id")
    t(s, dir, "events")
      .filter(col("user_id") <= 100)
      .select(col("user_id"), col("ts").as("valid_from"),
        round(col("value"), 2).as("v"), col("event_id"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("event_id")
      .orderBy("user_id", "valid_from")
      .limit(300)
  }

  // ---- Q101 SQL views (S-17) -------------------------------------------------
  // CREATE OR REPLACE TEMPORARY VIEW + querying through it — the DDL
  // abstraction layer every SQL consumer expects beside q83's CTAS.
  def q101View(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "nation").createOrReplaceTempView("graft_nation_src")
    s.sql("""CREATE OR REPLACE TEMPORARY VIEW graft_high_nations AS
             SELECT n_nationkey, n_regionkey, n_name
             FROM graft_nation_src WHERE n_nationkey >= 10""")
    s.sql("""SELECT n_regionkey, count(*) AS n, min(n_name) AS mn
             FROM graft_high_nations GROUP BY 1 ORDER BY 1""")
  }

  // ---- Q102 parameterized SQL (Q-PARAM) ---------------------------------------
  // Named-parameter binding (spark.sql(text, args)) — the injection-safe
  // programmatic entry point; the oracle inlines the same literals.
  def q102Params(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("graft_customer_src")
    s.sql(
      """SELECT c_nationkey, count(*) AS n, round(sum(c_acctbal), 2) AS bal
        |FROM graft_customer_src
        |WHERE c_mktsegment = :seg AND c_acctbal > :minbal
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
      Map("seg" -> "BUILDING", "minbal" -> 0))
  }

  // ---- Q103 unionByName with missing columns (U-7) ---------------------------
  // Schema-evolution union: two frames with different column sets merge
  // by NAME (not position), absent columns null-filled — the in-memory
  // counterpart of q87's mergeSchema read.
  def q103UnionByName(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val a = c.select(col("c_custkey"), col("c_mktsegment"))
    val b = c.select(col("c_acctbal"), col("c_custkey")) // reordered + drifted
    a.unionByName(b, allowMissingColumns = true)
      .groupBy((col("c_custkey") % 10).as("bucket"))
      .agg(count(lit(1)).as("n"), count(col("c_mktsegment")).as("n_seg"),
        count(col("c_acctbal")).as("n_bal"),
        round(sum("c_acctbal"), 2).as("bal"))
      .orderBy("bucket")
  }

  // ---- Q104 multiple COUNT(DISTINCT) in one aggregate (A-2b) ----------------
  // The profiling shape: several distinct counts over different columns
  // in a single GROUP BY. Catalyst plans this through an Expand
  // (one replicated stream per distinct set) — a shape nothing else in
  // the suite exercises.
  def q104MultiDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        countDistinct(col("o_custkey")).as("nd_cust"),
        countDistinct(col("o_orderpriority")).as("nd_prio"),
        countDistinct(year(col("o_orderdate"))).as("nd_year"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  // ---- Q105 NOT IN vs NOT EXISTS under NULLs (Q-NULL3VL) ---------------------
  // The classic three-valued-logic trap, pinned cross-engine: when the
  // NOT IN subquery produces even one NULL, the predicate is never TRUE
  // and the result is EMPTY; NOT EXISTS (null-safe) keeps rows. Both
  // engines must agree on both counts.
  def q105NotIn(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("graft_c105")
    t(s, dir, "orders").createOrReplaceTempView("graft_o105")
    s.sql("""
      SELECT
        (SELECT count(*) FROM graft_c105 WHERE c_custkey NOT IN
          (SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL
                       ELSE o_custkey END FROM graft_o105)) AS n_notin,
        (SELECT count(*) FROM graft_c105 c WHERE NOT EXISTS
          (SELECT 1 FROM graft_o105 o
           WHERE CASE WHEN o.o_orderkey % 100 = 0 THEN NULL
                      ELSE o.o_custkey END = c.c_custkey)) AS n_notexists
    """)
  }

  // ---- Q106 correlated scalar subquery in SELECT (Q-CSQ) ---------------------
  // Per-row correlated aggregate — Catalyst decorrelates to an outer
  // join + aggregate (never a per-row loop); count over no rows is 0,
  // also pinned (customers without orders appear).
  def q106CorrScalar(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("graft_c106")
    t(s, dir, "orders").createOrReplaceTempView("graft_o106")
    s.sql("""SELECT c_custkey,
               (SELECT count(*) FROM graft_o106 o
                WHERE o.o_custkey = c.c_custkey) AS n_orders,
               (SELECT round(max(o_totalprice), 2) FROM graft_o106 o
                WHERE o.o_custkey = c.c_custkey) AS max_price
             FROM graft_c106 c
             WHERE c_custkey <= 100 ORDER BY c_custkey""")
  }

  // ---- Q107 FILTER clause aggregates (A-21) -----------------------------------
  // SQL-standard selective aggregation — one scan, per-aggregate
  // predicates (the idiom pivot generalizes).
  def q107Filter(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("graft_o107")
    s.sql("""SELECT o_orderstatus,
               count(*) AS n,
               count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
               round(sum(o_totalprice) FILTER (WHERE year(o_orderdate) = 1995), 2)
                 AS total_1995,
               round(avg(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 2)
                 AS avg_urgent
             FROM graft_o107 GROUP BY o_orderstatus ORDER BY o_orderstatus""")
  }

  // ---- Q108 encoding/hash scalars (F-8b) ------------------------------------
  // md5 / hex / base64 / ascii / chr — the encoding surface beside q32's
  // sha2. Spark hex(number) and DuckDB hex(bigint) both emit uppercase
  // without leading zeros.
  def q108Encoding(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(col("c_custkey"),
        md5(col("c_mktsegment").cast("binary")).as("m5"),
        hex(col("c_custkey")).as("hx"),
        base64(col("c_mktsegment").cast("binary")).as("b64"),
        ascii(col("c_mktsegment")).cast("long").as("a_code"),
        chr(lit(65) + col("c_custkey") % 26).as("ch"))
      .orderBy("c_custkey")
      .limit(100)

  // ---- Q109 product + DISTINCT aggregates (A-22) ------------------------------
  // Spark has no product() aggregate — the engine's rewrite is the
  // exp∘sum∘ln identity (valid here: 1 + tax > 0); the oracle runs
  // DuckDB's NATIVE product over the same rows, pinning the rewrite.
  // Plus sum over DISTINCT values.
  def q109AggMisc(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") <= 200)
      .groupBy("l_returnflag")
      .agg(
        round(exp(sum(log(lit(1.0) + col("l_tax")))), 6).as("prod_tax"),
        round(sum_distinct(col("l_quantity")), 2).as("sd_qty"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  // ---- Q110 SQL MERGE INTO a managed table (OP-MERGE) ------------------------
  // Lakehouse-SQL's front door, next to q83's CTAS/INSERT: a customer
  // snapshot becomes a managed catalog table, a MERGE applies the
  // latest order total per customer (update), synthetic keys above the
  // customer key space (insert), and untouched customers pass through
  // (keep) — sources.SqlMerge is the copy-on-write rewrite of MERGE
  // INTO for plain-parquet tables. The oracle replays the identical
  // merge relationally in DuckDB; the read-back goes through the
  // catalog, so the gate covers the overwrite commit too. Output
  // orders inserts first so all three dispositions are visible in the
  // 100-row sample.
  def q110Merge(s: SparkSession, dir: String): DataFrame = {
    graft.sources.SqlMerge.dropManaged(s, "graft_merge_tgt")
    t(s, dir, "customer")
      .select(col("c_custkey").as("k"), round(col("c_acctbal"), 2).as("bal"),
        lit("K").as("op"))
      .createOrReplaceTempView("graft_merge_snap")
    s.sql("""CREATE TABLE graft_merge_tgt USING parquet AS
             SELECT * FROM graft_merge_snap""")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val upd = t(s, dir, "orders")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("o_custkey").as("k"), round(col("o_totalprice"), 2).as("bal"))
    val ins = t(s, dir, "nation")
      .select((col("n_nationkey") + lit(10000000L)).as("k"),
        round(col("n_nationkey") + lit(100.0), 2).as("bal"))
    upd.unionByName(ins).createOrReplaceTempView("graft_merge_upd")
    graft.sources.SqlMerge.mergeInto(s, "graft_merge_tgt", "graft_merge_upd",
      "k", Seq("bal"), opColumn = Some("op"))
    s.sql("""SELECT k, bal, op FROM graft_merge_tgt
             ORDER BY CASE op WHEN 'I' THEN 0 ELSE 1 END, k LIMIT 100""")
  }

  /** Round-3 batch-3 contract queries keyed by id. */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q85_regr" -> (q85Regr _),
    "q86_moments" -> (q86Moments _),
    "q87_mergeschema" -> (q87MergeSchema _),
    "q88_url" -> (q88Url _),
    "q89_inline" -> (q89Inline _),
    "q90_rundistinct" -> (q90RunDistinct _),
    "q91_asof_tol" -> (q91AsofTol _),
    "q92_pdisc" -> (q92Pdisc _),
    "q93_datefmt" -> (q93DateFmt _),
    "q94_maps2" -> (q94Maps2 _),
    "q95_groupby_all" -> (q95GroupByAll _),
    "q96_ignorenulls" -> (q96IgnoreNulls _),
    "q97_try2" -> (q97Try2 _),
    "q98_arrset" -> (q98ArrSet _),
    "q99_dategrid" -> (q99DateGrid _),
    "q100_scd2" -> (q100Scd2 _),
    "q101_view" -> (q101View _),
    "q102_params" -> (q102Params _),
    "q103_unionbyname" -> (q103UnionByName _),
    "q104_multidistinct" -> (q104MultiDistinct _),
    "q105_notin" -> (q105NotIn _),
    "q106_corrscalar" -> (q106CorrScalar _),
    "q107_filter" -> (q107Filter _),
    "q108_encoding" -> (q108Encoding _),
    "q109_aggmisc" -> (q109AggMisc _),
    "q110_merge" -> (q110Merge _))
}
