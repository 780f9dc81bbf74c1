package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-2 contract queries: operator families present in Spark (and in
  * scope for SURVEY §2) that round 1 left without a DuckDB oracle —
  * pivot/unpivot, lateral joins, the remaining window functions,
  * ordered-arg / filtered aggregates, conditional & bitwise scalar
  * functions, regexp extraction, array/higher-order-lambda extras,
  * SQL-JSON keys, deterministic hash sampling, null-preserving
  * generators, and calendar arithmetic.
  *
  * Same determinism discipline as ContractQueries (SURVEY §5.2): doubles
  * rounded in-query, int outputs aligned to BIGINT where DuckDB widens,
  * total ORDER BY on every row-level result, NULLS FIRST pinned
  * explicitly on the oracle side (DuckDB defaults to NULLS LAST).
  */
object ContractQueries2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- Q40 pivot (A-12): wide conditional aggregation --------------------
  // groupBy().pivot() with an explicit value list — no extra pass to
  // discover pivot values, and the plan is a single hash aggregate.
  def q40Pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round(sum("o_totalprice"), 2))
      .orderBy("o_orderpriority")

  // ---- Q41 unpivot / melt (A-13): wide → long ----------------------------
  def q41Unpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") < 200)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "m", "v")
      .select(col("l_orderkey"), col("l_linenumber"), col("m"),
        round(col("v"), 2).as("v"))
      .orderBy("l_orderkey", "l_linenumber", "m", "v")
      .limit(60)

  // ---- Q42 window function completion (W-8): first/last/nth value,
  // percent_rank, cume_dist — default frame (range unbounded..current),
  // which DuckDB shares, so no explicit frame needed on either side.
  def q42WinExtra(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        first("o_orderkey").over(w).as("fv"),
        last("o_orderkey").over(w).as("lv"),
        nth_value(col("o_orderkey"), 2).over(w).as("nv"),
        round(percent_rank().over(w), 4).as("pr"),
        round(cume_dist().over(w), 4).as("cd"))
      .orderBy("o_custkey", "o_orderkey")
      .limit(100)
  }

  // ---- Q43 conditional / null-handling scalars (P-4) ---------------------
  def q43Cond(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
        col("o_orderkey"),
        coalesce(expr("nullif(o_orderstatus,'O')"), lit("X")).as("st"),
        greatest(col("o_totalprice"), lit(100000.0)).as("g"),
        least(col("o_totalprice"), lit(100000.0)).as("l"),
        when(col("o_totalprice") > 200000, "big")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("small").as("bucket"))
      .orderBy("o_orderkey")
      .limit(50)

  // ---- Q44 bitwise ops (F-9) ---------------------------------------------
  def q44Bits(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
        col("o_orderkey"),
        col("o_orderkey").bitwiseAND(lit(255L)).as("ba"),
        col("o_orderkey").bitwiseOR(lit(7L)).as("bo"),
        col("o_orderkey").bitwiseXOR(lit(15L)).as("bx"),
        shiftleft(col("o_orderkey"), 2).as("sl"),
        shiftright(col("o_orderkey"), 1).as("sr"))
      .orderBy("o_orderkey")
      .limit(50)

  // ---- Q45 string function completion (F-1b) -----------------------------
  def q45Str2(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
        col("p_partkey"),
        lpad(col("p_brand"), 12, "_").as("lp"),
        rpad(col("p_brand"), 12, "_").as("rp"),
        expr("split_part(p_type, ' ', 1)").as("sp"),
        levenshtein(col("p_brand"), lit("Brand#11")).as("lev"),
        reverse(col("p_brand")).as("rv"),
        expr("repeat(p_brand, 2)").as("rpt"),
        instr(col("p_name"), "a").as("ps"),
        expr("left(p_name, 4)").as("lf"),
        expr("right(p_name, 4)").as("rt"))
      .orderBy("p_partkey")
      .limit(30)

  // ---- Q46 uncorrelated scalar + IN subqueries (§4.1 rewrites) -----------
  // Deliberately via the SQL entry point so Catalyst's subquery planning
  // (scalar-subquery broadcast + IN → left-semi) is what runs.
  def q46Subq(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("graft_q46_orders")
    t(s, dir, "customer").createOrReplaceTempView("graft_q46_cust")
    s.sql(
      """select o_orderkey, round(o_totalprice,2) tp from graft_q46_orders
        |where o_totalprice > (select avg(o_totalprice) from graft_q46_orders)
        |  and o_custkey in (select c_custkey from graft_q46_cust where c_mktsegment='BUILDING')
        |order by o_orderkey limit 50""".stripMargin)
  }

  // ---- Q47 aggregate completion (A-14): filtered / boolean /
  // ordered-argument aggregates. max_by/min_by tie-break on the unique
  // o_orderkey ordering argument, so results are deterministic.
  def q47AggExt(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        expr("count_if(o_totalprice > 100000)").as("ci"),
        expr("bool_and(o_totalprice > 0)").as("ba"),
        expr("bool_or(o_orderpriority = '1-URGENT')").as("bo"),
        max_by(col("o_custkey"), col("o_orderkey")).as("mb"),
        min_by(col("o_custkey"), col("o_orderkey")).as("nb"),
        expr("any_value(o_orderstatus)").as("av"))
      .orderBy("o_orderstatus")

  // ---- Q48 regexp extraction + match predicate (F-1c) --------------------
  def q48Regexp(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "([a-z]+) ([a-z]+)", 2).as("r2"),
        col("p_name").rlike("^a").as("m"))
      .orderBy("p_partkey")
      .limit(30)

  // ---- Q49 array function completion (F-4b) ------------------------------
  def q49Arr2(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    t(s, dir, "documents").select(
        col("doc_id"),
        array_join(slice(toks, 1, 3), ",").as("sl"),
        array_position(toks, "dup").cast("long").as("ap"),
        size(flatten(array(toks, array(lit("z"))))).cast("long").as("fl"),
        array_join(array_sort(array_distinct(slice(toks, 1, 5))), ",").as("sd"))
      .orderBy("doc_id")
      .limit(30)
  }

  // ---- Q50 higher-order lambdas (F-5b): transform/filter/exists/fold -----
  def q50Hof(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    t(s, dir, "documents").select(
        col("doc_id"),
        array_join(transform(toks, x => upper(x)), ",").as("tr"),
        array_join(filter(toks, x => length(x) > 3), ",").as("fi"),
        exists(toks, x => x === "dup").as("ex"),
        aggregate(toks, lit(0L), (acc, x) => acc + length(x)).as("tot"))
      .orderBy("doc_id")
      .limit(30)
  }

  // ---- Q51 SQL-JSON keys (F-6b / F-7 surface) ----------------------------
  def q51Json(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
        col("event_id"),
        array_join(sort_array(json_object_keys(col("props"))), ",").as("ks"),
        get_json_object(col("props"), "$.k").as("v"))
      .orderBy("event_id")
      .limit(30)

  // ---- Q52 deterministic hash sampling (P-5): engine-portable Bernoulli
  // sample via a sha256 prefix on the key — identical row selection on any
  // engine, no RNG, fully pushdown-friendly (scan + filter, no shuffle).
  def q52Sample(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .filter(substring(sha2(col("c_custkey").cast("string"), 256), 1, 1) === "0")
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")

  // ---- Q53 lateral correlated subquery (J-12): top-1-per-key as the
  // SQL-standard LATERAL form (Catalyst decorrelates to a join) ----------
  def q53Lateral(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("graft_q53_orders")
    t(s, dir, "customer").createOrReplaceTempView("graft_q53_cust")
    s.sql(
      """select c.c_custkey, o.o_orderkey, round(o.o_totalprice,2) tp
        |from graft_q53_cust c,
        |lateral (select o_orderkey, o_totalprice from graft_q53_orders o
        |         where o.o_custkey = c.c_custkey
        |         order by o_totalprice desc, o_orderkey limit 1) o
        |order by c_custkey limit 50""".stripMargin)
  }

  // ---- Q54 null-preserving generator (X-4b): explode_outer keeps the
  // parent row when the array is empty ------------------------------------
  def q54GenOuter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") < 100)
      .select(col("o_orderkey"),
        when(col("o_orderstatus") === "F", array(lit("a"), lit("b")))
          .otherwise(typedLit(Seq.empty[String])).as("l"))
      .select(col("o_orderkey"), explode_outer(col("l")).as("x"))
      .orderBy("o_orderkey", "x")

  // ---- Q55 calendar arithmetic (F-2b): month truncation, month add with
  // end-of-month clamping, last_day, day-of-week, quarter ------------------
  def q55Dates2(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).as("m"),
        add_months(col("o_orderdate").cast("date"), 1).as("am"),
        last_day(col("o_orderdate").cast("date")).as("ld"),
        dayofweek(col("o_orderdate")).cast("long").as("dw"),
        quarter(col("o_orderdate")).cast("long").as("qt"))
      .orderBy("o_orderkey")
      .limit(30)

  // ---- Q56 EXCEPT ALL (U-5): multiset difference, multiplicities kept ----
  def q56ExceptAll(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("k"))
      .exceptAll(t(s, dir, "nation").select(col("n_nationkey").as("k")))
      .groupBy("k")
      .agg(count(lit(1)).as("c"))
      .orderBy("k")

  // ---- Q57 INTERSECT ALL (U-6): multiset intersection (min multiplicity) -
  def q57IntersectAll(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("k"))
      .intersectAll(t(s, dir, "customer").filter(col("c_custkey") < 500)
        .select(col("c_nationkey").as("k")))
      .groupBy("k")
      .agg(count(lit(1)).as("c"))
      .orderBy("k")

  // ---- Q58 OFFSET pagination (O-4) ---------------------------------------
  def q58Offset(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("tp"))
      .orderBy("o_orderkey")
      .offset(40)
      .limit(20)

  // ---- Q59 grouping() markers over grouping sets (A-6b) ------------------
  def q59Grouping(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("graft_q59_orders")
    s.sql(
      """select o_orderstatus, o_orderpriority,
        |  cast(grouping(o_orderstatus) as bigint) g1,
        |  cast(grouping(o_orderpriority) as bigint) g2, count(*) c
        |from graft_q59_orders
        |group by grouping sets ((o_orderstatus), (o_orderpriority))
        |order by o_orderstatus nulls first, o_orderpriority nulls first""".stripMargin)
  }

  // ---- Q60 median (A-8b: interpolated, ≡ percentile 0.5) -----------------
  def q60Median(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(round(median(col("o_totalprice")), 4).as("med"),
        count(lit(1)).as("c"))
      .orderBy("o_orderstatus")

  // ---- Q61 supplier-side join (J-2b): revenue by supplier nation ---------
  // Covers the one fixture table no other query touches. lineitem joins
  // supplier on l_suppkey (supplier is dim-sized -> broadcast), then the
  // nation name arrives over a second broadcast.
  def q61Supplier(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("rev"),
        countDistinct(col("s_suppkey")).as("n_supp"))
      .orderBy("n_name")

  // ---- Q62/Q63 source round-trips (S-4/S-8): customer → CSV/ORC → read
  // back → aggregate. Hash-matching the direct-parquet oracle proves the
  // writer/reader pair preserves values exactly (CSV relies on Java's
  // round-trip-exact double formatting; ORC is binary). ----------------
  private def roundTrip(s: SparkSession, dir: String, format: String): DataFrame = {
    val tmp = s"/tmp/graft_rt_${math.abs(dir.hashCode)}/$format/customer"
    val c = t(s, dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    val w = c.write.mode("overwrite")
    (if (format == "csv") w.option("header", "true") else w).format(format).save(tmp)
    val r = s.read.format(format)
    val back = (if (format == "csv")
      r.option("header", "true")
        .schema("c_custkey long, c_mktsegment string, c_acctbal double")
    else r).load(tmp)
    back.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("bal"))
      .orderBy("c_mktsegment")
  }

  def q62CsvRoundtrip(s: SparkSession, dir: String): DataFrame = roundTrip(s, dir, "csv")
  def q63OrcRoundtrip(s: SparkSession, dir: String): DataFrame = roundTrip(s, dir, "orc")

  // ---- Q64 right outer join (J-10 completion: L was q37, F was q38) ------
  // Customers with no events surface with zero counts from the
  // null-extended side.
  def q64RightOuter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(col("user_id"), col("event_id"))
      .join(t(s, dir, "customer").select("c_custkey"),
        col("user_id") === col("c_custkey"), "right")
      .groupBy("c_custkey")
      .agg(count(col("event_id")).as("n_events"))
      .orderBy("c_custkey")
      .limit(50)

  // ---- Q65 sliding-window expansion (W-family / ST-2 anchor) -------------
  // Batch formulation of the 1h/15min sliding-window count as pure epoch
  // arithmetic: every event belongs to exactly ceil(3600/900)=4 windows,
  // whose starts are floor(epoch/900)*900 - {0,1,2,3}*900. This is the
  // engine-independent form DuckDB runs as the oracle, and StreamingSpec
  // ST-2 replay-compares Streams.slidingCounts against THIS query — so
  // the streaming path is anchored to the cross-engine oracle, not to
  // Spark's own window() implementation.
  def q65Sliding(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"),
        (floor(unix_timestamp(col("ts")) / 900) * 900).cast("long").as("top"))
      .select(col("event_type"), col("top"),
        explode(sequence(lit(0), lit(3))).as("i"))
      .select(timestamp_seconds(col("top") - col("i") * 900).as("ws"),
        col("event_type"))
      .groupBy("ws", "event_type")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("ws", "event_type")

  // ---- Q66 recursive CTE (iterative query evaluation) --------------------
  // Per-customer order chains: the non-recursive prep links each order
  // to the customer's next order (window lead), then the recursive
  // member walks every chain from its head, counting hops. chain_len
  // must equal the customer's order count — a structural cross-check —
  // and DuckDB evaluates the identical ANSI text as the oracle. The
  // recursion is data-driven (depth = max orders per customer), not a
  // generator loop.
  def q66Recursive(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("graft_orders_v")
    // the non-recursive prep (orders scan + the two windows) is
    // loop-invariant, but the recursive member's join re-embeds — and
    // at execution re-RUNS — it once per recursion step (depth = max
    // orders per customer). Pin it once and recurse over the pinned
    // view; the data-driven recursion itself is unchanged and stays
    // the declared surface.
    s.sql(
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) rn,
        |  lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) nx
        |FROM graft_orders_v""".stripMargin)
      .localCheckpoint()
      .createOrReplaceTempView("graft_q66_ranked_v")
    s.sql(
      """WITH RECURSIVE walk(custkey, okey, depth) AS (
        |  SELECT o_custkey, o_orderkey, 1 FROM graft_q66_ranked_v WHERE rn = 1
        |  UNION ALL
        |  SELECT w.custkey, r.nx, w.depth + 1
        |  FROM walk w JOIN graft_q66_ranked_v r ON w.okey = r.o_orderkey
        |  WHERE r.nx IS NOT NULL
        |)
        |SELECT custkey, cast(max(depth) as bigint) chain_len
        |FROM walk GROUP BY custkey ORDER BY custkey LIMIT 100""".stripMargin)
  }

  // ---- Q67 listagg / string aggregation (A-family, Spark 4 native) -------
  // SQL-standard LISTAGG ... WITHIN GROUP; DuckDB's ordered string_agg
  // is the oracle. Ordered concatenation makes the result deterministic.
  def q67Listagg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(expr("listagg(n_name, ',') within group (order by n_name)").as("nations"))
      .orderBy("r_name")

  // ---- Q68 approximate heavy hitters (A-family, Spark 4 native) ----------
  // approx_top_k with maxItemsTracked >= the distinct count is exact, so
  // the sketch path hash-matches the plain group-by-count oracle; k=3 of
  // 5 event types has a strict count gap at the boundary at every SF
  // (no tie ambiguity). The sketch output (array of structs) is exploded
  // back to rows.
  def q68ApproxTopK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .agg(expr("approx_top_k(event_type, 3, 100)").as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.item").as("event_type"), col("e.count").as("cnt"))
      .orderBy(desc("cnt"), asc("event_type"))

  // ---- Q69 error-safe scalar functions (P-family) ------------------------
  // try_divide / try_cast return null instead of failing under ANSI
  // semantics — the behavior pipelines need on dirty data. DuckDB:
  // nullif-guarded division and TRY_CAST.
  def q69Try(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        expr("try_divide(o_totalprice, o_custkey % 3)").as("td"),
        expr("try_cast(o_orderstatus as int)").as("tc"),
        expr("try_cast(substring(o_orderpriority, 1, 1) as int)").as("tp"))
      .orderBy("o_orderkey")
      .limit(50)

  // ---- Q70 forward as-of join (J-7 completion) ---------------------------
  // First event AT OR AFTER each order's date for the same customer, via
  // the linear sort-merge formulation (ops.AsOf.forward); the oracle
  // runs the quadratic inequality-join + rank spec, mirroring
  // q20/q20_merge's pairing. (Events postdate orders in the fixture, so
  // this orientation exercises the carry path with real matches.)
  def q70AsofFwd(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    val e = t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    graft.ops.AsOf.forward(o, "o_custkey", "o_orderdate",
        e, "user_id", "ts", "event_id", Seq("event_id"))
      .select("o_orderkey", "o_custkey", "event_id")
      .orderBy("o_orderkey")
      .limit(50)
  }

  /** Round-2 contract queries keyed by id. */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_pivot" -> (q40Pivot _), "q41_unpivot" -> (q41Unpivot _),
    "q42_winextra" -> (q42WinExtra _), "q43_cond" -> (q43Cond _),
    "q44_bits" -> (q44Bits _), "q45_str2" -> (q45Str2 _),
    "q46_subq" -> (q46Subq _), "q47_aggext" -> (q47AggExt _),
    "q48_regexp" -> (q48Regexp _), "q49_arr2" -> (q49Arr2 _),
    "q50_hof" -> (q50Hof _), "q51_json" -> (q51Json _),
    "q52_sample" -> (q52Sample _), "q53_lateral" -> (q53Lateral _),
    "q54_gen_outer" -> (q54GenOuter _), "q55_dates2" -> (q55Dates2 _),
    "q56_exceptall" -> (q56ExceptAll _), "q57_intersectall" -> (q57IntersectAll _),
    "q58_offset" -> (q58Offset _), "q59_grouping" -> (q59Grouping _),
    "q60_median" -> (q60Median _), "q61_supplier" -> (q61Supplier _),
    "q62_csv_roundtrip" -> (q62CsvRoundtrip _),
    "q63_orc_roundtrip" -> (q63OrcRoundtrip _),
    "q64_rightouter" -> (q64RightOuter _),
    "q65_sliding" -> (q65Sliding _),
    "q66_recursive" -> (q66Recursive _),
    "q67_listagg" -> (q67Listagg _),
    "q68_approx_topk" -> (q68ApproxTopK _),
    "q69_try" -> (q69Try _),
    "q70_asof_fwd" -> (q70AsofFwd _))
}
