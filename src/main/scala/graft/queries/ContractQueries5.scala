package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 contract queries: bounded RANGE window frames, boolean
  * aggregates, the third string-function batch, and calendar edge
  * semantics. Same determinism discipline as the earlier files
  * (SURVEY §5.2).
  */
object ContractQueries5 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- Q111 bounded RANGE window frame (W-12) --------------------------------
  // Rolling 7-day revenue per customer: a VALUE-bounded frame (range
  // between 6 preceding and current row over epoch-day), not a row
  // count — same-day orders enter each other's frames regardless of
  // row order, which is exactly what ROWS frames get wrong. The only
  // other range frame in the suite is the unbounded one (q35).
  def q111RollRange(s: SparkSession, dir: String): DataFrame = {
    val d = datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
    val w = Window.partitionBy("o_custkey").orderBy("d").rangeBetween(-6, 0)
    t(s, dir, "orders")
      .filter(col("o_custkey") <= 100)
      .select(col("o_custkey"), d.cast("long").as("d"),
        round(col("o_totalprice"), 2).as("price"))
      .withColumn("roll7", round(sum("price").over(w), 2))
      .withColumn("n7", count(lit(1)).over(w))
      .orderBy("o_custkey", "d", "price")
  }

  // ---- Q112 boolean aggregates (A-23) ----------------------------------------
  // bool_and / bool_or / count_if per order status — the predicate
  // profile shape (DuckDB spells count_if as a FILTER count).
  def q112BoolAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        expr("bool_and(o_totalprice > 1000)").as("all_over_1k"),
        expr("bool_or(o_orderpriority = '1-URGENT')").as("any_urgent"),
        expr("count_if(o_totalprice > 200000)").as("n_big"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  // ---- Q113 string functions, batch 3 (F-1e) ---------------------------------
  // translate / split_part / lpad / rpad / repeat / reverse /
  // left / right — the remaining portable string surface.
  def q113Str3(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(col("c_custkey"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("tr"),
        expr("split_part(c_mktsegment, 'I', 1)").as("sp"),
        lpad(col("c_mktsegment"), 12, ".").as("lp"),
        rpad(col("c_mktsegment"), 12, ".").as("rp"),
        repeat(expr("left(c_mktsegment, 2)"), 3).as("rep"),
        reverse(col("c_mktsegment")).as("rev"),
        expr("right(c_mktsegment, 3)").as("rgt"))
      .orderBy("c_custkey")
      .limit(100)

  // ---- Q114 calendar edge semantics (F-2e) -----------------------------------
  // add_months clamps to month end (Jan 31 + 1 → Feb 29 in a leap
  // year); last_day, quarter, and the dayofweek numbering pinned
  // cross-engine (Spark 1=Sunday vs DuckDB dow 0=Sunday).
  def q114Dates3(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_custkey") <= 50)
      .select(col("o_orderkey"),
        add_months(col("o_orderdate"), 1).cast("date").as("plus_m"),
        add_months(lit("2000-01-31").cast("date"), 1).as("leap_clamp"),
        last_day(col("o_orderdate")).as("eom"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        dayofweek(col("o_orderdate")).cast("long").as("dow1"))
      .orderBy("o_orderkey")
      .limit(100)

  // ---- Q115 malformed-CSV handling modes (S-18) -------------------------------
  // Real-world ingest robustness: nation serialized to CSV with three
  // crafted malformed lines appended (wrong arity, unparseable ints);
  // reading with an explicit schema in DROPMALFORMED mode must yield
  // exactly the clean rows — the oracle aggregates the original table.
  // (PERMISSIVE mode's corrupt-record accounting for the same file is
  // pinned in CsvModesSpec: exactly 3 quarantined lines.)
  def q115BadCsv(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = s"/tmp/graft_badcsv_${math.abs(dir.hashCode)}"
    val clean = t(s, dir, "nation")
      .select(concat_ws(",", col("n_nationkey"), col("n_name"),
        col("n_regionkey")))
      .as[String].collect() // 25 rows — bounded fixture write
    s.createDataset(
        clean.toSeq ++ Seq("not,a", "x,y,z", "99,BAD,notanint"))
      .coalesce(1).write.mode("overwrite").text(tmp)
    s.read
      .schema("n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT")
      .option("mode", "DROPMALFORMED")
      .csv(tmp)
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n"), min("n_name").as("mn"),
        sum("n_nationkey").as("sk"))
      .orderBy("n_regionkey")
  }

  // ---- Q116 catalog schema evolution (S-19) -----------------------------------
  // ALTER TABLE ADD COLUMNS on a managed parquet table + INSERT with an
  // explicit (reordered) column list: pre-evolution rows read back
  // null-filled in the new column, the column-list insert routes values
  // by NAME not position — the two catalog-DDL traps q83/q87 don't
  // cover.
  def q116Alter(s: SparkSession, dir: String): DataFrame = {
    graft.sources.SqlMerge.dropManaged(s, "graft_alter_t")
    t(s, dir, "nation").createOrReplaceTempView("graft_alter_src")
    s.sql("""CREATE TABLE graft_alter_t USING parquet AS
             SELECT n_nationkey, n_name FROM graft_alter_src""")
    s.sql("ALTER TABLE graft_alter_t ADD COLUMNS (pop BIGINT)")
    s.sql("""INSERT INTO graft_alter_t (pop, n_nationkey, n_name)
             VALUES (777, 99, 'NEWLAND')""")
    s.sql("""SELECT cast(n_nationkey AS bigint) n_nationkey, n_name,
             cast(pop AS bigint) pop FROM graft_alter_t
             ORDER BY n_nationkey""")
  }

  // ---- Q117 MERGE with delete condition (OP-MERGE-DEL) ------------------------
  // The delete arm of sources.SqlMerge through the driver gate (q110
  // covers update/insert/keep): updates with a negative balance DELETE
  // the matched row instead of updating it.
  def q117MergeDel(s: SparkSession, dir: String): DataFrame = {
    graft.sources.SqlMerge.dropManaged(s, "graft_mdel_t")
    t(s, dir, "customer")
      .select(col("c_custkey").as("k"), round(col("c_acctbal"), 2).as("bal"))
      .createOrReplaceTempView("graft_mdel_snap")
    s.sql("""CREATE TABLE graft_mdel_t USING parquet AS
             SELECT * FROM graft_mdel_snap""")
    // keys %3==0: marked for deletion (bal -1); keys %7==0 (not %3):
    // updated to 0.5
    t(s, dir, "customer")
      .select(col("c_custkey").as("k"),
        when(col("c_custkey") % 3 === 0, lit(-1.0))
          .otherwise(lit(0.5)).as("bal"))
      .filter(col("k") % 3 === 0 || col("k") % 7 === 0)
      .createOrReplaceTempView("graft_mdel_upd")
    graft.sources.SqlMerge.mergeInto(s, "graft_mdel_t", "graft_mdel_upd",
      "k", Seq("bal"), deleteCondition = Some("s.bal < 0"))
    s.sql("""SELECT k, bal FROM graft_mdel_t ORDER BY k LIMIT 200""")
  }

  /** Round-4 contract queries keyed by id. */
  // ---- Q118 versioned table time travel (S-20) -------------------------------
  // Snapshot-isolated versioned parquet (sources.VersionedTable):
  // v0 = customer balances, v1 = +100 credit for custkey <= 50 (built
  // by READING v0 back), v2 = every-7th customer deleted (built from
  // v1). The gate reads all three pinned versions after the fact —
  // deleted rows must still be visible at v0/v1 and gone at v2 — and
  // the oracle replays the version chain relationally.
  def q118TimeTravel(s: SparkSession, dir: String): DataFrame = {
    val path = s.conf.get("spark.sql.warehouse.dir") + "/graft_versioned_demo"
    graft.sources.VersionedTable.drop(s, path)
    val v0 = t(s, dir, "customer")
      .select(col("c_custkey").as("k"), round(col("c_acctbal"), 2).as("bal"))
    graft.sources.VersionedTable.commit(s, path, v0)
    val v1 = graft.sources.VersionedTable.read(s, path, 0)
      .select(col("k"),
        when(col("k") <= 50, round(col("bal") + 100.0, 2))
          .otherwise(col("bal")).as("bal"))
    graft.sources.VersionedTable.commit(s, path, v1)
    val v2 = graft.sources.VersionedTable.read(s, path, 1)
      .filter(col("k") % 7 =!= 0)
    graft.sources.VersionedTable.commit(s, path, v2)
    (0 to 2).map { v =>
      graft.sources.VersionedTable.read(s, path, v)
        .filter(col("k") <= 20)
        .select(lit(v.toLong).as("ver"), col("k"), col("bal"))
    }.reduce(_.unionAll(_)).orderBy("ver", "k")
  }

  // ---- Q119 bag set operations (U-5) ------------------------------------------
  // INTERSECT ALL / EXCEPT ALL — the multiset variants U-3/U-4's
  // distinct forms don't cover: multiplicities are min(m_a, m_b) and
  // max(0, m_a − m_b) respectively. Customer vs supplier nation keys
  // as the two bags; results re-aggregated so the multiplicity
  // arithmetic itself is what's hash-gated.
  def q119BagSetOps(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(col("c_nationkey").cast("long").as("nk"))
    val sup = t(s, dir, "supplier")
      .select(col("s_nationkey").cast("long").as("nk"))
    val inter = c.intersectAll(sup)
      .groupBy("nk").agg(count(lit(1)).as("m"))
      .select(lit("intersect_all").as("op"), col("nk"), col("m"))
    val exc = sup.exceptAll(c)
      .groupBy("nk").agg(count(lit(1)).as("m"))
      .select(lit("except_all").as("op"), col("nk"), col("m"))
    inter.unionAll(exc).orderBy("op", "nk")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q119_bagsetops" -> (q119BagSetOps _),
    "q118_timetravel" -> (q118TimeTravel _),
    "q116_alter" -> (q116Alter _),
    "q117_merge_del" -> (q117MergeDel _),
    "q115_badcsv" -> (q115BadCsv _),
    "q111_rollrange" -> (q111RollRange _),
    "q112_boolagg" -> (q112BoolAgg _),
    "q113_str3" -> (q113Str3 _),
    "q114_dates3" -> (q114Dates3 _))
}
