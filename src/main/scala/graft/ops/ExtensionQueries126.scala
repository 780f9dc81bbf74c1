package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 extension queries, batch 126: theta-sketch set algebra AS A
  * GROUPED COLUMN rolled up a hierarchy — the round-9 judge's directive
  * #7. E-469 proved ∩/∪/\ compose on two GLOBAL sketch blobs; the
  * 100 TB pattern stores a sketch PER GROUP (per nation, per day, per
  * shard) and re-aggregates the blobs along the rollup dimension
  * (nation → region here) with `theta_union_agg`, exactly like the
  * A-3c HLL re-aggregation — raw data is scanned once to build the
  * finest-grain sketches; every coarser audience overlap is answered
  * from sketch algebra alone.
  */
object ExtensionQueries126 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-473 per-group theta rollup (nation sketches → region overlap) -------------
  // Segments: URGENT-priority buyers (A) vs HIGH-priority buyers (B),
  // sketched per NATION (the stored finest grain), then each region's
  // A/B sketches are theta_union_agg folds of its nations' blobs and
  // the region-level |A|, |B|, |A∩B|, |A∪B|, |A\B| are read from
  // sketch algebra on the rolled-up state. OUTPUT contract
  // (hash-stable): the exact per-region cardinalities (distinct counts
  // + one join, deterministic) plus ok_* booleans pinning each rollup
  // estimate within 5% of exact. Theta sketches are hash-deterministic
  // (fixed seed, no RNG), and at the driver scales the per-nation
  // sketches stay below the 4096-entry exact threshold, so the union
  // fold inherits most of that headroom — the gates cannot flake.
  // (A customer belongs to exactly one nation, so the per-(region,
  // nation, cust) distinct already makes (region, cust) unique — no
  // second dedup shuffle before the exact counts.)
  def extThetaGroup(s: SparkSession, dir: String): DataFrame = {
    val buyers = t(s, dir, "orders")
      .select(col("o_custkey").as("c"), col("o_orderpriority").as("p"))
      .join(t(s, dir, "customer")
        .select(col("c_custkey").as("c"), col("c_nationkey").as("nk")), "c")
      .join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("nk"), col("n_regionkey").as("rk"))),
        "nk")
    def seg(p: String): DataFrame =
      buyers.filter(col("p") === p).select("rk", "nk", "c").distinct()
    val a = seg("1-URGENT")
    val b = seg("2-HIGH")
    // stored state: one sketch per (region, nation); rollup: one
    // theta_union_agg fold per region — blobs only, no raw re-scan
    def roll(seg: DataFrame, out: String): DataFrame = seg
      .groupBy("rk", "nk").agg(expr("theta_sketch_agg(c)").as("sk"))
      .groupBy("rk").agg(expr("theta_union_agg(sk)").as(out))
    val est = roll(a, "sk_a").join(roll(b, "sk_b"), "rk")
      .select(col("rk"),
        expr("theta_sketch_estimate(sk_a)").as("e_a"),
        expr("theta_sketch_estimate(sk_b)").as("e_b"),
        expr("theta_sketch_estimate(theta_intersection(sk_a, sk_b))")
          .as("e_and"),
        expr("theta_sketch_estimate(theta_union(sk_a, sk_b))").as("e_or"),
        expr("theta_sketch_estimate(theta_difference(sk_a, sk_b))")
          .as("e_not"))
    val exA = a.groupBy("rk").agg(count(lit(1)).as("n_a"))
    val exB = b.groupBy("rk").agg(count(lit(1)).as("n_b"))
    val exAnd = a.select("rk", "c")
      .join(b.select("rk", "c"), Seq("rk", "c"), "left_semi")
      .groupBy("rk").agg(count(lit(1)).as("n_and"))
    def ok(est: String, exact: org.apache.spark.sql.Column) =
      abs(col(est) - exact) <= exact * 0.05
    exA.join(exB, "rk")
      .join(exAnd, Seq("rk"), "left")
      .withColumn("n_and", coalesce(col("n_and"), lit(0L)))
      .join(est, "rk")
      .join(broadcast(t(s, dir, "region")
        .select(col("r_regionkey").as("rk"), col("r_name").as("region"))),
        "rk")
      .select(col("region"), col("n_a"), col("n_b"), col("n_and"),
        (col("n_a") + col("n_b") - col("n_and")).as("n_or"),
        (col("n_a") - col("n_and")).as("n_not"),
        ok("e_a", col("n_a")).as("ok_a"),
        ok("e_b", col("n_b")).as("ok_b"),
        ok("e_and", col("n_and")).as("ok_and"),
        ok("e_or", col("n_a") + col("n_b") - col("n_and")).as("ok_or"),
        ok("e_not", col("n_a") - col("n_and")).as("ok_not"))
      .orderBy("region")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_theta_group" -> (extThetaGroup _))

  // E-473 oracle: exact per-region set algebra with literal-true gates
  // (the E-469/E-468 tolerance-row discipline).
  val oracleSql: Map[String, String] = Map(
    "ext_theta_group" ->
      """with buyers as materialized (
        |  select n_regionkey rk, o_custkey c, o_orderpriority p
        |  from orders join customer on o_custkey = c_custkey
        |  join nation on c_nationkey = n_nationkey),
        |a as materialized (
        |  select distinct rk, c from buyers where p = '1-URGENT'),
        |b as materialized (
        |  select distinct rk, c from buyers where p = '2-HIGH'),
        |x as (select a.rk, cast(count(*) as bigint) n_and
        |  from a join b on a.rk = b.rk and a.c = b.c group by 1),
        |ea as (select rk, cast(count(*) as bigint) n_a from a group by 1),
        |eb as (select rk, cast(count(*) as bigint) n_b from b group by 1)
        |select r_name region, ea.n_a, eb.n_b,
        |  coalesce(x.n_and, 0) n_and,
        |  ea.n_a + eb.n_b - coalesce(x.n_and, 0) n_or,
        |  ea.n_a - coalesce(x.n_and, 0) n_not,
        |  true ok_a, true ok_b, true ok_and, true ok_or, true ok_not
        |from ea join eb on eb.rk = ea.rk
        |left join x on x.rk = ea.rk
        |join region on r_regionkey = ea.rk
        |order by region""".stripMargin)
}
