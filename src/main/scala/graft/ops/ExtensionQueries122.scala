package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 extension queries, batch 122: Theta-sketch SET ALGEBRA —
  * the distinct-count operation HLL (E-81 / A-3c) cannot do. An HLL
  * union is exact-ish, but audience INTERSECTION ("how many customers
  * bought both?") and difference are not derivable from HLL state; the
  * DataSketches Theta family keeps a hash sample below a threshold θ,
  * so ∩ / ∪ / \ compose on the sketches themselves — the segment-
  * overlap primitive every 100 TB audience/cohort rollup stores.
  */
object ExtensionQueries122 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-469 theta-sketch audience overlap audit ----------------------------------
  // Segments: customers with ≥1 URGENT-priority order (A) vs ≥1
  // HIGH-priority order (B). Per segment a theta_sketch_agg over
  // o_custkey; |A∩B| / |A∪B| / |A\B| read from theta_intersection /
  // theta_union / theta_difference of the two sketch blobs — never
  // from re-scanned raw data. OUTPUT contract (hash-stable): the exact
  // set cardinalities (plain distinct counts + one join, deterministic)
  // plus ok_* booleans pinning each sketch estimate within 5% of its
  // exact value. Theta sketches are hash-deterministic (fixed seed, no
  // RNG): with default lgK=12 the RSE is ~1.6% at the sf0.1
  // cardinalities and the sketch is EXACT below 4096 entries, so the
  // 5% gates carry structural headroom at both driver scales.
  def extTheta(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_custkey").as("c"), col("o_orderpriority").as("p"))
    val a = o.filter(col("p") === "1-URGENT").select("c").distinct()
    val b = o.filter(col("p") === "2-HIGH").select("c").distinct()
    val exact = a.agg(count(lit(1)).as("n_a"))
      .crossJoin(b.agg(count(lit(1)).as("n_b")))
      .crossJoin(a.join(b, Seq("c"), "left_semi")
        .agg(count(lit(1)).as("n_and")))
    val sk = a.agg(expr("theta_sketch_agg(c)").as("sk_a"))
      .crossJoin(b.agg(expr("theta_sketch_agg(c)").as("sk_b")))
      .select(
        expr("theta_sketch_estimate(sk_a)").as("e_a"),
        expr("theta_sketch_estimate(sk_b)").as("e_b"),
        expr("theta_sketch_estimate(theta_intersection(sk_a, sk_b))").as("e_and"),
        expr("theta_sketch_estimate(theta_union(sk_a, sk_b))").as("e_or"),
        expr("theta_sketch_estimate(theta_difference(sk_a, sk_b))").as("e_not"))
    def ok(est: String, exactCol: org.apache.spark.sql.Column) =
      abs(col(est) - exactCol) <= exactCol * 0.05
    exact.crossJoin(sk)
      .select(col("n_a"), col("n_b"), col("n_and"),
        (col("n_a") + col("n_b") - col("n_and")).as("n_or"),
        (col("n_a") - col("n_and")).as("n_not"),
        ok("e_a", col("n_a")).as("ok_a"),
        ok("e_b", col("n_b")).as("ok_b"),
        ok("e_and", col("n_and")).as("ok_and"),
        ok("e_or", col("n_a") + col("n_b") - col("n_and")).as("ok_or"),
        ok("e_not", col("n_a") - col("n_and")).as("ok_not"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_theta" -> (extTheta _))

  // E-469 oracle: the exact set algebra (inclusion–exclusion for ∪, \)
  // with literal-true gates — the KLL/E-468 tolerance-row discipline.
  val oracleSql: Map[String, String] = Map(
    "ext_theta" ->
      """with a as (select distinct o_custkey c from orders
        |  where o_orderpriority = '1-URGENT'),
        |b as (select distinct o_custkey c from orders
        |  where o_orderpriority = '2-HIGH'),
        |x as (select cast(count(*) as bigint) n_and
        |  from a where c in (select c from b))
        |select (select cast(count(*) as bigint) from a) n_a,
        |  (select cast(count(*) as bigint) from b) n_b,
        |  x.n_and,
        |  (select count(*) from a) + (select count(*) from b) - x.n_and n_or,
        |  (select count(*) from a) - x.n_and n_not,
        |  true ok_a, true ok_b, true ok_and, true ok_or, true ok_not
        |from x""".stripMargin)
}
