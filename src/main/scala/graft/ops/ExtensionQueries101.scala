package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 extension queries, batch 101: in-database learning and
  * centrality — a batch perceptron trained entirely in EXACT integer
  * arithmetic (the settled-fold discipline applied to model fitting:
  * every epoch is one aggregate, every weight a bigint) and harmonic
  * closeness centrality made grid-free by the ×12 trick (12/d is an
  * exact integer for every hop count d ≤ 4). Oracles are GENERATED
  * unrolled epoch/round CTEs (the ext_ppr/ext_sssp pattern).
  */
object ExtensionQueries101 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-435 batch perceptron (exact integer training) ----------------------------
  // Linear classifier y = sign(w0 + w1·x1 + w2·x2) for "is this a
  // BUILDING-segment customer", trained by THREE synchronous batch
  // epochs: errors are counted against the epoch-start weights, then
  // w += Σ_misclassified y·x in one map-side-combinable aggregate —
  // no per-row sequential updates, so the trace is order-independent
  // and engine-exact (features are integer dollars/keys, weights stay
  // bigint; classic perceptron, batch form). The weight state is a
  // 1-row broadcast (limit(1) keeps the cross join provably bounded
  // for the plan gate). Output: per-epoch error count + post-update
  // weights — the convergence trace IS the contract.
  def extPerceptron(s: SparkSession, dir: String): DataFrame = {
    val data = t(s, dir, "customer").select(
      when(col("c_mktsegment") === "BUILDING", lit(1L)).otherwise(lit(-1L))
        .as("y"),
      floor(col("c_acctbal")).cast("long").as("x1"),
      col("c_nationkey").cast("long").as("x2"))
    var w = s.range(1).select(lit(0L).as("w0"), lit(0L).as("w1"),
      lit(0L).as("w2"))
    var out: DataFrame = null
    for (epoch <- 1 to 3) {
      val scored = data.crossJoin(broadcast(w.limit(1)))
        .withColumn("graft_pc_m",
          col("y") * (col("w0") + col("w1") * col("x1") +
            col("w2") * col("x2")))
      val step = scored.agg(
        sum(when(col("graft_pc_m") <= 0, lit(1L)).otherwise(lit(0L)))
          .as("errors"),
        coalesce(sum(when(col("graft_pc_m") <= 0, col("y"))), lit(0L))
          .as("graft_pc_d0"),
        coalesce(sum(when(col("graft_pc_m") <= 0, col("y") * col("x1"))),
          lit(0L)).as("graft_pc_d1"),
        coalesce(sum(when(col("graft_pc_m") <= 0, col("y") * col("x2"))),
          lit(0L)).as("graft_pc_d2"))
      val next = w.limit(1).crossJoin(broadcast(step.limit(1)))
        .select((col("w0") + col("graft_pc_d0")).as("w0"),
          (col("w1") + col("graft_pc_d1")).as("w1"),
          (col("w2") + col("graft_pc_d2")).as("w2"),
          col("errors")).localCheckpoint()
      val row = next.select(lit(epoch.toLong).as("epoch"), col("errors"),
        col("w0"), col("w1"), col("w2"))
      out = if (out == null) row else out.unionAll(row)
      w = next.select("w0", "w1", "w2")
    }
    out.orderBy("epoch")
  }

  // ---- E-436 harmonic closeness centrality ----------------------------------------
  // Harmonic centrality H(v) = Σ_{u≠v} 1/d(v,u) truncated at depth 4
  // for probe suppliers S1..S10 over the co-purchase graph — the
  // "how centrally placed" number that stays finite under
  // disconnection (unreached nodes contribute 0, no ∞ sums). Depth-4
  // hop counts make every reciprocal a TWELFTH: h12 = Σ 12/d is an
  // exact bigint (12, 6, 4, 3), so the score needs no float at any
  // scale — the E-432 grid-exactness trick applied to distances. One
  // labeled multi-seed BFS sweep (Bfs.labeledHops: 10 probes share
  // each round's frontier join).
  def extCloseness(s: SparkSession, dir: String): DataFrame = {
    // long-encoded node ids (SpIds): every labeled-BFS round shuffles
    // (seed LONG, id LONG) instead of strings; seeds decode at the
    // output boundary only
    val pairs = t(s, dir, "lineitem")
      .select(SpIds.s(col("l_suppkey")).as("sn"),
        SpIds.p(col("l_partkey")).as("pn"))
      .distinct()
    val edges = pairs.select(col("sn").as("src"), col("pn").as("dst"))
      .unionAll(pairs.select(col("pn").as("src"), col("sn").as("dst")))
    val spark = s
    import spark.implicits._
    val sources = (1 to 10).map(i => (2L * i, 2L * i)).toDF("seed", "id")
    Bfs.labeledHops(edges, sources, maxHops = 4)
      .filter(col("hops") > 0)
      .groupBy(col("seed"))
      .agg(count(lit(1)).as("reached"),
        sum(expr("CAST(12 AS BIGINT) DIV CAST(hops AS BIGINT)")).as("h12"))
      .select(SpIds.decode(col("seed")).as("seed"), col("reached"), col("h12"))
      .orderBy("seed")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_perceptron" -> (extPerceptron _),
    "ext_closeness" -> (extCloseness _))

  // E-435 oracle: identical unrolled epochs — errors against the
  // epoch-start weights, bigint casts on every summed delta (the
  // HUGEINT trap), 1-row cross joins for the weight state.
  private def perceptronOracle(epochs: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """with d as (select
        |    case when c_mktsegment = 'BUILDING' then cast(1 as bigint)
        |         else cast(-1 as bigint) end y,
        |    cast(floor(c_acctbal) as bigint) x1,
        |    cast(c_nationkey as bigint) x2
        |  from customer),
        |cw0 as (select cast(0 as bigint) w0, cast(0 as bigint) w1,
        |  cast(0 as bigint) w2),
        |""".stripMargin)
    for (k <- 1 to epochs) {
      sb.append(s"ce$k as (select ")
      sb.append(s"cast(count(*) filter (where y * (w.w0 + w.w1 * x1 + w.w2 * x2) <= 0) as bigint) errs, ")
      sb.append(s"cast(coalesce(sum(y) filter (where y * (w.w0 + w.w1 * x1 + w.w2 * x2) <= 0), 0) as bigint) d0, ")
      sb.append(s"cast(coalesce(sum(y * x1) filter (where y * (w.w0 + w.w1 * x1 + w.w2 * x2) <= 0), 0) as bigint) d1, ")
      sb.append(s"cast(coalesce(sum(y * x2) filter (where y * (w.w0 + w.w1 * x1 + w.w2 * x2) <= 0), 0) as bigint) d2 ")
      sb.append(s"from d, cw${k - 1} w),\n")
      sb.append(s"cw$k as (select cast(w.w0 + e.d0 as bigint) w0, ")
      sb.append(s"cast(w.w1 + e.d1 as bigint) w1, ")
      sb.append(s"cast(w.w2 + e.d2 as bigint) w2 from cw${k - 1} w, ce$k e),\n")
    }
    val rows = (1 to epochs).map(k =>
      s"select cast($k as bigint) epoch, e.errs errors, w.w0, w.w1, w.w2 " +
        s"from ce$k e, cw$k w")
    sb.append(rows.mkString("r as (", " union all ", ")\n"))
    sb.append("select epoch, errors, w0, w1, w2 from r order by epoch")
    sb.toString
  }

  // E-436 oracle: the E-51 labeled BFS unrolled (union + min fold per
  // round, frontier = last round's discoveries), then the exact
  // twelfths fold.
  private def closenessOracle(rounds: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """with pairs as (select distinct 'S' || l_suppkey sn, 'P' || l_partkey pn
        |  from lineitem),
        |edges as (select sn src, pn dst from pairs
        |          union all select pn, sn from pairs),
        |h0 as (select 'S' || g id, 'S' || g seed, 0 hops
        |  from generate_series(1, 10) t(g)),
        |""".stripMargin)
    for (k <- 1 to rounds) {
      sb.append(s"h$k as (select seed, id, min(hops) hops from (")
      sb.append(s"select seed, id, hops from h${k - 1} union all ")
      sb.append(s"select f.seed, e.dst id, $k hops from ")
      sb.append(s"(select seed, id from h${k - 1} where hops = ${k - 1}) f ")
      sb.append(s"join edges e on e.src = f.id) t group by seed, id)")
      sb.append(if (k < rounds) ",\n" else "\n")
    }
    sb.append(s"select seed, count(*) reached, ")
    sb.append(s"cast(sum(12 // hops) as bigint) h12 from h$rounds ")
    sb.append("where hops > 0 group by seed order by seed")
    sb.toString
  }

  val oracleSql: Map[String, String] = Map(
    "ext_perceptron" -> perceptronOracle(3),
    "ext_closeness" -> closenessOracle(4))
}
