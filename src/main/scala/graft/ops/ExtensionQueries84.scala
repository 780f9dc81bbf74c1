package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 extension queries, batch 84: spatial statistics on the
  * embedding (dim0, dim1) plane — Getis-Ord-style hotspot z-scores
  * over a quantized grid, Ripley's K clustering test against the CSR
  * expectation, and join-count statistics of hot-cell adjacency. All
  * ride the E-77 grid-blocking discipline: candidates from 3×3
  * neighbor EQUI-joins on cell coordinates, never an all-pairs
  * product.
  */
object ExtensionQueries84 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Occupied 0.1-wide grid cells with point counts over the first two
    * embedding dims (floor on the settled double ⇒ identical cell ids
    * both engines).
    */
  private def cells(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(
        floor(element_at(col("embedding"), 1).cast("double") / 0.1)
          .cast("long").as("cx"),
        floor(element_at(col("embedding"), 2).cast("double") / 0.1)
          .cast("long").as("cy"))
      .groupBy("cx", "cy").agg(count(lit(1)).as("cnt"))

  private val nbrOffsets: Seq[(Int, Int)] =
    for (dx <- -1 to 1; dy <- -1 to 1) yield (dx, dy)

  // ---- E-399 Getis-Ord hotspot z-scores ------------------------------------------
  // WHERE do embeddings cluster? Gi*-style z per occupied cell with
  // binary 3×3 weights over OCCUPIED cells (the sparse-grid contract):
  // z_i = (Σ_{j∈N(i)} x_j − x̄·w_i) ∕ (S·√((n·w_i − w_i²)∕(n−1))) with
  // neighborhood sums from one 9-probe equi-join, x̄∕S from exact
  // integer count moments. Top-15 hottest cells.
  def extHotspot(s: SparkSession, dir: String): DataFrame = {
    val c = cells(s, dir)
    val probes = c.select(col("cx").as("tx"), col("cy").as("ty"),
        explode(array(nbrOffsets.map { case (dx, dy) =>
          struct(lit(dx).as("dx"), lit(dy).as("dy")) }: _*)).as("o"))
      .select(col("tx"), col("ty"),
        (col("tx") + col("o.dx")).as("cx"),
        (col("ty") + col("o.dy")).as("cy"))
    val nbr = probes.join(c, Seq("cx", "cy"))
      .groupBy(col("tx").as("cx"), col("ty").as("cy"))
      .agg(sum("cnt").as("nsum"), count(lit(1)).as("w"))
    val mom = c.agg(count(lit(1)).as("n"),
        sum(col("cnt").cast("decimal(38,0)")).as("sx"),
        sum(col("cnt").cast("decimal(38,0)") * col("cnt")).as("sxx"))
      .limit(1)
    nbr.join(c, Seq("cx", "cy"))
      .crossJoin(broadcast(mom))
      .select(col("cx"), col("cy"), col("cnt"), col("w"),
        col("nsum"), col("n"), col("sx"), col("sxx"))
      .withColumn("xbar", col("sx").cast("double") / col("n"))
      .withColumn("s2",
        col("sxx").cast("double") / col("n") -
          (col("sx").cast("double") / col("n")) *
          (col("sx").cast("double") / col("n")))
      .select(col("cx"), col("cy"), col("cnt"), col("w").as("n_nbrs"),
        col("nsum").as("nbr_sum"),
        round((col("nsum").cast("double") - col("xbar") * col("w")) /
          (sqrt(col("s2")) *
            sqrt((col("n") * col("w") - col("w") * col("w"))
              .cast("double") / (col("n") - 1).cast("double"))), 4)
          .as("gi_z"))
      .orderBy(desc("gi_z"), asc("cx"), asc("cy"))
      .limit(15)
  }

  // ---- E-400 Ripley's K clustering test ------------------------------------------
  // Are the points clustered beyond chance? K(r) = A·P(r)∕(n(n−1))
  // with P(r) = ordered pairs within r, candidates from the 3×3 cell
  // join (r ≤ the 0.1 cell size ⇒ exact recall), the ≤-r test decided
  // on 1e-12-quantized squared distances so no boundary pair flips;
  // A = measured bounding box. CSR expectation πr²; ratio > 1 =
  // clustered. r ∈ {0.05, 0.1}.
  def extRipleyk(s: SparkSession, dir: String): DataFrame = {
    val pts = t(s, dir, "embeddings")
      .select(col("vec_id"),
        element_at(col("embedding"), 1).cast("double").as("x"),
        element_at(col("embedding"), 2).cast("double").as("y"))
      .withColumn("cx", floor(col("x") / 0.1).cast("long"))
      .withColumn("cy", floor(col("y") / 0.1).cast("long"))
    val box = pts.agg(count(lit(1)).as("n"),
      ((max("x") - min("x")) * (max("y") - min("y"))).as("area")).limit(1)
    val probes = pts.select(col("vec_id").as("ida"), col("x").as("xa"),
        col("y").as("ya"),
        explode(array(nbrOffsets.map { case (dx, dy) =>
          struct(lit(dx).as("dx"), lit(dy).as("dy")) }: _*)).as("o"),
        col("cx"), col("cy"))
      .select(col("ida"), col("xa"), col("ya"),
        (col("cx") + col("o.dx")).as("cx"),
        (col("cy") + col("o.dy")).as("cy"))
    val pairs = probes.join(
        pts.select(col("vec_id").as("idb"), col("x").as("xb"),
          col("y").as("yb"), col("cx"), col("cy")), Seq("cx", "cy"))
      .filter(col("ida") =!= col("idb"))
      .select(round(((col("xa") - col("xb")) * (col("xa") - col("xb")) +
        (col("ya") - col("yb")) * (col("ya") - col("yb"))) * lit(1e12))
        .cast("long").as("d2q"))
    val rs = Seq(0.05, 0.1)
    val counts = rs.map { r =>
      pairs.filter(col("d2q") <= math.round(r * r * 1e12))
        .agg(count(lit(1)).as("p"))
        .select(lit(r).as("r"), col("p"))
    }.reduce(_ unionByName _)
    counts.crossJoin(broadcast(box))
      .select(col("r"), col("p").as("pairs_within_r"),
        round(col("area") * col("p") /
          (col("n").cast("double") * (col("n") - 1)), 6).as("k_r"),
        round(lit(math.Pi) * col("r") * col("r"), 6).as("csr_pi_r2"),
        round(col("area") * col("p") /
          (col("n").cast("double") * (col("n") - 1)) /
          (lit(math.Pi) * col("r") * col("r")), 4).as("cluster_ratio"))
      .orderBy("r")
  }

  // ---- E-401 join-count statistics -----------------------------------------------
  // Do HOT cells (count above the occupied-cell median) sit next to
  // each other? Rook-adjacent occupied-cell pairs (2-probe equi-join,
  // each unordered pair once), BB join count vs the randomization
  // expectation W·n_B(n_B−1)∕(n(n−1)) — all integers until the one
  // ratio; ratio > 1 = spatial clustering of the hot mark.
  def extJointcount(s: SparkSession, dir: String): DataFrame = {
    val c = cells(s, dir)
    val med = c.agg(expr("percentile(cnt, 0.5)").as("m")).limit(1)
    val marked = c.crossJoin(broadcast(med))
      .select(col("cx"), col("cy"),
        (col("cnt").cast("double") > col("m")).as("hot"))
    val right = marked.select(col("cx").as("rx"), col("cy").as("ry"),
      col("hot").as("rhot"))
    val pairs = marked.select(col("cx"), col("cy"), col("hot"),
        explode(array(
          struct(lit(1).as("dx"), lit(0).as("dy")),
          struct(lit(0).as("dx"), lit(1).as("dy")))).as("o"))
      .select(col("cx"), col("cy"), col("hot"),
        (col("cx") + col("o.dx")).as("rx"),
        (col("cy") + col("o.dy")).as("ry"))
      .join(right, Seq("rx", "ry"))
    val nb = marked.agg(count(lit(1)).as("n"),
      sum(when(col("hot"), 1L).otherwise(0L)).as("nb")).limit(1)
    pairs.agg(count(lit(1)).as("w"),
        sum(when(col("hot") && col("rhot"), 1L).otherwise(0L)).as("bb"))
      .crossJoin(broadcast(nb))
      .select(col("n").as("n_cells"), col("nb").as("n_hot"),
        col("w").as("adjacent_pairs"), col("bb").as("bb_observed"),
        round(col("w").cast("double") * col("nb") * (col("nb") - 1) /
          (col("n").cast("double") * (col("n") - 1)), 4)
          .as("bb_expected"),
        round(col("bb").cast("double") /
          (col("w").cast("double") * col("nb") * (col("nb") - 1) /
            (col("n").cast("double") * (col("n") - 1))), 4)
          .as("bb_ratio"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_hotspot" -> (extHotspot _),
    "ext_ripleyk" -> (extRipleyk _),
    "ext_jointcount" -> (extJointcount _))

  private val cellSql =
    """cells as (select
      |    cast(floor(cast(embedding[1] as double) / 0.1) as bigint) cx,
      |    cast(floor(cast(embedding[2] as double) / 0.1) as bigint) cy,
      |    cast(count(*) as bigint) cnt
      |  from embeddings group by 1, 2)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // E-399: identical grid, 9-probe neighbor join, Gi* form.
    "ext_hotspot" ->
      s"""with $cellSql,
        |probes as (select c.cx tx, c.cy ty,
        |    c.cx + o.dx cx, c.cy + o.dy cy
        |  from cells c cross join (
        |    select dx.dx, dy.dy
        |    from (select unnest([-1, 0, 1]) dx) dx
        |    cross join (select unnest([-1, 0, 1]) dy) dy) o),
        |nbr as (select p.tx cx, p.ty cy,
        |    cast(sum(c.cnt) as bigint) nsum,
        |    cast(count(*) as bigint) w
        |  from probes p join cells c on c.cx = p.cx and c.cy = p.cy
        |  group by 1, 2),
        |mom as (select cast(count(*) as bigint) n,
        |    sum(cast(cnt as hugeint)) sx,
        |    sum(cast(cnt as hugeint) * cnt) sxx
        |  from cells)
        |select nbr.cx cx, nbr.cy cy, cells.cnt, w n_nbrs, nsum nbr_sum,
        |  round((cast(nsum as double) - cast(sx as double) / n * w) /
        |    (sqrt(cast(sxx as double) / n -
        |      (cast(sx as double) / n) * (cast(sx as double) / n)) *
        |     sqrt(cast(n * w - w * w as double) /
        |       cast(n - 1 as double))), 4) gi_z
        |from nbr
        |join cells on cells.cx = nbr.cx and cells.cy = nbr.cy
        |cross join mom
        |order by 6 desc, 1 asc, 2 asc limit 15""".stripMargin,

    // E-400: identical blocking, quantized distance test, K form.
    "ext_ripleyk" ->
      """with pts as (select vec_id,
        |    cast(embedding[1] as double) x,
        |    cast(embedding[2] as double) y,
        |    cast(floor(cast(embedding[1] as double) / 0.1) as bigint) cx,
        |    cast(floor(cast(embedding[2] as double) / 0.1) as bigint) cy
        |  from embeddings),
        |box as (select cast(count(*) as bigint) n,
        |    (max(x) - min(x)) * (max(y) - min(y)) area from pts),
        |probes as (select a.vec_id ida, a.x xa, a.y ya,
        |    a.cx + o.dx cx, a.cy + o.dy cy
        |  from pts a cross join (
        |    select dx.dx, dy.dy
        |    from (select unnest([-1, 0, 1]) dx) dx
        |    cross join (select unnest([-1, 0, 1]) dy) dy) o),
        |pairs as (select cast(round(((xa - b.x) * (xa - b.x) +
        |      (ya - b.y) * (ya - b.y)) * 1e12) as bigint) d2q
        |  from probes p join pts b on b.cx = p.cx and b.cy = p.cy
        |  where p.ida <> b.vec_id),
        |counts as (
        |  select cast(0.05 as double) r,
        |    cast(count(*) filter (where d2q <= 2500000000) as bigint) p
        |  from pairs
        |  union all
        |  select cast(0.1 as double),
        |    cast(count(*) filter (where d2q <= 10000000000) as bigint)
        |  from pairs)
        |select r, p pairs_within_r,
        |  round(area * p / (cast(n as double) * (n - 1)), 6) k_r,
        |  round(pi() * r * r, 6) csr_pi_r2,
        |  round(area * p / (cast(n as double) * (n - 1)) /
        |    (pi() * r * r), 4) cluster_ratio
        |from counts cross join box
        |order by r""".stripMargin,

    // E-401: identical median mark, rook pairs, randomization form.
    "ext_jointcount" ->
      s"""with $cellSql,
        |med as (select quantile_cont(cnt, 0.5) m from cells),
        |marked as (select cx, cy, cast(cnt as double) > m hot
        |  from cells cross join med),
        |pairs as (select a.hot, b.hot rhot
        |  from marked a cross join (
        |    select unnest([1, 0]) dx, unnest([0, 1]) dy) o
        |  join marked b on b.cx = a.cx + o.dx and b.cy = a.cy + o.dy),
        |nb as (select cast(count(*) as bigint) n,
        |    cast(sum(case when hot then 1 else 0 end) as bigint) nb
        |  from marked)
        |select any_value(n) n_cells, any_value(nb) n_hot,
        |  cast(count(*) as bigint) adjacent_pairs,
        |  cast(sum(case when hot and rhot then 1 else 0 end) as bigint)
        |    bb_observed,
        |  round(cast(count(*) as double) * any_value(nb) *
        |    (any_value(nb) - 1) /
        |    (cast(any_value(n) as double) * (any_value(n) - 1)), 4)
        |    bb_expected,
        |  round(cast(sum(case when hot and rhot then 1 else 0 end)
        |      as double) /
        |    (cast(count(*) as double) * any_value(nb) *
        |      (any_value(nb) - 1) /
        |      (cast(any_value(n) as double) * (any_value(n) - 1))), 4)
        |    bb_ratio
        |from pairs cross join nb""".stripMargin)
}
