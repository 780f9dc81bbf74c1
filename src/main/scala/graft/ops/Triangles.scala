package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting (E-38) — the third graph primitive
  * beside connected components and PageRank, and the standard
  * cohesion/spam signal over co-occurrence graphs.
  *
  * Algorithm: the classic degree orientation. Each undirected edge is
  * directed from its lower-(degree, id) endpoint to the higher, making
  * the graph a DAG in which every triangle appears as EXACTLY one
  * (e1: a→b, e2: b→c, e3: a→c) path-plus-closure — no post-dedup, no
  * 6× overcount. Orientation also bounds each node's out-degree by
  * O(√m) on any graph, which is what keeps the wedge join (e1 ⋈ e2)
  * from exploding on hubs — the reason this exact plan is the textbook
  * distributed formulation.
  *
  * Cost: one degree aggregate, then two equi-joins keyed on node ids
  * (wedge build + closure check) — all shuffle-partitionable, AQE
  * handles residual skew. Output is per-node triangle counts (each
  * triangle credits its 3 corners).
  */
object Triangles {

  /** Degree orientation: each undirected edge directed from its
    * lower-(degree, id) endpoint `s` to the higher `t`. Exposed so
    * scaling probes can measure the wedge count Σ_s d_out·(d_out−1)/2 —
    * the exact size of the e1 ⋈ e2 join below, the quantity that must
    * stay sub-quadratic for triangle work to survive a 100× scale-up.
    *
    * @param edges undirected edge list as (u, v) with u < v, distinct.
    */
  def orient(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("u").as("k"))
      .unionAll(edges.select(col("v").as("k")))
      .groupBy("k").agg(count(lit(1)).as("d"))
    edges
      .join(deg.select(col("k").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("k").as("v"), col("d").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("s"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("t"))
  }

  /** Every triangle exactly once as (a, b, c) in orientation order.
    *
    * @param edges undirected edge list as (u, v) with u < v, distinct.
    */
  def triangleList(edges: DataFrame): DataFrame = {
    val oriented = orient(edges)
    val e1 = oriented.select(col("s").as("a"), col("t").as("b"))
    val e2 = oriented.select(col("s").as("b"), col("t").as("c"))
    val e3 = oriented.select(col("s").as("a"), col("t").as("c"))
    e1.join(e2, "b").join(e3, Seq("a", "c"))
  }

  /** @param edges undirected edge list as (u, v) with u < v, distinct.
    * @return (id, n_triangles) for every node in ≥1 triangle.
    */
  def perNode(edges: DataFrame): DataFrame =
    triangleList(edges)
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))

  /** Per-edge triangle support — the k-truss building block: an edge's
    * support is the number of triangles it closes, and the (k)-truss is
    * the maximal subgraph where every edge has support ≥ k−2. Each
    * triangle from [[triangleList]] credits its three edges
    * (canonicalized back to u < v); edges in no triangle surface with
    * support 0 via the left join.
    *
    * @param edges undirected edge list as (u, v) with u < v, distinct.
    * @return (u, v, support) for EVERY input edge.
    */
  def edgeSupport(edges: DataFrame): DataFrame = {
    val tri = triangleList(edges)
    val tedges = tri.select(col("a").as("x"), col("b").as("y"))
      .unionAll(tri.select(col("b").as("x"), col("c").as("y")))
      .unionAll(tri.select(col("a").as("x"), col("c").as("y")))
      .select(least(col("x"), col("y")).as("u"),
        greatest(col("x"), col("y")).as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("sup"))
    edges.join(tedges, Seq("u", "v"), "left")
      .select(col("u"), col("v"), coalesce(col("sup"), lit(0L)).as("support"))
  }
}
