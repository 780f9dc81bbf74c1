package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 extension queries, batch 50: game-theoretic attribution and
  * spatial statistics — exact-coalition Shapley values over the three
  * exposure channels, and Moran's I spatial autocorrelation with the
  * region adjacency as the weight matrix, cross-multiplied to exact
  * integers throughout.
  */
object ExtensionQueries50 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-307 Shapley channel attribution -----------------------------------------
  // Which exposure channel (view / click / signup) actually drives
  // purchase conversion? Coalition values v(S) = conversion rate of
  // users whose exposure set is EXACTLY S (empty-coalition cells
  // default 0), Shapley weights for 3 players pinned as exact
  // rationals (1/3, 1/6): φᵢ = ⅓(v{i}−v∅) + ⅙Σ_j(v{ij}−v{j}) +
  // ⅓(v{ijk}−v{jk}). The order-free attribution beside last-touch
  // E-145 and the journey views.
  def extShapley(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "events")
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("hv"),
        max(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("hc"),
        max(when(col("event_type") === "signup", 1L).otherwise(0L))
          .as("hg"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
    val cells = per.groupBy("hv", "hc", "hg")
      .agg(count(lit(1)).as("n"), sum("conv").as("nc"))
    def v(hv: Int, hc: Int, hg: Int): Column = coalesce(
      max(when(col("hv") === hv && col("hc") === hc && col("hg") === hg,
        when(col("n") > 0, col("nc").cast("double") / col("n"))
          .otherwise(lit(0.0)))), lit(0.0))
    val wide = cells.agg(
      v(0, 0, 0).as("v000"), v(1, 0, 0).as("v100"), v(0, 1, 0).as("v010"),
      v(0, 0, 1).as("v001"), v(1, 1, 0).as("v110"), v(1, 0, 1).as("v101"),
      v(0, 1, 1).as("v011"), v(1, 1, 1).as("v111"))
    val phis = wide.select(
      (lit(1.0) / 3 * (col("v100") - col("v000")) +
        lit(1.0) / 6 * ((col("v110") - col("v010")) +
          (col("v101") - col("v001"))) +
        lit(1.0) / 3 * (col("v111") - col("v011"))).as("phi_view"),
      (lit(1.0) / 3 * (col("v010") - col("v000")) +
        lit(1.0) / 6 * ((col("v110") - col("v100")) +
          (col("v011") - col("v001"))) +
        lit(1.0) / 3 * (col("v111") - col("v101"))).as("phi_click"),
      (lit(1.0) / 3 * (col("v001") - col("v000")) +
        lit(1.0) / 6 * ((col("v101") - col("v100")) +
          (col("v011") - col("v010"))) +
        lit(1.0) / 3 * (col("v111") - col("v110"))).as("phi_signup"))
    phis.select(expr(
      """stack(3,
        |'view', round(phi_view, 6),
        |'click', round(phi_click, 6),
        |'signup', round(phi_signup, 6)) as (channel, shapley)""".stripMargin))
      .orderBy("channel")
  }

  // ---- E-308 Moran's I -----------------------------------------------------------
  // Is nation revenue spatially clustered by REGION? Moran's I with
  // w_ij = 1 for same-region nation pairs (i ≠ j): using the
  // cross-multiplied deviations zcᵢ = N·xᵢ − Σx (exact decimals — the
  // N² factors cancel in the ratio), I = (N/W)·Σw·zcᵢzc_j / Σzcᵢ².
  // Positive I = rich regions cluster. Pair join runs within regions
  // over the 25-row nation aggregate.
  def extMoran(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_nationkey").as("nk"), col("n_regionkey").as("rk"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long"))
        .cast("decimal(38,0)").as("x"))
    val tot = rev.agg(count(lit(1)).as("n"), sum("x").as("sx"))
    val zc = rev.crossJoin(broadcast(tot))
      .select(col("nk"), col("rk"),
        (col("n") * col("x") - col("sx")).as("zc"), col("n"))
    val cross = zc.select(col("rk"), col("nk").as("i"), col("zc").as("zi"))
      .join(zc.select(col("rk"), col("nk").as("j"), col("zc").as("zj")),
        "rk")
      .filter(col("i") =!= col("j"))
      .agg(count(lit(1)).as("w"), sum(col("zi") * col("zj")).as("num"))
    val denom = zc.agg(max("n").as("n"),
      sum(col("zc") * col("zc")).as("den"))
    cross.crossJoin(broadcast(denom))
      .select(col("n"), col("w"),
        round(col("n").cast("double") / col("w") *
          col("num").cast("double") / col("den").cast("double"), 6)
          .as("moran_i"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_shapley" -> (extShapley _),
    "ext_moran" -> (extMoran _))

  val oracleSql: Map[String, String] = Map(
    // E-307: identical coalition cells and pinned rational weights.
    "ext_shapley" ->
      """with per as (select user_id,
        |    max(case when event_type = 'view' then 1 else 0 end) hv,
        |    max(case when event_type = 'click' then 1 else 0 end) hc,
        |    max(case when event_type = 'signup' then 1 else 0 end) hg,
        |    max(case when event_type = 'purchase' then 1 else 0 end) conv
        |  from events group by user_id),
        |cells as (select hv, hc, hg, cast(count(*) as bigint) n,
        |    cast(sum(conv) as bigint) nc
        |  from per group by hv, hc, hg),
        |wide as (select
        |    coalesce(max(case when hv=0 and hc=0 and hg=0
        |      then cast(nc as double)/n end), 0.0) v000,
        |    coalesce(max(case when hv=1 and hc=0 and hg=0
        |      then cast(nc as double)/n end), 0.0) v100,
        |    coalesce(max(case when hv=0 and hc=1 and hg=0
        |      then cast(nc as double)/n end), 0.0) v010,
        |    coalesce(max(case when hv=0 and hc=0 and hg=1
        |      then cast(nc as double)/n end), 0.0) v001,
        |    coalesce(max(case when hv=1 and hc=1 and hg=0
        |      then cast(nc as double)/n end), 0.0) v110,
        |    coalesce(max(case when hv=1 and hc=0 and hg=1
        |      then cast(nc as double)/n end), 0.0) v101,
        |    coalesce(max(case when hv=0 and hc=1 and hg=1
        |      then cast(nc as double)/n end), 0.0) v011,
        |    coalesce(max(case when hv=1 and hc=1 and hg=1
        |      then cast(nc as double)/n end), 0.0) v111
        |  from cells),
        |phis as (select
        |    1.0/3 * (v100 - v000) + 1.0/6 * ((v110 - v010) + (v101 - v001))
        |      + 1.0/3 * (v111 - v011) phi_view,
        |    1.0/3 * (v010 - v000) + 1.0/6 * ((v110 - v100) + (v011 - v001))
        |      + 1.0/3 * (v111 - v101) phi_click,
        |    1.0/3 * (v001 - v000) + 1.0/6 * ((v101 - v100) + (v011 - v010))
        |      + 1.0/3 * (v111 - v110) phi_signup
        |  from wide)
        |select channel, shapley from (
        |  select 'view' channel, round(phi_view, 6) shapley from phis
        |  union all select 'click', round(phi_click, 6) from phis
        |  union all select 'signup', round(phi_signup, 6) from phis)
        |order by channel""".stripMargin,

    // E-308: identical cross-multiplied deviations and ratio.
    "ext_moran" ->
      """with rev as (select n_nationkey nk, n_regionkey rk,
        |    cast(sum(cast(round(o_totalprice * 100) as bigint)) as hugeint)
        |      x
        |  from orders join customer on o_custkey = c_custkey
        |  join nation on c_nationkey = n_nationkey
        |  group by 1, 2),
        |tot as (select cast(count(*) as bigint) n, sum(x) sx from rev),
        |zc as (select nk, rk, n * x - sx zc, n from rev cross join tot),
        |cr as (select cast(count(*) as bigint) w,
        |    sum(a.zc * b.zc) num
        |  from zc a join zc b on a.rk = b.rk and a.nk <> b.nk),
        |de as (select max(n) n, sum(zc * zc) den from zc)
        |select n, w,
        |  round(cast(n as double) / w * cast(num as double)
        |    / cast(den as double), 6) moran_i
        |from cr cross join de""".stripMargin)
}
