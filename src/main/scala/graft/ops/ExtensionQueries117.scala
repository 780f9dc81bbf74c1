package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 extension queries, batch 117: training-run preparation —
  * a curriculum batch schedule (easy-to-hard ordering with per-source
  * proportional interleave, the data-ordering knob beside mixture
  * E-121 and packing OP-*) and the k-means elbow curve (inertia at
  * k = 2/3/4 from fully in-plan Lloyd rounds — the "how many clusters"
  * audit the IVF/SemDedup/PQ quantizers all presuppose). Float
  * discipline: assignment distances are pure +/× on exactly-cast
  * values (correctly rounded, engine-stable); centroid means and
  * per-point distances are quantized 1e-6 before any exact decimal
  * fold.
  */
object ExtensionQueries117 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-461 curriculum batch schedule --------------------------------------------------
  // Length-as-difficulty curriculum over documents: within each source,
  // docs ranked easy→hard by (n_chars, doc_id); batch b ∈ [0, 10) =
  // (rank−1)·10 div n_source, so every batch holds each source's b-th
  // difficulty decile — difficulty rises monotonically across batches
  // while the source MIX stays constant (the interleave that prevents
  // a curriculum from becoming a source sort). Audit: per batch the
  // doc count, mean difficulty (exact integer sum, one settled
  // division) and distinct-source coverage.
  def extCurriculum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy(col("n_chars").asc, col("doc_id").asc)
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rn", row_number().over(w))
      .withColumn("ns", count(lit(1)).over(Window.partitionBy("source")))
      .withColumn("batch", expr("(rn - 1) * 10 div ns"))
      .groupBy("batch")
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("n_chars")).cast("double") /
          count(lit(1)).cast("double"), 4).as("mean_chars4"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy("batch")
  }

  // ---- E-462 k-means elbow curve --------------------------------------------------------
  // Inertia (within-cluster Σ dist²) after 3 synchronous Lloyd rounds
  // at k = 2, 3, 4 over customer (balance-cents, nationkey) points.
  // Seeds = first k points by (sha256-hash, pid) — deterministic, no
  // RNG, scan-shaped (TakeOrderedAndProject, never a global sort kept).
  // Assignment: argmin of dist² built from exactly-cast doubles with
  // (dist asc, cid asc) tiebreak; centroid update = mean quantized
  // 1e-6 into decimal(38,6); inertia = per-point dist quantized 1e-6
  // then EXACTLY summed. Clusters that lose all points drop out
  // (documented — k is an upper bound, n_clusters reported). The
  // centroid side of every join is a broadcast ≤ k rows.
  def extElbow(s: SparkSession, dir: String): DataFrame = {
    val d386 = "decimal(38,6)"
    val pts = t(s, dir, "customer").select(
      col("c_custkey").cast("long").as("pid"),
      round(col("c_acctbal") * 100).cast("long").as("x1"),
      col("c_nationkey").cast("long").as("x2"),
      conv(substring(sha2(col("c_custkey").cast("string"), 256), 1, 15), 16, 10)
        .cast("long").as("h"))
    var out: DataFrame = null
    for (k <- Seq(2, 3, 4)) {
      var cents = pts.orderBy(col("h").asc, col("pid").asc).limit(k)
        .withColumn("cid", row_number().over(Window.orderBy(col("h").asc, col("pid").asc)))
        .select(col("cid"), col("x1").cast(d386).as("cx1"),
          col("x2").cast(d386).as("cx2"))
        .localCheckpoint()
      var ktail: DataFrame = null
      for (r <- 1 to 3) {
        val assigned = pts.crossJoin(broadcast(cents.limit(k)))
          .withColumn("dist",
            expr("""cast(x1 - cx1 as double) * cast(x1 - cx1 as double) +
                    cast(x2 - cx2 as double) * cast(x2 - cx2 as double)"""))
          .withColumn("rk", row_number().over(
            Window.partitionBy("pid").orderBy(col("dist").asc, col("cid").asc)))
          .filter(col("rk") === 1)
        if (r < 3) {
          cents = assigned.groupBy("cid")
            .agg(
              expr(s"cast(round(cast(sum(x1) as double) / cast(count(1) as double), 6) as $d386)").as("cx1"),
              expr(s"cast(round(cast(sum(x2) as double) / cast(count(1) as double), 6) as $d386)").as("cx2"))
            .localCheckpoint()
        } else {
          ktail = assigned.agg(
            lit(k.toLong).as("k"),
            count(lit(1)).as("n_pts"),
            countDistinct(col("cid")).as("n_clusters"),
            round(sum(round(col("dist"), 6).cast(d386)).cast("double") / 1e12, 6)
              .as("inertia_e12"))
        }
      }
      out = if (out == null) ktail else out.unionAll(ktail)
    }
    out.select(col("k"), col("n_pts"), col("n_clusters"), col("inertia_e12"))
      .orderBy("k")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_curriculum" -> (extCurriculum _),
    "ext_elbow" -> (extElbow _))

  // E-462 oracle: identical unrolled Lloyd rounds per k — nested
  // selects so the dist expression feeds row_number, hugeint-safe
  // casts on every fold (the perceptron-oracle pattern).
  private def elbowOracle(ks: Seq[Int], rounds: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """with pts as (select cast(c_custkey as bigint) pid,
        |    cast(round(c_acctbal * 100) as bigint) x1,
        |    cast(c_nationkey as bigint) x2,
        |    ('0x' || substr(sha256(cast(c_custkey as varchar)), 1, 15))::bigint h
        |  from customer),
        |""".stripMargin)
    for (k <- ks) {
      sb.append(s"c${k}_0 as (select cid, cast(x1 as decimal(38,6)) cx1, ")
      sb.append("cast(x2 as decimal(38,6)) cx2 from (select pid, x1, x2, ")
      sb.append("row_number() over (order by h, pid) cid from pts) t ")
      sb.append(s"where cid <= $k),\n")
      for (r <- 1 to rounds) {
        sb.append(s"a${k}_$r as (select pid, x1, x2, cid, dist from (")
        sb.append("select pid, x1, x2, cid, dist, row_number() over ")
        sb.append("(partition by pid order by dist asc, cid asc) rk from (")
        sb.append("select p.pid, p.x1, p.x2, c.cid, ")
        sb.append("cast(p.x1 - c.cx1 as double) * cast(p.x1 - c.cx1 as double) + ")
        sb.append("cast(p.x2 - c.cx2 as double) * cast(p.x2 - c.cx2 as double) dist ")
        sb.append(s"from pts p cross join c${k}_${r - 1} c) t1) t2 where rk = 1),\n")
        if (r < rounds) {
          sb.append(s"c${k}_$r as (select cid, ")
          sb.append("cast(round(cast(sum(x1) as double) / cast(count(*) as double), 6) as decimal(38,6)) cx1, ")
          sb.append("cast(round(cast(sum(x2) as double) / cast(count(*) as double), 6) as decimal(38,6)) cx2 ")
          sb.append(s"from a${k}_$r group by cid),\n")
        }
      }
    }
    val finals = ks.map { k =>
      s"select cast($k as bigint) k, count(*) n_pts, " +
        s"cast(count(distinct cid) as bigint) n_clusters, " +
        s"round(cast(sum(cast(round(dist, 6) as decimal(38,6))) as double) / 1e12, 6) " +
        s"inertia_e12 from a${k}_$rounds"
    }
    sb.append(finals.mkString("f as (", " union all ", ")\n"))
    sb.append("select k, n_pts, n_clusters, inertia_e12 from f order by k")
    sb.toString
  }

  val oracleSql: Map[String, String] = Map(
    // E-461: identical rank → proportional-decile batching.
    "ext_curriculum" ->
      """with r as (select doc_id, source, n_chars,
        |    row_number() over (partition by source
        |      order by n_chars asc, doc_id asc) rn,
        |    count(*) over (partition by source) ns
        |  from documents)
        |select (rn - 1) * 10 // ns batch, count(*) n_docs,
        |  round(cast(sum(n_chars) as double) / cast(count(*) as double), 4)
        |    mean_chars4,
        |  count(distinct source) n_sources
        |from r group by 1 order by 1""".stripMargin,
    "ext_elbow" -> elbowOracle(Seq(2, 3, 4), 3))
}
