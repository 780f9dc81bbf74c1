package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 extension queries, batch 108: network attack-robustness
  * (what fraction of the graph survives losing its hubs — the
  * supply-chain stress question) and the parquet compression-codec
  * matrix (S-23: snappy/gzip/zstd round-trips byte-equal content —
  * the storage-layer knob audited the same way the format matrix
  * S-8/S-9/S-10 is).
  */
object ExtensionQueries108 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- E-449 hub-removal robustness -----------------------------------------------
  // Percolation-style stress test on the (bounded-key) supplier–part
  // graph: remove the 16 highest-degree nodes (ties to the smaller
  // id) and recompute connectivity with the E-22 hash-min machinery
  // run to FIXPOINT. Reported: nodes/LCC before, nodes/LCC/component
  // count after — the "does the network shatter without its hubs"
  // audit (scale-free graphs do, lattices don't). Node ids are longs
  // (parts offset by 1e6) so the components operator's long contract
  // holds; the contract subgraph is key-bounded (suppkey ≤ 100,
  // partkey ≤ 300) because the ORACLE is a recursive-CTE transitive
  // closure — the operator itself is the measured-linear E-22 path.
  def extRobustness(s: SparkSession, dir: String): DataFrame = {
    val pe = t(s, dir, "lineitem")
      .filter(col("l_suppkey") <= 100 && col("l_partkey") <= 300)
      .select(col("l_suppkey").cast("long").as("sn"),
        (col("l_partkey") + 1000000L).cast("long").as("pn"))
      .distinct()
      .localCheckpoint()
    val deg = pe.select(col("sn").as("n")).unionAll(pe.select(col("pn").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val hubs = deg.orderBy(desc("d"), asc("n")).limit(16).select(col("n"))
    val pe1 = pe
      .join(broadcast(hubs.select(col("n").as("sn"))), Seq("sn"), "left_anti")
      .join(broadcast(hubs.select(col("n").as("pn"))), Seq("pn"), "left_anti")
    val before = ConnectedComponents.components(
      pe.select(col("sn").as("src"), col("pn").as("dst")))
    val after = ConnectedComponents.components(
      pe1.select(col("sn").as("src"), col("pn").as("dst")))
    val nNodes = pe.select(col("sn").as("n"))
      .union(pe.select(col("pn").as("n"))).distinct()
      .agg(count(lit(1)).as("n_nodes"))
    val lccB = before.groupBy("component").agg(count(lit(1)).as("sz"))
      .agg(max("sz").as("lcc_before"))
    val aStats = after.groupBy("component").agg(count(lit(1)).as("sz"))
      .agg(sum("sz").as("n_nodes_after"), max("sz").as("lcc_after"),
        count(lit(1)).as("n_comp_after"))
    nNodes.crossJoin(broadcast(lccB.limit(1)))
      .crossJoin(broadcast(aStats.limit(1)))
      .select(col("n_nodes"), col("lcc_before"), col("n_nodes_after"),
        col("lcc_after"), col("n_comp_after"))
  }

  // ---- S-23 / q133 parquet compression-codec matrix --------------------------------
  // Write the nation dim under snappy, gzip, and zstd; read each back
  // and aggregate — every codec must reproduce the identical content
  // (the oracle aggregates the ORIGINAL table per codec name). The
  // storage knob that decides scan cost at 100 TB, gated the same way
  // as the format matrix. Temp dir is per-JVM unique with a
  // shutdown-hook delete (the q129 discipline — the returned frame
  // reads lazily).
  def q133CodecMatrix(s: SparkSession, dir: String): DataFrame = {
    val tmpDir = java.nio.file.Files.createTempDirectory("graft_codec_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files => F}
      import scala.jdk.CollectionConverters._
      try F.walk(tmpDir).iterator().asScala.toSeq.reverse
        .foreach(p => F.deleteIfExists(p))
      catch { case _: Throwable => () } // best-effort cleanup
    }))
    val src = t(s, dir, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    val codecs = Seq("snappy", "gzip", "zstd")
    codecs.map { c =>
      val p = s"$tmpDir/$c"
      src.write.mode("overwrite").option("compression", c).parquet(p)
      s.read.parquet(p).select(lit(c).as("codec"), col("n_nationkey"),
        col("n_name"), col("n_regionkey"))
    }.reduce(_ unionAll _)
      .groupBy("codec")
      .agg(count(lit(1)).as("n_rows"), sum("n_nationkey").as("key_sum"),
        sum(length(col("n_name"))).as("name_chars"),
        countDistinct("n_regionkey").as("n_regions"))
      .orderBy("codec")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_robustness" -> (extRobustness _),
    "q133_codec_matrix" -> (q133CodecMatrix _))

  val oracleSql: Map[String, String] = Map(
    // E-449: recursive-CTE closures on the bounded graph, before and
    // after the same deterministic hub cut.
    "ext_robustness" ->
      """with recursive pe as (select distinct cast(l_suppkey as bigint) sn,
        |    cast(1000000 + l_partkey as bigint) pn
        |  from lineitem where l_suppkey <= 100 and l_partkey <= 300),
        |e0 as (select sn u, pn v from pe union select pn, sn from pe),
        |r0(a, b) as (select u, v from e0
        |  union select r.a, e.v from r0 r join e0 e on r.b = e.u),
        |lab0 as (select a, least(a, min(b)) c from r0 group by a),
        |deg as (select n, count(*) d from (select sn n from pe
        |  union all select pn from pe) t group by n),
        |hubs as (select n from deg order by d desc, n limit 16),
        |pe1 as (select sn, pn from pe
        |  where sn not in (select n from hubs)
        |    and pn not in (select n from hubs)),
        |e1 as (select sn u, pn v from pe1 union select pn, sn from pe1),
        |r1(a, b) as (select u, v from e1
        |  union select r.a, e.v from r1 r join e1 e on r.b = e.u),
        |lab1 as (select a, least(a, min(b)) c from r1 group by a),
        |nn as (select count(*) n_nodes from (select sn n from pe
        |  union select pn from pe) t),
        |lb as (select max(sz) lcc_before from (
        |  select c, count(*) sz from lab0 group by c) t),
        |la as (select cast(sum(sz) as bigint) n_nodes_after,
        |    max(sz) lcc_after, count(*) n_comp_after from (
        |  select c, count(*) sz from lab1 group by c) t)
        |select n_nodes, lcc_before, n_nodes_after, lcc_after, n_comp_after
        |from nn, lb, la""".stripMargin,

    // S-23: per-codec aggregates must equal the original table's.
    "q133_codec_matrix" ->
      """with codecs as (select unnest(['gzip', 'snappy', 'zstd']) codec),
        |agg as (select count(*) n_rows,
        |    cast(sum(n_nationkey) as bigint) key_sum,
        |    cast(sum(length(n_name)) as bigint) name_chars,
        |    count(distinct n_regionkey) n_regions
        |  from nation)
        |select codec, n_rows, key_sum, name_chars, n_regions
        |from codecs, agg order by codec""".stripMargin)
}
