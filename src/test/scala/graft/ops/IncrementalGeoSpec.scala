package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property gates for E-74 (incremental aggregate maintenance) and
  * E-77 (grid-blocked spatial join) beyond the driver's fixed-slice
  * oracles: merge associativity over MANY batches, and blocked ≡
  * brute-force at a different radius than the gated one.
  */
class IncrementalGeoSpec extends AnyFunSuite with SparkFixture {

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  test("incremental state merge over 4 arbitrary batches equals one-pass state") {
    val o = graft.Tables.table(spark, sf0001, "orders")
    val key = col("o_custkey") % 10
    val batches = (0 to 3).map(i =>
      IncrementalAgg.state(o.filter(col("o_orderkey") % 4 === i),
        key, col("o_totalprice")))
    val merged = batches.reduce(IncrementalAgg.merge)
    val onePass = IncrementalAgg.state(o, key, col("o_totalprice"))
    def m(df: org.apache.spark.sql.DataFrame) =
      canon(IncrementalAgg.metrics(df).select(col("k"), col("n"),
        round(col("s"), 2).as("s"), round(col("avg"), 4).as("a"),
        col("mn"), col("mx")))
    assert(m(merged) == m(onePass))
  }

  test("grid-blocked nearest join equals brute force at radius 25 km") {
    val probes = graft.Tables.table(spark, sf0001, "customer")
      .select(col("c_custkey").as("id"),
        (lit(40.0) + (col("c_custkey") * 37 % 500) / 100.0).as("lat"),
        ((col("c_custkey") * 101 % 500) / 100.0).as("lon"))
    val cands = graft.Tables.table(spark, sf0001, "supplier")
      .select(col("s_suppkey").as("id"),
        (lit(40.0) + (col("s_suppkey") * 53 % 500) / 100.0).as("lat"),
        ((col("s_suppkey") * 71 % 500) / 100.0).as("lon"))
    val blocked = GeoJoin.nearestWithin(probes, cands, radiusKm = 25.0)
    val brute = {
      val c = cands.select(col("id").as("cand_id"), col("lat").as("clat"),
        col("lon").as("clon"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("probe_id").orderBy("dist_km", "cand_id")
      probes.select(col("id").as("probe_id"), col("lat"), col("lon"))
        .crossJoin(c)
        .select(col("probe_id"), col("cand_id"),
          round(GeoJoin.haversineKm(col("lat"), col("lon"), col("clat"),
            col("clon")), 3).as("dist_km"))
        .filter(col("dist_km") <= 25.0)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .drop("rn")
    }
    assert(blocked.count() > 0, "radius too small to exercise the join")
    assert(canon(blocked) == canon(brute))
  }

  test("nearestWithin rejects radii the 3x3 neighborhood cannot cover") {
    val df = spark.range(1).select(col("id"), lit(0.0).as("lat"),
      lit(0.0).as("lon"))
    intercept[IllegalArgumentException] {
      GeoJoin.nearestWithin(df, df, radiusKm = 100.0)
    }
  }
}
