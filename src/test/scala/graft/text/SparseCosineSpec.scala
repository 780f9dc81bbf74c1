package graft.text

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

class SparseCosineSpec extends AnyFunSuite with SparkFixture {

  test("identical docs cos 1, disjoint docs absent, closed-form weights") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val got = SparseCosine.similarPairs(docs, dfCap = Long.MaxValue,
        minCos = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // only the identical pair shares any token
    assert(got.keySet == Set((1L, 2L)))
    assert(math.abs(got((1L, 2L)) - 1.0) < 1e-12)
  }

  test("densePairs (block-pair geometry) equals similarPairs on the fixture corpus") {
    val docs = graft.Tables.table(spark, sf0001, "documents")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(org.apache.spark.sql.functions.col("id_a"),
          org.apache.spark.sql.functions.col("id_b"),
          org.apache.spark.sql.functions.round(
            org.apache.spark.sql.functions.col("cos"), 4).as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(x => (x._1, x._2)).toSeq
    val sparse = canon(SparseCosine.similarPairs(docs, Long.MaxValue, 0.5))
    val dense = canon(SparseCosine.densePairs(docs, Long.MaxValue, 0.5))
    assert(dense == sparse, s"${dense.size} dense vs ${sparse.size} sparse")
    assert(dense.nonEmpty)
  }

  test("autoPairs picks dense on the small-vocab fixture, sparse past the threshold, equal results") {
    import org.apache.spark.sql.functions.{col, round}
    val docs = graft.Tables.table(spark, sf0001, "documents")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id_a"), col("id_b"), round(col("cos"), 4).as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(x => (x._1, x._2)).toSeq
    // fixture vocab (31 tokens) <= default threshold -> dense geometry,
    // visible in the plan as the codegen'd cosine_sim block-pair join
    val auto = SparseCosine.autoPairs(docs, Long.MaxValue, 0.5)
    assert(auto.queryExecution.analyzed.toString.contains("cosine_sim"),
      "expected the dense block-pair path on a 31-token vocabulary")
    assert(canon(auto) == canon(SparseCosine.similarPairs(docs, Long.MaxValue, 0.5)))
    // forcing the threshold below the vocab flips to the posting-list
    // join (no cosine_sim in that plan) with the same result
    val sparse = SparseCosine.autoPairs(docs, Long.MaxValue, 0.5, denseVocabMax = 0)
    assert(!sparse.queryExecution.analyzed.toString.contains("cosine_sim"),
      "expected the posting-list path when vocab exceeds denseVocabMax")
    assert(canon(sparse) == canon(auto))
  }

  test("dfCap prunes stopword-like tokens from index AND norms") {
    import spark.implicits._
    // "common" is in all three docs (df=3); A/B also share "rare"
    val docs = Seq(
      (1L, "common rare"),
      (2L, "common rare"),
      (3L, "common other"))
      .toDF("doc_id", "text")
    val uncapped = SparseCosine.similarPairs(docs, Long.MaxValue, 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ln(3/3)=0 for "common", so pairs through it alone carry dot 0 —
    // but the PAIRS still materialize in the join (quadratic work)
    assert(uncapped.contains((1L, 2L)))
    val capped = SparseCosine.similarPairs(docs, dfCap = 2, minCos = 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // with "common" pruned, only (1,2) meet at all — and on the pruned
    // 1-token vocabulary their cosine is exactly 1
    assert(capped.keySet == Set((1L, 2L)))
    assert(math.abs(capped((1L, 2L)) - 1.0) < 1e-12)
  }
}
