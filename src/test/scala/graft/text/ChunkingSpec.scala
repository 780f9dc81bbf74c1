package graft.text

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChunkingSpec extends AnyFunSuite with SparkFixture {

  private def chunksOf(text: String, size: Int, overlap: Int): Seq[(Long, Long, String)] = {
    import spark.implicits._
    Chunking.chunkDocs(Seq((1L, text)).toDF("doc_id", "text"), size, overlap)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3))).toSeq
  }

  test("short document yields one chunk equal to itself") {
    assert(chunksOf("a b c", 5, 2) == Seq((0L, 3L, "a b c")))
    assert(chunksOf("a b c d e", 5, 2) == Seq((0L, 5L, "a b c d e")))
  }

  test("overlapping windows advance by stride and cover the tail") {
    // 7 tokens, size 5, overlap 2 -> stride 3 -> chunks at 0 and 3
    assert(chunksOf("t0 t1 t2 t3 t4 t5 t6", 5, 2) ==
      Seq((0L, 5L, "t0 t1 t2 t3 t4"), (1L, 4L, "t3 t4 t5 t6")))
  }

  test("every token is covered; dropping the overlap reconstructs the document") {
    val docs = Tables.table(spark, sf0001, "documents").limit(50)
    val size = 12; val overlap = 4; val stride = size - overlap
    val chunks = Chunking.chunkDocs(docs, size, overlap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val originals = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, text) <- originals) {
      val cs = chunks(id)
      // chunk 0 whole + later chunks minus their leading overlap tokens
      val rebuilt = (cs.head.split(" ", -1) ++
        cs.tail.flatMap(_.split(" ", -1).drop(overlap))).mkString(" ")
      assert(rebuilt == text, s"doc $id not reconstructed")
      assert(cs.forall(_.split(" ", -1).length <= size))
      // consecutive chunks share exactly the overlap region
      for (Seq(a, b) <- cs.sliding(2).filter(_.size == 2)) {
        assert(a.split(" ", -1).drop(stride).take(overlap).toSeq ==
          b.split(" ", -1).take(overlap).toSeq.take(
            math.min(overlap, b.split(" ", -1).length)))
      }
    }
  }

  test("content-defined chunks survive a prefix insertion; grid chunks do not") {
    import spark.implicits._
    // deterministic 80-token doc; B = A with two tokens prepended
    val toksA = (1 to 80).map(i => s"w${i * 7 % 101}")
    val a = toksA.mkString(" ")
    val b = ("zz qq " + a)
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")

    def chunksOf(got: org.apache.spark.sql.DataFrame, id: Long): Set[String] =
      got.filter(col("doc_id") === id).select("chunk")
        .collect().map(_.getString(0)).toSet
    val cdc = Chunking.contentDefinedChunks(df)
    val (ca, cb) = (chunksOf(cdc, 1L), chunksOf(cdc, 2L))
    // every CDC chunk of A except (possibly) the first survives in B:
    // the insertion only perturbs text before A's first boundary
    assert((ca intersect cb).size >= ca.size - 1,
      s"CDC chunks not shift-stable: ${ca.size} vs shared ${(ca intersect cb).size}")
    assert(ca.size >= 4, s"boundary rate too low for the test to bite: ${ca.size}")

    // the fixed grid shifts every chunk: near-zero survival
    val grid = Chunking.chunkDocs(df, chunkSize = 8, overlap = 0)
    val (ga, gb) = (chunksOf(grid.withColumnRenamed("chunk", "chunk"), 1L),
      chunksOf(grid, 2L))
    assert((ga intersect gb).size <= 1,
      s"grid unexpectedly shift-stable: shared ${(ga intersect gb).size}")
  }
}
