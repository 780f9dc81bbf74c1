package graft.text

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE merge learning (SURVEY E-425, text/Bpe). The pair-frequency
  * kernel is oracle-gated (ext_bpe); these properties gate the
  * driver-coordinated multi-round trainer and the fold-based merge
  * application against hand-computed expectations.
  */
class BpeSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  // Sennrich-style toy corpus: 'es' then 'est' then 'l o' dominate.
  private val corpus = Seq(
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest").toDF("text")

  test("learned merges match the hand-computed sequence") {
    val merges = Bpe.learnMerges(corpus, rounds = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: 'es' appears in newest(6) + widest(3) = 9 — the unique max
    assert(merges(0) == ((1, "e", "s", 9L)), s"got ${merges(0)}")
    // round 2: 'es'+'t' = 9 again (t always follows es)
    assert(merges(1) == ((2, "es", "t", 9L)), s"got ${merges(1)}")
    // round 3: 'est</w>' = 9 (est always ends its words here)
    assert(merges(2) == ((3, "est", "</w>", 9L)), s"got ${merges(2)}")
    // round 4: 'l'+'o' = low(5) + lower(2) = 7
    assert(merges(3) == ((4, "l", "o", 7L)), s"got ${merges(3)}")
  }

  test("merge application is greedy left-to-right and overlap-safe") {
    // "aaa" under merge (a,a): greedy gives [aa, a], never [a, aa]
    // or [aa, aa]
    val df = Seq(Tuple1(Seq("a", "a", "a"))).toDF("syms")
      .select(Bpe.applyMerge(col("syms"), "a", "a").as("out"))
    assert(df.head().getSeq[String](0) == Seq("aa", "a"))
  }

  test("encode applies merges in order and round-trips the text") {
    val merges = Seq(("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"))
    val enc = Bpe.encode(corpus, merges).select("text", "bpe_syms", "n_bpe_tokens")
    val row = enc.filter(col("text").startsWith("newest")).head()
    val syms = row.getSeq[String](1)
    // every word 'newest' encodes as [n, e, w, est</w>]
    assert(syms.take(4) == Seq("n", "e", "w", "est</w>"), s"got $syms")
    assert(row.getLong(2) == 24L, "6 words x 4 symbols")
    // decode: stripping markers and concatenating restores the text
    val decoded = syms.mkString("").replace(Bpe.Eow, " ").trim
    assert(decoded == row.getString(0))
  }

  test("training is deterministic across runs") {
    val a = Bpe.learnMerges(corpus, rounds = 4).collect().toSeq
    val b = Bpe.learnMerges(corpus, rounds = 4).collect().toSeq
    assert(a == b)
  }

  test("exhaustion stops early instead of looping") {
    val tiny = Seq("ab").toDF("text")
    // 'ab' has pairs (a,b), (b,</w>): 2 merges exhaust it; asking for
    // 10 returns what exists
    val merges = Bpe.learnMerges(tiny, rounds = 10).collect()
    assert(merges.length <= 3)
  }
}
