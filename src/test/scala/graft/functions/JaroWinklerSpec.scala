package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** X-5: the native jaro_winkler expression — textbook vectors, the
  * degenerate shapes that break naive implementations, algebraic
  * properties, and codegen/eval agreement through a real plan.
  */
class JaroWinklerSpec extends AnyFunSuite with SparkFixture {

  test("textbook vectors match the classic Winkler variant") {
    assert(math.abs(JaroWinkler.compute("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(JaroWinkler.compute("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-12)
    assert(math.abs(JaroWinkler.compute("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(math.abs(JaroWinkler.compute("CRATE", "TRACE") - 0.7333333333333334) < 1e-12)
  }

  test("boost threshold: no prefix bonus at jaro <= 0.7") {
    // jaro('prefix','prezzz') = 2/3 < 0.7 — a 3-char common prefix
    // must NOT lift the score (unconditional-boost variants give 0.7667)
    assert(math.abs(JaroWinkler.compute("prefix", "prezzz") - 0.6666666666666666) < 1e-12)
    // just above the threshold the bonus applies through the prefix cap
    assert(math.abs(JaroWinkler.compute("aaaa", "aaab") - 0.8833333333333334) < 1e-12)
  }

  test("degenerate shapes: empties, window 0, equality") {
    assert(JaroWinkler.compute("", "abc") == 0.0)
    assert(JaroWinkler.compute("ab", "") == 0.0)
    assert(JaroWinkler.compute("x", "y") == 0.0)
    assert(JaroWinkler.compute("ab", "ba") == 0.0) // window 0: no matches
    assert(JaroWinkler.compute("same", "same") == 1.0)
  }

  test("symmetry and range over fixture name pairs") {
    val pairs = for {
      a <- Seq("small ring", "red widget", "blue bolt", "hot gear", "small gizmo")
      b <- Seq("small ring", "red widget", "blue bolt", "hot gear", "small gizmo")
    } yield (a, b)
    pairs.foreach { case (a, b) =>
      val ab = JaroWinkler.compute(a, b)
      val ba = JaroWinkler.compute(b, a)
      assert(ab == ba, s"asymmetric for ($a, $b)")
      assert(ab >= 0.0 && ab <= 1.0)
      if (a == b) assert(ab == 1.0)
    }
  }

  test("codegen path through a DataFrame plan equals the static kernel") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rows = Seq(("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"),
      ("DIXON", "DICKSONX"), ("prefix", "prezzz"), ("ab", "ba"),
      ("small ring", "small gizmo")).toDF("a", "b")
    val got = rows
      .withColumn("jw", call_function("jaro_winkler", col("a"), col("b")))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    got.foreach { case (a, b, jw) =>
      assert(jw == JaroWinkler.compute(a, b), s"plan/eval drift for ($a, $b)")
    }
    // null propagation
    val n = rows.select(
      call_function("jaro_winkler", lit(null).cast("string"), col("b")))
      .collect()
    assert(n.forall(_.isNullAt(0)))
  }
}
