package graft.queries

import graft.{SparkFixture, SparkEntry}
import org.scalatest.funsuite.AnyFunSuite

/** t1-style smoke: every registered query runs at sf0.001 without
  * throwing and (except genuinely-empty anti-join style results) returns
  * rows. Deep correctness lives in the DuckDB-oracle gate (Verify +
  * tools/check_correctness.py), not here.
  */
class ContractQueriesSpec extends AnyFunSuite with SparkFixture {

  // Queries whose result can legitimately be empty at sf0.001. q13d is the
  // non-vacuity companion for q13c at the GATE SFs (13 rows at sf0.01, 93
  // at sf0.1 — pinned by its oracle compare); at sf0.001 every BUILDING
  // customer happens to have an F-status order, so it is empty by data.
  private val mayBeEmpty = Set("q12", "q13c", "q13d", "q24")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val rows = fn(spark, sf0001).collect()
      if (!mayBeEmpty(name)) assert(rows.nonEmpty, s"$name returned no rows")
    }
  }

  test("every query has oracle SQL") {
    // Round-4 invariant: zero rows-only queries. Approximate-by-design
    // ops either gained an engine-portable oracle (ext_simhash_neardup)
    // or are gated through a hashable derived contract (ext_ann_recall
    // for the LSH path, which is not itself a driver row).
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }
}
