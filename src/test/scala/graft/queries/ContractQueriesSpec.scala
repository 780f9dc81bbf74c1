package graft.queries

import graft.{SparkFixture, SparkEntry}
import org.scalatest.funsuite.AnyFunSuite

/** t1-style smoke: every registered query runs at sf0.001 without
  * throwing and (except genuinely-empty anti-join style results) returns
  * rows. Deep correctness lives in the DuckDB-oracle gate (Verify +
  * tools/check_correctness.py), not here.
  */
class ContractQueriesSpec extends AnyFunSuite with SparkFixture {

  // Queries whose result can legitimately be empty at sf0.001.
  private val mayBeEmpty = Set("q12", "q13c", "q24")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val rows = fn(spark, sf0001).collect()
      if (!mayBeEmpty(name)) assert(rows.nonEmpty, s"$name returned no rows")
    }
  }

  test("every query has oracle SQL or is explicitly non-SQL") {
    // Approximate-by-design ops whose outputs depend on engine-internal
    // hashes get the driver's rows-only check instead of a DuckDB oracle.
    val rowsOnly = Set("ext_simhash_neardup", "ext_ann_topk")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }
}
