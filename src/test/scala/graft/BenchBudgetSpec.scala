package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gates for the bench-budget enforcement logic (no Spark needed):
  * Bench.main exits non-zero exactly when checkBudgets reports a
  * violation, so these cases pin the driver-facing contract.
  */
class BenchBudgetSpec extends AnyFunSuite {

  test("within-budget results produce no violations") {
    val ok = Bench.budgetsSf01.toSeq.map { case (q, b) => q -> b * 0.5 }
    assert(Bench.checkBudgets(ok, Bench.budgetsSf01).isEmpty)
  }

  test("a result exactly on budget passes; epsilon over fails") {
    assert(Bench.checkBudgets(Seq("b1" -> 1.80), Bench.budgetsSf01).isEmpty)
    val v = Bench.checkBudgets(Seq("b1" -> 1.8001), Bench.budgetsSf01)
    assert(v.size == 1 && v.head.startsWith("b1 took"))
  }

  test("forced failure: an over-budget query is reported by name") {
    val v = Bench.checkBudgets(
      Seq("b3" -> 0.5, "b4" -> 2.0, "b5" -> 0.2), Bench.budgetsSf01)
    assert(v == Seq("b4 took 2.000 s, over its 0.84 s budget"))
  }

  test("a query that threw (negative time) violates at any scale factor") {
    val v = Bench.checkBudgets(Seq("b9" -> -1.0), Map.empty)
    assert(v == Seq("b9 failed (threw during bench)"))
  }

  test("every headline query carries a budget") {
    val headline = (1 to 10).map(i => s"b$i")
    assert(headline.forall(Bench.budgetsSf01.contains))
  }

  test("budgets equal the BASELINE.md 2x-budget column (single source of truth)") {
    // the budget table lives in BASELINE.md's Numbers section as
    // "| B<i> ... | <duckdb> | <spark> | ≤ <budget> | ..." rows; parse
    // it and require budgetsSf01 to match EXACTLY, so editing the
    // baseline without the enforcement map (or vice versa) fails here
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val path = Seq("BASELINE.md", "../BASELINE.md", "/root/repo/BASELINE.md")
      .map(Paths.get(_)).find(Files.exists(_))
      .getOrElse(fail("BASELINE.md not found"))
    val row = """^\| (B\d+) [^|]*\|[^|]*\|[^|]*\| ≤ ([0-9.]+) \|.*""".r
    val parsed = Files.readAllLines(path).asScala.collect {
      case row(q, b) => q.toLowerCase -> b.toDouble
    }.toMap
    assert(parsed == Bench.budgetsSf01,
      s"BASELINE.md budget table $parsed drifted from Bench.budgetsSf01 ${Bench.budgetsSf01}")
  }
}
