package graft.ops

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sampling properties the oracle can't express: approximate uniformity
  * of the hash-rate filter, prefix stability of exact-k, stratified
  * caps, and the top-k physical plan.
  */
class SamplingSpec extends AnyFunSuite with SparkFixture {

  private lazy val customer = Tables.table(spark, sf001, "customer")

  test("rateNibble keeps ~n/16 per nibble and nests monotonically") {
    val n = customer.count().toDouble
    val one = Sampling.rateNibble(customer, col("c_custkey"), 1).count()
    val four = Sampling.rateNibble(customer, col("c_custkey"), 4).count()
    assert(math.abs(one - n / 16) / (n / 16) < 0.35, s"1/16 sample off: $one of $n")
    assert(math.abs(four - n / 4) / (n / 4) < 0.2, s"4/16 sample off: $four of $n")
    assert(four > one)
  }

  test("exactK returns exactly k, and k-samples are prefixes of larger ones") {
    val k10 = Sampling.exactK(customer, col("c_custkey"), 10)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val k30 = Sampling.exactK(customer, col("c_custkey"), 30)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(k10.size == 10 && k30.size == 30)
    assert(k10.subsetOf(k30), "smaller sample must be a prefix of the larger")
  }

  test("weightedK: heavy weights overrepresented; plan is top-k, not global sort") {
    import spark.implicits._
    // 500 keys at weight 1, 500 at weight 10 -> a 100-row sample should
    // be dominated by the heavy class (E[heavy] ~ 90+); uniform would
    // give ~50
    val df = (0 until 1000)
      .map(i => (i.toLong, if (i < 500) 1.0 else 10.0)).toDF("k", "w")
    val got = Sampling.weightedK(df, col("k"), col("w"), 100)
    val heavy = got.filter(col("w") === 10.0).count()
    assert(heavy > 70, s"heavy class underrepresented: $heavy of 100")
    assert(got.count() == 100)
    val plan = got.queryExecution.sparkPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"weighted sample must plan as top-k:\n${plan.take(800)}")
  }

  test("exactK plans as TakeOrderedAndProject (no global sort)") {
    val s = Sampling.exactK(customer, col("c_custkey"), 10)
      .queryExecution.executedPlan.toString
    assert(s.contains("TakeOrderedAndProject"), s"no top-k operator:\n${s.take(1200)}")
  }

  test("stratifiedK caps every stratum at k with uniform-in-stratum picks") {
    val out = Sampling.stratifiedK(customer, col("c_mktsegment"), col("c_custkey"), 3)
    val sizes = out.groupBy("c_mktsegment").count().collect()
    assert(sizes.nonEmpty && sizes.forall(_.getLong(1) <= 3))
    // deterministic: same call twice, same rows
    val again = Sampling.stratifiedK(customer, col("c_mktsegment"), col("c_custkey"), 3)
    assert(out.select("c_custkey").collect().map(_.getLong(0)).sorted.toSeq ==
      again.select("c_custkey").collect().map(_.getLong(0)).sorted.toSeq)
  }
}
