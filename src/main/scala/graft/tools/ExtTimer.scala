package graft.tools

import org.apache.spark.sql.SparkSession

/** Times every driver-contract query at SPARK_GRAFT_SF_DIR and prints
  * them slowest-first: `EXTTIME <name> <sec>` (warm: best of 2 runs).
  * Used to pick the expensive-operator set that [[graft.ExtBench]]
  * budget-gates. Dev tool, not part of the driver contract.
  */
object ExtTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val times = names.map { n =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { graft.SparkEntry.queries(n)(spark, sfDir).collect() }
        catch { case e: Throwable =>
          println(s"EXTERR $n ${e.getClass.getSimpleName}"); return -1.0 }
        (System.nanoTime() - t0) / 1e9
      }
      val t1 = once()
      // propagate the -1.0 error sentinel from EITHER run (abs() of a
      // second-run failure used to record a bogus 1.0 s warm time)
      val t2 = if (t1 < 0) t1 else once()
      n -> (if (t1 < 0 || t2 < 0) -1.0 else math.min(t1, t2))
    }
    times.sortBy(-_._2).foreach { case (n, t) => println(f"EXTTIME $n $t%.3f") }
    spark.stop()
  }
}
