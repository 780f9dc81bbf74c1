package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Optional comma-separated query-name filter for fast local iteration
    // (never set by the driver — full run remains the default).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_(n)) }
    // Atomic file write: temp file in the same dir, then ATOMIC_MOVE — a
    // crash mid-write can never leave a truncated JSON the driver's
    // json.load would choke on (round 11's CORRECTNESS arrived empty;
    // every artifact here is now either absent or complete).
    def writeAtomic(path: String, content: String): Unit = {
      val target = Paths.get(path)
      // .json.tmp suffix (NOT .json): a crash between write and move must
      // not leave a partial file that an extension-based listing picks up.
      val tmp = Files.createTempFile(target.getParent, ".tmp_", ".json.tmp")
      Files.writeString(tmp, content)
      Files.move(tmp, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // oracle_sql.json is written FIRST, before any query runs: if the run
    // dies mid-loop (OOM, driver timeout) the oracle map still exists and
    // the partial parquet dirs remain individually comparable.
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    writeAtomic(s"$outDir/oracle_sql.json", json)
    // A failed query must surface as an explicit error artifact, never as
    // silent absence from the output dir (round 5 lost 33 queries to a
    // loader exception that only reached stderr).
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // Catalog snapshot BEFORE the run: teardown drops only graft_* managed
    // tables CREATED by this run, so a pre-existing user table that happens
    // to match the prefix survives.
    val preExisting = spark.catalog.listTables().collect()
      .filter(t => t.name.startsWith("graft_") && t.tableType == "MANAGED")
      .map(_.name).toSet
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
      }
    }
    val errJson = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    writeAtomic(s"$outDir/_errors.json", errJson)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries FAILED: ${errors.keys.mkString(", ")}")
    // teardown: the DDL/MERGE contract queries create managed graft_*
    // tables (results are parquet-dumped above, so dropping is safe
    // here) — without this every run leaves spark-warehouse/ residue in
    // the working dir
    spark.catalog.listTables().collect()
      .filter(t => t.name.startsWith("graft_") && t.tableType == "MANAGED"
        && !preExisting(t.name))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${t.name}"))
    // the time-travel gate's versioned table is path-based, not a
    // catalog entry — remove its directory the same way (URI-decode the
    // warehouse path: stripPrefix would keep %20-style escapes)
    val whDir = {
      val raw = spark.conf.get("spark.sql.warehouse.dir")
      val u = new java.net.URI(raw)
      if (u.getScheme == null) raw else new java.io.File(u).getPath
    }
    val vd = new java.io.File(whDir + "/graft_versioned_demo")
    if (vd.exists) org.apache.commons.io.FileUtils.deleteDirectory(vd)
    // Completion marker: present ⇔ every selected query was attempted and
    // its result (or error entry) written. The driver/judge can distinguish
    // "run finished with N results" from "run died after N results".
    writeAtomic(s"$outDir/_SUCCESS.json",
      s"""{"queries": ${selected.size}, "errors": ${errors.size}}""")
    spark.stop()
    // Exit contract: default exit 0 with _errors.json/_SUCCESS.json carrying
    // the red/green signal — a driver that treats nonzero exit as an
    // infrastructure failure must never discard completed artifacts over one
    // red query. Opt into process-level red with SPARK_GRAFT_STRICT_EXIT=1.
    if (errors.nonEmpty && sys.env.get("SPARK_GRAFT_STRICT_EXIT").contains("1"))
      sys.exit(1)
  }
}
