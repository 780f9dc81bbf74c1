package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.Path

/** Small-file compaction (S-15) — the standard table-maintenance pass:
  * a directory fragmented by many tiny writes (streaming micro-batches,
  * over-parallel jobs) is rewritten into ⌈bytes/targetBytes⌉ files.
  *
  * Why it matters at 100 TB: scan parallelism and scheduler overhead are
  * driven by FILE count, not row count — a million 100 KB files turns a
  * table scan into a listing + task-launch storm, and ruins parquet
  * row-group compression. Compaction is one full read + one write, so
  * it runs at I/O speed; values are untouched (the q84 gate hash-matches
  * the read-back against the direct-table oracle).
  *
  * Writes to `dir + ".compact"` then swaps atomically-enough for a
  * single writer (rename), which is the semantics every filesystem
  * table without a transactional format gets.
  */
object Compaction {

  /** Rewrite the parquet directory at `dir` into ~targetBytes files.
    * Returns (files before, files after).
    */
  def compactParquet(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(p: Path): Array[Path] = fs.listStatus(p)
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .map(_.getPath)
    val before = dataFiles(path)
    val totalBytes = before.map(fs.getFileStatus(_).getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new Path(dir + ".compact")
    spark.read.parquet(dir).repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    // Swap via rename-aside, not delete-then-rename: a crash between the
    // two renames leaves the data findable at dir+".old" (or already in
    // place), never a window where NO copy exists at/near the table path.
    val old = new Path(dir + ".old")
    fs.delete(old, true) // leftover from a previous crashed swap
    fs.rename(path, old)
    fs.rename(tmp, path)
    fs.delete(old, true)
    (before.length, dataFiles(path).length)
  }
}
