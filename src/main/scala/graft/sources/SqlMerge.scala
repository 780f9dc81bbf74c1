package graft.sources

import org.apache.spark.sql.SparkSession

/** SQL MERGE for plain-parquet managed tables.
  *
  * Spark's built-in `MERGE INTO` needs a DataSource-v2 table with
  * row-level-operation support (a lakehouse format); the session
  * catalog's parquet tables have none. This operator provides the same
  * semantics —
  *
  * {{{
  * MERGE INTO target t USING source s ON t.key = s.key
  *   WHEN MATCHED [AND deleteCondition] THEN DELETE
  *   WHEN MATCHED THEN UPDATE SET data = s.data
  *   WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * — as the classic copy-on-write rewrite: one full-outer join of
  * target and source staged via CTAS, then `INSERT OVERWRITE` back into
  * the target. The stage step makes the swap safe (Spark refuses to
  * overwrite a table it is simultaneously reading, and a failure during
  * the join leaves the target untouched); the overwrite itself goes
  * through the normal commit protocol.
  *
  * Scale shape: one shuffle (or broadcast, when the update set is
  * small — Catalyst/AQE decide from the source's size) on the merge
  * key, then a full rewrite of the target — exactly what a format-less
  * MERGE costs. Engines that avoid the full rewrite do it with file/
  * partition-level pruning in the table format's metadata, which is a
  * storage-layer concern, not a join-semantics one; for a partitioned
  * target the same pruning composes with dynamic partition overwrite
  * (S-12).
  */
object SqlMerge {

  /** Drop a managed table from the in-memory catalog AND remove its
    * warehouse directory — a location left by a previous session would
    * otherwise fail the next CTAS with LOCATION_ALREADY_EXISTS (the
    * in-memory catalog forgets tables on restart but the filesystem
    * does not).
    */
  def dropManaged(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
  }

  /** Merge `sourceView` (a registered view/table with the same `key`
    * and `dataCols` columns) into managed table `target`.
    *
    *  - matched rows take the source's `dataCols` values (even when
    *    NULL — update semantics, not coalesce);
    *  - target rows with no source match pass through unchanged;
    *  - source rows with no target match are inserted;
    *  - `deleteCondition` (a SQL predicate over `s.`/`t.` references),
    *    when given, deletes matched rows instead of updating them;
    *  - `opColumn`, when given, names a target column rewritten with
    *    the row's merge disposition: 'U'pdated, 'I'nserted, 'K'ept.
    *
    * `dataCols` + `key` + `opColumn` must cover the target's schema —
    * this operator rewrites whole rows.
    */
  def mergeInto(spark: SparkSession, target: String, sourceView: String,
      key: String, dataCols: Seq[String], opColumn: Option[String] = None,
      deleteCondition: Option[String] = None): Unit = {
    val targetCols = spark.table(target).columns
    val covered = (dataCols :+ key) ++ opColumn
    require(targetCols.toSet == covered.toSet,
      s"dataCols+key+opColumn ${covered.mkString(",")} must cover target " +
        s"schema ${targetCols.mkString(",")}")

    val stage = s"${target}_merge_stage"
    dropManaged(spark, stage) // leftover from a previous crashed merge
    val matched = s"t.`$key` IS NOT NULL AND s.`$key` IS NOT NULL"
    val outCols =
      Seq(s"coalesce(t.`$key`, s.`$key`) AS `$key`") ++
        dataCols.map(c =>
          s"CASE WHEN s.`$key` IS NOT NULL THEN s.`$c` ELSE t.`$c` END AS `$c`") ++
        opColumn.map(oc =>
          "CASE WHEN t.`" + key + "` IS NULL THEN 'I' " +
            s"WHEN s.`$key` IS NULL THEN 'K' ELSE 'U' END AS `$oc`")
    val deleteFilter = deleteCondition
      .fold("")(c => s"\nWHERE NOT ($matched AND ($c))")
    spark.sql(
      s"""CREATE TABLE `$stage` USING parquet AS
         |SELECT ${outCols.mkString(", ")}
         |FROM `$target` t FULL OUTER JOIN `$sourceView` s
         |  ON t.`$key` = s.`$key`$deleteFilter""".stripMargin)
    spark.sql(
      s"""INSERT OVERWRITE TABLE `$target`
         |SELECT ${targetCols.map(c => s"`$c`").mkString(", ")}
         |FROM `$stage`""".stripMargin)
    dropManaged(spark, stage)
  }
}
