package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * B2: 5-way join, revenue by nation — exercises scans, broadcast +
    * shuffle joins, aggregation and sort in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.ContractQueries.b2(spark, "/root/testdata/sf0.001")

  /** Every batch's query map, kept as a list so the merge can be
    * collision-checked: Map ++ silently overwrites duplicate keys (a
    * round-7 bug shipped six shadowed operators that way), so
    * SurveyInventorySpec asserts queries.size == queryBatchSizeSum.
    */
  val queryBatches: Seq[Map[String, (SparkSession, String) => DataFrame]] =
    Seq(
      graft.queries.ContractQueries.all,
      graft.queries.ContractQueries2.all,
      graft.queries.ContractQueries3.all,
      graft.queries.ContractQueries4.all,
      graft.queries.ContractQueries5.all,
      graft.queries.ContractQueries6.all,
      graft.ops.ExtensionQueries.all,
      graft.ops.ExtensionQueries2.all,
      graft.ops.ExtensionQueries3.all,
      graft.ops.ExtensionQueries4.all,
      graft.ops.ExtensionQueries5.all,
      graft.ops.ExtensionQueries6.all,
      graft.ops.ExtensionQueries7.all,
      graft.ops.ExtensionQueries8.all,
      graft.ops.ExtensionQueries9.all,
      graft.ops.ExtensionQueries10.all,
      graft.ops.ExtensionQueries11.all,
      graft.ops.ExtensionQueries12.all,
      graft.ops.ExtensionQueries13.all,
      graft.ops.ExtensionQueries14.all,
      graft.ops.ExtensionQueries15.all,
      graft.ops.ExtensionQueries16.all,
      graft.ops.ExtensionQueries17.all,
      graft.ops.ExtensionQueries18.all,
      graft.ops.ExtensionQueries19.all,
      graft.ops.ExtensionQueries20.all,
      graft.ops.ExtensionQueries21.all,
      graft.ops.ExtensionQueries22.all,
      graft.ops.ExtensionQueries23.all,
      graft.ops.ExtensionQueries24.all,
      graft.ops.ExtensionQueries25.all,
      graft.ops.ExtensionQueries26.all,
      graft.ops.ExtensionQueries27.all,
      graft.ops.ExtensionQueries28.all,
      graft.ops.ExtensionQueries29.all,
      graft.ops.ExtensionQueries30.all,
      graft.ops.ExtensionQueries31.all,
      graft.ops.ExtensionQueries32.all,
      graft.ops.ExtensionQueries33.all,
      graft.ops.ExtensionQueries34.all,
      graft.ops.ExtensionQueries35.all,
      graft.ops.ExtensionQueries36.all,
      graft.ops.ExtensionQueries37.all,
      graft.ops.ExtensionQueries38.all,
      graft.ops.ExtensionQueries39.all,
      graft.ops.ExtensionQueries40.all,
      graft.ops.ExtensionQueries41.all,
      graft.ops.ExtensionQueries42.all,
      graft.ops.ExtensionQueries43.all,
      graft.ops.ExtensionQueries44.all,
      graft.ops.ExtensionQueries45.all,
      graft.ops.ExtensionQueries46.all,
      graft.ops.ExtensionQueries47.all,
      graft.ops.ExtensionQueries48.all,
      graft.ops.ExtensionQueries49.all,
      graft.ops.ExtensionQueries50.all,
      graft.ops.ExtensionQueries51.all,
      graft.ops.ExtensionQueries52.all,
      graft.ops.ExtensionQueries53.all,
      graft.ops.ExtensionQueries54.all,
      graft.ops.ExtensionQueries55.all,
      graft.ops.ExtensionQueries56.all,
      graft.ops.ExtensionQueries57.all,
      graft.ops.ExtensionQueries58.all,
      graft.ops.ExtensionQueries59.all,
      graft.ops.ExtensionQueries60.all,
      graft.ops.ExtensionQueries61.all,
      graft.ops.ExtensionQueries62.all,
      graft.ops.ExtensionQueries63.all,
      graft.ops.ExtensionQueries64.all,
      graft.ops.ExtensionQueries65.all,
      graft.ops.ExtensionQueries66.all,
      graft.ops.ExtensionQueries67.all,
      graft.ops.ExtensionQueries68.all,
      graft.ops.ExtensionQueries69.all,
      graft.ops.ExtensionQueries70.all,
      graft.ops.ExtensionQueries71.all,
      graft.ops.ExtensionQueries72.all,
      graft.ops.ExtensionQueries73.all,
      graft.ops.ExtensionQueries74.all,
      graft.ops.ExtensionQueries75.all,
      graft.ops.ExtensionQueries76.all,
      graft.ops.ExtensionQueries77.all,
      graft.ops.ExtensionQueries78.all,
      graft.ops.ExtensionQueries79.all)

  val queryBatchSizeSum: Int = queryBatches.map(_.size).sum

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queryBatches.reduce(_ ++ _)

  val oracleBatches: Seq[Map[String, String]] =
    Seq(
      graft.queries.OracleSql.all,
      graft.queries.OracleSql2.all,
      graft.queries.OracleSql3.all,
      graft.queries.OracleSql4.all,
      graft.queries.OracleSql5.all,
      graft.queries.ContractQueries6.oracleSql,
      graft.ops.ExtensionQueries.oracleSql,
      graft.ops.ExtensionQueries2.oracleSql,
      graft.ops.ExtensionQueries3.oracleSql,
      graft.ops.ExtensionQueries4.oracleSql,
      graft.ops.ExtensionQueries5.oracleSql,
      graft.ops.ExtensionQueries6.oracleSql,
      graft.ops.ExtensionQueries7.oracleSql,
      graft.ops.ExtensionQueries8.oracleSql,
      graft.ops.ExtensionQueries9.oracleSql,
      graft.ops.ExtensionQueries10.oracleSql,
      graft.ops.ExtensionQueries11.oracleSql,
      graft.ops.ExtensionQueries12.oracleSql,
      graft.ops.ExtensionQueries13.oracleSql,
      graft.ops.ExtensionQueries14.oracleSql,
      graft.ops.ExtensionQueries15.oracleSql,
      graft.ops.ExtensionQueries16.oracleSql,
      graft.ops.ExtensionQueries17.oracleSql,
      graft.ops.ExtensionQueries18.oracleSql,
      graft.ops.ExtensionQueries19.oracleSql,
      graft.ops.ExtensionQueries20.oracleSql,
      graft.ops.ExtensionQueries21.oracleSql,
      graft.ops.ExtensionQueries22.oracleSql,
      graft.ops.ExtensionQueries23.oracleSql,
      graft.ops.ExtensionQueries24.oracleSql,
      graft.ops.ExtensionQueries25.oracleSql,
      graft.ops.ExtensionQueries26.oracleSql,
      graft.ops.ExtensionQueries27.oracleSql,
      graft.ops.ExtensionQueries28.oracleSql,
      graft.ops.ExtensionQueries29.oracleSql,
      graft.ops.ExtensionQueries30.oracleSql,
      graft.ops.ExtensionQueries31.oracleSql,
      graft.ops.ExtensionQueries32.oracleSql,
      graft.ops.ExtensionQueries33.oracleSql,
      graft.ops.ExtensionQueries34.oracleSql,
      graft.ops.ExtensionQueries35.oracleSql,
      graft.ops.ExtensionQueries36.oracleSql,
      graft.ops.ExtensionQueries37.oracleSql,
      graft.ops.ExtensionQueries38.oracleSql,
      graft.ops.ExtensionQueries39.oracleSql,
      graft.ops.ExtensionQueries40.oracleSql,
      graft.ops.ExtensionQueries41.oracleSql,
      graft.ops.ExtensionQueries42.oracleSql,
      graft.ops.ExtensionQueries43.oracleSql,
      graft.ops.ExtensionQueries44.oracleSql,
      graft.ops.ExtensionQueries45.oracleSql,
      graft.ops.ExtensionQueries46.oracleSql,
      graft.ops.ExtensionQueries47.oracleSql,
      graft.ops.ExtensionQueries48.oracleSql,
      graft.ops.ExtensionQueries49.oracleSql,
      graft.ops.ExtensionQueries50.oracleSql,
      graft.ops.ExtensionQueries51.oracleSql,
      graft.ops.ExtensionQueries52.oracleSql,
      graft.ops.ExtensionQueries53.oracleSql,
      graft.ops.ExtensionQueries54.oracleSql,
      graft.ops.ExtensionQueries55.oracleSql,
      graft.ops.ExtensionQueries56.oracleSql,
      graft.ops.ExtensionQueries57.oracleSql,
      graft.ops.ExtensionQueries58.oracleSql,
      graft.ops.ExtensionQueries59.oracleSql,
      graft.ops.ExtensionQueries60.oracleSql,
      graft.ops.ExtensionQueries61.oracleSql,
      graft.ops.ExtensionQueries62.oracleSql,
      graft.ops.ExtensionQueries63.oracleSql,
      graft.ops.ExtensionQueries64.oracleSql,
      graft.ops.ExtensionQueries65.oracleSql,
      graft.ops.ExtensionQueries66.oracleSql,
      graft.ops.ExtensionQueries67.oracleSql,
      graft.ops.ExtensionQueries68.oracleSql,
      graft.ops.ExtensionQueries69.oracleSql,
      graft.ops.ExtensionQueries70.oracleSql,
      graft.ops.ExtensionQueries71.oracleSql,
      graft.ops.ExtensionQueries72.oracleSql,
      graft.ops.ExtensionQueries73.oracleSql,
      graft.ops.ExtensionQueries74.oracleSql,
      graft.ops.ExtensionQueries75.oracleSql,
      graft.ops.ExtensionQueries76.oracleSql,
      graft.ops.ExtensionQueries77.oracleSql,
      graft.ops.ExtensionQueries78.oracleSql,
      graft.ops.ExtensionQueries79.oracleSql)

  val oracleBatchSizeSum: Int = oracleBatches.map(_.size).sum

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    oracleBatches.reduce(_ ++ _)
}
