package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** LLM-data-pipeline extension queries (dedup, similarity, text analysis)
  * registered alongside the SURVEY Appendix-A contract. Filled in as the
  * corresponding operators land (M4/M5).
  */
object ExtensionQueries {
  val all: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracleSql: Map[String, String] = Map()
}
