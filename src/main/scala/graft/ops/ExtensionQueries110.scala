package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 extension queries, batch 110: string→structure scalar
  * completion (regexp_extract_all / str_to_map / sentences — the last
  * uncovered corner of the F-family) and the governed-view pattern
  * (column masking + row filtering in one catalog view — the
  * row/column security idiom warehouses ship as a feature, expressed
  * in plain Spark SQL).
  */
object ExtensionQueries110 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- F-12 / q135 string→structure scalars ----------------------------------------
  // regexp_extract_all (all vowel-runs of a part name), str_to_map
  // (parse a "k=v,k=v" properties string back into a map and read
  // keys), sentences() (locale-stable word segmentation). The oracle
  // re-derives each from the same source with DuckDB primitives —
  // the map/array types never cross the hash boundary, their DERIVED
  // scalars do.
  def q135Str3(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "part")
      .filter(col("p_partkey") <= 200)
      .select(col("p_partkey"), col("p_name"),
        concat(lit("key="), col("p_partkey"), lit(",name="), col("p_name"))
          .as("props"))
      .select(col("p_partkey"),
        size(expr("regexp_extract_all(p_name, '[aeiou]+', 0)"))
          .cast("long").as("n_vowel_runs"),
        // try_element_at: a vowel-free name yields NULL instead of an
        // ANSI out-of-bounds error (DuckDB's list[1] is NULL-on-empty)
        expr("try_element_at(regexp_extract_all(p_name, '[aeiou]+', 0), 1)")
          .as("first_vowel_run"),
        expr("str_to_map(props, ',', '=')['name']").as("name_from_map"),
        size(flatten(sentences(col("p_name")))).cast("long").as("n_words"))
      .orderBy("p_partkey")
  }

  // ---- S-24 / q136 governed view: column masking + row filter -----------------------
  // One TEMP VIEW enforces both halves of warehouse governance:
  // ROW-level security (only BUILDING-segment customers are visible)
  // and COLUMN masking (the balance is bucketed to hundreds, the name
  // reduced to its last 3 chars — enough to join/debug, not enough to
  // leak). Consumers query the view like the table; the contract is
  // what a masked consumer actually sees.
  def q136GovernedView(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("graft_gov_c")
    s.sql(
      """CREATE OR REPLACE TEMPORARY VIEW graft_gov_masked AS
        |SELECT c_custkey,
        |  CONCAT('***', SUBSTRING(c_name, -3, 3)) AS name_masked,
        |  CAST(FLOOR(c_acctbal / 100) * 100 AS BIGINT) AS bal_bucket,
        |  c_nationkey
        |FROM graft_gov_c
        |WHERE c_mktsegment = 'BUILDING'""".stripMargin)
    s.sql(
      """SELECT c_nationkey, COUNT(*) AS n_visible,
        |  SUM(bal_bucket) AS bucket_sum,
        |  MIN(name_masked) AS first_mask
        |FROM graft_gov_masked
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q135_str3" -> (q135Str3 _),
    "q136_governed_view" -> (q136GovernedView _))

  val oracleSql: Map[String, String] = Map(
    // F-12: DuckDB re-derivations of the same scalars.
    "q135_str3" ->
      """select p_partkey,
        |  cast(len(regexp_extract_all(p_name, '[aeiou]+')) as bigint)
        |    n_vowel_runs,
        |  regexp_extract_all(p_name, '[aeiou]+')[1] first_vowel_run,
        |  p_name name_from_map,
        |  cast(len(string_split(p_name, ' ')) as bigint) n_words
        |from part where p_partkey <= 200
        |order by p_partkey""".stripMargin,

    // S-24: the same masking/filtering algebra inline.
    "q136_governed_view" ->
      """select c_nationkey, count(*) n_visible,
        |  cast(sum(cast(floor(c_acctbal / 100) * 100 as bigint)) as bigint)
        |    bucket_sum,
        |  min('***' || substr(c_name, length(c_name) - 2, 3)) first_mask
        |from customer where c_mktsegment = 'BUILDING'
        |group by c_nationkey order by c_nationkey""".stripMargin)
}
