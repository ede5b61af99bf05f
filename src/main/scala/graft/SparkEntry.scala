package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Analytics, Parity, TrainingData}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a matching DuckDB oracle in `oracleSql`
  * unless the operator is not SQL-expressible (those get the driver's
  * weaker rows-only check). Column names/aliases are identical on both
  * sides — the driver sorts columns by name before hashing values.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star-join rollup: revenue by region/nation (Pattern D denormalize
    * feeding an aggregate).
    */
  def entry(spark: SparkSession): DataFrame =
    Analytics.regionRevenueQ(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Parity.queries ++ Analytics.queries ++ TrainingData.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Parity.oracles ++ Analytics.oracles ++ TrainingData.oracles
}
