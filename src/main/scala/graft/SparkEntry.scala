package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def modules: Seq[QueryModule] = Seq(
    operators.EventAnalytics,
    operators.RelayRoundtrip,
    operators.Joins,
    operators.Aggregates,
    operators.Windows,
    operators.SetOpsSort,
    operators.ScalarFns,
    operators.StreamingBatch,
    operators.Dedup,
    operators.Similarity,
    operators.TextStats,
    operators.Multimodal,
    operators.Pipeline,
    operators.ProductAnalytics,
    operators.WarehouseOps,
    operators.Experiments
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.EventAnalytics.hourlyRollup(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracleSql).toMap
}
