package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Analytics over the `events` table — the stand-in for the reference's
  * output stream: entity + time + value + dynamic JSON payload mirrors the
  * relay row `{name, time, value, labels}` (`/root/reference/record.go:8-13`).
  *
  * The flagship (`q00_flagship_hourly`) is the query the reference's README
  * implies its downstream consumers run ("receive any metrics from stream",
  * `/root/reference/README.rst:6`): time-bucketed per-metric rollups with a
  * dynamic-payload extraction — scan → JSON scalar → time bucket → hash agg.
  *
  * Scale notes: the aggregate is a partial (map-side) hash agg followed by a
  * single shuffle on (hour, event_type) — cardinality is tiny relative to
  * input, so the shuffle moves only the combined partials. Pattern holds at
  * 100 TB: no row-count-proportional shuffle.
  */
object EventAnalytics extends QueryModule {

  /** Tumbling 1h window per event_type: count, sum(value), avg of JSON k. */
  def hourlyRollup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    ev.select(
        date_trunc("hour", col("ts")).as("hour"),
        col("event_type"),
        col("value"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"),
        round(avg(col("k")), 4).as("avg_k"))
      .orderBy(col("hour"), col("event_type"))
  }

  /** Dedicated filter + projection + column arithmetic (SURVEY §2.2 [ext]
    * predicate row): the filters and the two projected columns are all that
    * reach the parquet scan (PushedFilters + pruned ReadSchema). */
  def filterProject(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(expr("l_shipdate >= TIMESTAMP '2000-01-01'") &&
        expr("l_shipdate < TIMESTAMP '2000-02-01'") &&
        col("l_discount") > 0.05 && col("l_quantity") < 25)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax")), 2).as("charge"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val queries: Map[String, QueryFn] = Map(
    "q00_flagship_hourly" -> hourlyRollup _,
    "q01_filter_project" -> filterProject _
  )

  val oracleSql: Map[String, String] = Map(
    "q00_flagship_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |       count(*) AS n_events,
        |       round(sum(value), 2) AS sum_value,
        |       round(avg(CAST(props->>'k' AS INT)), 4) AS avg_k
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q01_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |       round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax), 2) AS charge
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2000-01-01'
        |  AND l_shipdate < TIMESTAMP '2000-02-01'
        |  AND l_discount > 0.05 AND l_quantity < 25
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
