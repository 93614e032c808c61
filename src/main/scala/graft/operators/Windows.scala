package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions (SURVEY.md §2.5): ranking, lag/lead, moving frames —
  * plus per-group top-k (ranking + cutoff), the idiomatic Spark shape for
  * "top N per key".
  *
  * Scale notes: every window here partitions by a bounded-cardinality,
  * uniformly-distributed key (`nation`, `user_id`), so the plan is one hash
  * shuffle on the partition key followed by a per-partition sort — no global
  * sort, no skew. Per-group top-k via `row_number <= k` filters immediately
  * after ranking, so nothing row-proportional survives the window stage.
  * The final `orderBy` sorts only the already-reduced output.
  */
object Windows extends QueryModule {

  /** row_number / rank / dense_rank; top-3 customers by balance per nation. */
  def topkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables(spark, dir, "customer")
      .select(col("c_nationkey").as("nationkey"), col("c_custkey").as("custkey"),
        round(col("c_acctbal"), 2).as("acctbal"),
        row_number().over(w).as("rn"), rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"))
      .filter(col("rn") <= 3)
      .orderBy(col("nationkey"), col("rn"))
  }

  /** lag/lead per user over the event timeline. */
  def lagLead(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables(spark, dir, "events")
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"),
        round(col("value") - lag(col("value"), 1).over(w), 4).as("value_delta"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Moving average over a 4-row frame (3 preceding + current) per user. */
  def movingAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-3, 0)
    Tables(spark, dir, "events")
      .filter(col("user_id") < 10)
      .select(col("user_id"), col("event_id"),
        round(avg(col("value")).over(w), 4).as("moving_avg"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** ntile / percent_rank / cume_dist / first+last value over a frame. */
  def windowExtras(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value"), col("event_id"))
    val frame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables(spark, dir, "events")
      .filter(col("user_id") < 10)
      .select(col("user_id"), col("event_id"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        round(first(col("value")).over(frame), 4).as("min_val"),
        round(last(col("value")).over(frame), 4).as("max_val"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** RANGE frame (value-based, vs q27's ROWS frame): rolling 10-minute
    * sum/count per metric — the frame holds every sample whose event time
    * falls in the preceding 600 s, however many rows that is, and peers
    * (equal order values) always share one frame. The distinction matters
    * at scale: a ROWS frame bounds state by row count; a RANGE frame by
    * the order-column span, which is what time-windowed monitoring
    * semantics actually specify. */
  def rangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("name")).orderBy(col("tus"))
      .rangeBetween(-600000000L, Window.currentRow)
    Tables(spark, dir, "events")
      .filter(col("value").isNotNull && col("user_id") < 20)
      .select(col("event_type").as("name"), unix_micros(col("ts")).as("tus"),
        col("value"))
      .select(col("name"), col("tus"),
        round(sum(col("value")).over(w), 2).as("sum_10m"),
        count(lit(1)).over(w).as("n_10m"))
      .orderBy(col("name"), col("tus"))
      .limit(300)
  }

  val queries: Map[String, QueryFn] = Map(
    "q25_window_topk_per_group" -> topkPerGroup _,
    "q26_window_lag_lead" -> lagLead _,
    "q27_window_moving_avg" -> movingAvg _,
    "q55_window_extras" -> windowExtras _,
    "q85_window_range_frame" -> rangeFrame _
  )

  val oracleSql: Map[String, String] = Map(
    "q25_window_topk_per_group" ->
      """SELECT nationkey, custkey, acctbal, CAST(rn AS INT) AS rn,
        |       CAST(rnk AS INT) AS rnk, CAST(drnk AS INT) AS drnk FROM (
        |  SELECT c_nationkey AS nationkey, c_custkey AS custkey,
        |         round(c_acctbal, 2) AS acctbal,
        |         row_number() OVER w AS rn, rank() OVER w AS rnk,
        |         dense_rank() OVER w AS drnk
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_nationkey
        |               ORDER BY c_acctbal DESC, c_custkey))
        |WHERE rn <= 3 ORDER BY nationkey, rn""".stripMargin,
    "q26_window_lag_lead" ->
      """SELECT user_id, event_id,
        |       round(value - lag(value, 1) OVER w, 4) AS value_delta,
        |       lead(event_type, 1) OVER w AS next_type
        |FROM events WHERE user_id < 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "q27_window_moving_avg" ->
      """SELECT user_id, event_id,
        |       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4)
        |         AS moving_avg
        |FROM events WHERE user_id < 10
        |ORDER BY user_id, event_id""".stripMargin,
    "q55_window_extras" ->
      """SELECT user_id, event_id,
        |       CAST(ntile(4) OVER w AS INT) AS quartile,
        |       round(percent_rank() OVER w, 6) AS pct_rank,
        |       round(cume_dist() OVER w, 6) AS cume,
        |       round(first_value(value) OVER wf, 4) AS min_val,
        |       round(last_value(value) OVER wf, 4) AS max_val
        |FROM events WHERE user_id < 10
        |WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id),
        |       wf AS (PARTITION BY user_id ORDER BY value, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, event_id""".stripMargin,
    "q85_window_range_frame" ->
      """WITH s AS (
        |  SELECT event_type AS name, epoch_us(ts) AS tus, value
        |  FROM events WHERE value IS NOT NULL AND user_id < 20)
        |SELECT name, tus,
        |       round(sum(value) OVER (PARTITION BY name ORDER BY tus
        |             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW), 2) AS sum_10m,
        |       CAST(count(*) OVER (PARTITION BY name ORDER BY tus
        |             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_10m
        |FROM s ORDER BY name, tus LIMIT 300""".stripMargin
  )
}
