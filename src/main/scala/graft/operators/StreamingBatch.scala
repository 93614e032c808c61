package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming-semantics operators verified in batch mode (SURVEY.md §2.5):
  * `window()` tumbling + sliding, `session_window()`, `dropDuplicates`, and
  * a watermark-style late-data cutoff. Spark defines these identically over
  * batch and streaming inputs, which is what makes them oracle-checkable;
  * the genuinely streaming-only behaviors (trigger cadence, state eviction,
  * late-row drop mid-stream) are covered by `StreamingSemanticsSpec` over a
  * `MemoryStream`.
  *
  * Scale notes: time-window grouping keys are derived per-row (no shuffle to
  * assign windows); the aggregate shuffles combined partials keyed on
  * (window, type) — bounded cardinality. `session_window` shuffles on
  * user_id then sessionizes per key in-memory, the same shape Spark uses for
  * `flatMapGroupsWithState`; uniform user activity ⇒ no skew.
  */
object StreamingBatch extends QueryModule {

  /** Tumbling 15-minute windows over events. */
  def tumbling(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** Sliding windows: 30-minute length, 15-minute slide (2 windows/event). */
  def sliding(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "30 minutes", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("n"), col("sum_value"))
      .orderBy(col("window_start"))

  /** Session windows with a 30-minute inactivity gap, per user. */
  def sessions(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))
      .orderBy(col("user_id"), col("session_start"))

  /** q170 — OHLC downsampling: per (event_type, 6 h bucket) keep
    * open/high/low/close/count — the long-term-retention compaction every
    * metrics store (Thanos/M3-style) runs on aged raw samples, and the
    * natural batch floor under the relay's sample stream. open/close are
    * `min_by`/`max_by` on the (ts, event_id) struct — ORDER-INSENSITIVE
    * aggregates with a total tie-break, so the result is partitioning-
    * independent (the q139 compaction rule applied at bucket granularity);
    * all five outputs are raw input values or counts — nothing computed,
    * nothing for an engine hash to wobble on. One map-side-combined
    * shuffle keyed (bucket, type): the downsample's output cardinality,
    * not the raw stream's. */
  def downsampleOhlc(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("n"))
      .select(col("w.start").as("bucket_start"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"), col("n"))
      .orderBy(col("bucket_start"), col("event_type"))

  /** dropDuplicates — duplicates manufactured via self-union so the dedup
    * provably removes rows (source rows are unique). */
  def dropDups(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables(spark, dir, "events").select(col("user_id"), col("event_type"))
    pairs.unionAll(pairs)
      .dropDuplicates(Seq("user_id", "event_type"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** Watermark-style late-data cutoff as a batch analogue: keep only rows
    * within 24h of the max event time (what a `withWatermark("ts", "24
    * hours")` stream would still accept at end-of-input). */
  def watermarkCutoff(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val mx = e.agg(max(col("ts")).as("max_ts"))
    e.crossJoin(broadcast(mx))
      .filter(col("ts") >= col("max_ts") - expr("INTERVAL 24 HOURS"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_on_time"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, QueryFn] = Map(
    "q30_stream_tumbling" -> tumbling _,
    "q170_downsample_ohlc" -> downsampleOhlc _,
    "q31_stream_sliding" -> sliding _,
    "q32_stream_sessions" -> sessions _,
    "q33_stream_dedup" -> dropDups _,
    "q34_stream_watermark" -> watermarkCutoff _
  )

  val oracleSql: Map[String, String] = Map(
    // open/close via rank-1 rows under the same (ts, event_id) total order
    "q170_downsample_ohlc" ->
      """WITH b AS (
        |  SELECT make_timestamp((epoch_us(ts) // 21600000000) * 21600000000) AS bs,
        |         event_type, value, ts, event_id
        |  FROM events),
        |r AS (SELECT *,
        |        row_number() OVER (PARTITION BY bs, event_type
        |          ORDER BY ts, event_id) AS rn_a,
        |        row_number() OVER (PARTITION BY bs, event_type
        |          ORDER BY ts DESC, event_id DESC) AS rn_d
        |      FROM b)
        |SELECT bs AS bucket_start, event_type,
        |       max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |       max(value) AS high, min(value) AS low,
        |       max(CASE WHEN rn_d = 1 THEN value END) AS close,
        |       count(*) AS n
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q30_stream_tumbling" ->
      """SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS window_start,
        |       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q31_stream_sliding" ->
      """WITH b AS (
        |  SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS b1, value
        |  FROM events),
        |w AS (SELECT b1 AS ws, value FROM b
        |      UNION ALL
        |      SELECT b1 - INTERVAL 15 MINUTE, value FROM b)
        |SELECT ws AS window_start, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    "q32_stream_sessions" ->
      """WITH o AS (
        |  SELECT user_id, ts,
        |         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                   IS NULL
        |               OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                   >= INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS session_start,
        |       CAST(max(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
        |       count(*) AS n_events
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,
    "q33_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM
        |  (SELECT user_id, event_type FROM events
        |   UNION ALL SELECT user_id, event_type FROM events)
        |ORDER BY 1, 2""".stripMargin,
    "q34_stream_watermark" ->
      """SELECT event_type, count(*) AS n_on_time, round(sum(value), 2) AS sum_value
        |FROM events
        |WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 24 HOUR
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
