package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** THE canonical record→operator adapter for the streaming analytics layer:
  * one identity rule shared by every `transformWithState` operator, keyed on
  * the FULL sorted label set — the reference's own series identity (its
  * record is the whole label map, `/root/reference/record.go:8-14`; two
  * series differing in ANY label are distinct, and label-map iteration
  * order is irrelevant).
  *
  * Identity: `series_id = xxhash64(sorted label entries)`. The hash runs
  * over the sorted `array<struct<key,value>>` itself — no string encoding
  * step, so a `,` or `=` inside a label value cannot collide two distinct
  * label sets. 64-bit hash collisions across even 10^9 active series are
  * ~3 % birthday-bound per the usual 2^-64 math — and any consumer needing
  * certainty carries [[seriesString]] alongside, which is injective up to
  * quoting. The metric name rides separately (it is also inside the hash
  * via `__name__`), giving the operators their (name, id) key with
  * human-readable grouping intact.
  *
  * Scale: both columns are narrow per-row expressions (sort of a ≤30-entry
  * array, one hash) inside whole-stage codegen — the adapter adds ZERO
  * shuffles; the only exchange in an adapted pipeline remains the state-key
  * partitioning (asserted by `StreamingRateSpec`'s plan-shape test and
  * `RelayAnalyticsSpec`).
  *
  * [[StreamingRate.fromRelay]] remains as the single-numeric-label
  * convenience form (events-style data where `user` IS the identity);
  * this adapter is the production default.
  */
object RelayAnalytics {

  /** Label entries in canonical (key-sorted) order. */
  private def sortedEntries(labels: Column): Column = array_sort(map_entries(labels))

  /** 64-bit series identity over the full sorted label set. */
  def seriesId(labels: Column): Column = xxhash64(sortedEntries(labels))

  /** 64-bit MATCHING key: the sorted label set EXCLUDING `__name__` —
    * promql's default binary-op vector matching ("labels must be equal,
    * ignoring the metric name", promql/engine.go resultMetric). Two
    * metrics over the same underlying series (same job/instance/…) hash
    * equal here while [[seriesId]] keeps them distinct. */
  def matchKey(labels: Column): Column =
    xxhash64(array_sort(map_entries(
      map_filter(labels, (k, _) => k =!= "__name__"))))

  /** Human-readable canonical series: `{k="v",k2="v2"}` with keys sorted —
    * the PromQL notation, stable across label-map orderings. */
  def seriesString(labels: Column): Column =
    concat(lit("{"),
      array_join(
        transform(sortedEntries(labels),
          e => concat(e.getField("key"), lit("=\""), e.getField("value"), lit("\""))),
        ","),
      lit("}"))

  /** Canonical records (`RemoteWrite.fromBodies` schema: name, time ms,
    * value, labels) → [[CounterSample]] rows for [[StreamingRate]],
    * [[StreamingRangeRate]] and [[StreamingStaleness]], keyed (name,
    * series_id). Null values (empty series / NaN, §2.2) carry no sample
    * information and are dropped; nothing else is dropped or merged. */
  def counterSamples(records: DataFrame): Dataset[CounterSample] = {
    import records.sparkSession.implicits._
    records.filter(col("value").isNotNull)
      .select(col("name"),
        seriesId(col("labels")).as("user_id"),
        (col("time") * lit(1000L)).as("tsUs"),
        col("value"))
      .as[CounterSample]
  }

  /** Like [[counterSamples]] but keyed on [[matchKey]] — for operators
    * that MATCH series across metrics ([[StreamingVectorRatio]]): the
    * name rides in `name`, the identity deliberately excludes it. */
  def matchSamples(records: DataFrame): Dataset[CounterSample] = {
    import records.sparkSession.implicits._
    records.filter(col("value").isNotNull)
      .select(col("name"),
        matchKey(col("labels")).as("user_id"),
        (col("time") * lit(1000L)).as("tsUs"),
        col("value"))
      .as[CounterSample]
  }

  /** Canonical records → [[ChangeRow]] rows for [[StreamingCompact]]:
    * the series id is the entity key, the metric name the state label, and
    * the sample time serves as both version coordinate and tie-break
    * (relay samples carry no sequence number) — "current value per
    * series", the materialized instant-vector view. */
  def changeRows(records: DataFrame): Dataset[ChangeRow] = {
    import records.sparkSession.implicits._
    records.filter(col("value").isNotNull)
      .select(seriesId(col("labels")).as("user_id"),
        (col("time") * lit(1000L)).as("event_id"),
        col("name").as("event_type"),
        col("value"),
        (col("time") * lit(1000L)).as("tsUs"))
      .as[ChangeRow]
  }

  /** Canonical records → [[BucketSample]] rows for [[StreamingDownsample]]:
    * each sample routes to its metric's 6 h retention bucket; the sample
    * time doubles as the event id (relay samples carry no sequence
    * number), so the open/close total order is (time, time) — plain
    * event-time order with a stable tie. */
  def bucketSamples(records: DataFrame): Dataset[BucketSample] = {
    import records.sparkSession.implicits._
    records.filter(col("value").isNotNull && col("time").isNotNull)
      .select(col("name").as("event_type"),
        ((col("time") * lit(1000L)) - pmod(col("time") * lit(1000L),
          lit(21600000000L))).as("bucketUs"),
        (col("time") * lit(1000L)).as("event_id"),
        (col("time") * lit(1000L)).as("tsUs"),
        col("value"))
      .as[BucketSample]
  }

  /** Canonical records → [[ActivityRow]] rows for [[StreamingActiveUsers]]:
    * each sample marks its SERIES active at its timestamp, so the day
    * panes estimate daily/weekly/monthly ACTIVE SERIES — the cardinality
    * monitoring every Prometheus operator eventually needs, at O(k) state
    * per day no matter how many series churn. */
  def seriesActivity(records: DataFrame): Dataset[ActivityRow] = {
    import records.sparkSession.implicits._
    records.filter(col("time").isNotNull)
      .select(seriesId(col("labels")).as("user_id"),
        (col("time") * lit(1000L)).as("tsUs"))
      .as[ActivityRow]
  }

  /** Canonical records → [[GroupTick]] rows for the day-granular change
    * monitors ([[StreamingTrend]]): group = metric name — "is this
    * metric's daily volume trending?", the per-metric twin of batch
    * q178's per-event-type fit. */
  def groupTicks(records: DataFrame): Dataset[GroupTick] = {
    import records.sparkSession.implicits._
    records.filter(col("time").isNotNull)
      .select(col("name").as("group"), (col("time") * lit(1000L)).as("tsUs"))
      .as[GroupTick]
  }

  /** Canonical records → [[ValueTick]] rows for [[StreamingDrift]]:
    * group = metric name, value in integer CENTS (the q187/q143 exact-
    * integer rule) — "has this metric's value distribution moved since
    * its reference day", the per-metric sibling of the batch drift
    * reports. */
  def valueTicks(records: DataFrame): Dataset[ValueTick] = {
    import records.sparkSession.implicits._
    records.filter(col("time").isNotNull && col("value").isNotNull)
      .select(col("name").as("group"), (col("time") * lit(1000L)).as("tsUs"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .as[ValueTick]
  }

  /** Canonical records → [[TokenEvent]] rows for
    * [[StreamingHeavyHitters]]: group = metric name, token = the canonical
    * series string — "which label sets dominate this metric", the
    * cardinality-explosion monitor. Includes zero-sample series rows (a
    * series that reports with no samples still exists); one token per
    * record row. */
  def tokenEvents(records: DataFrame): Dataset[TokenEvent] = {
    import records.sparkSession.implicits._
    records.select(col("name").as("group"),
      seriesString(col("labels")).as("token"))
      .as[TokenEvent]
  }
}
