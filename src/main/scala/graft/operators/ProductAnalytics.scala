package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics operators over the event stream (SURVEY.md §2.5 [ext]):
  * ordered funnel conversion, cohort retention, and gaps-and-islands
  * sessionization — the three queries every event-analytics engine (Amplitude
  * / Mixpanel / GA-class) is ultimately built around, and the natural
  * consumers of the relay's flattened sample rows (remote_write.go:70-90
  * produces exactly this row shape; these are the queries you point at it).
  *
  * Scale notes: all three plans shuffle exactly once, on `user_id` — the
  * partitioning a user-keyed event store would already be bucketed by.
  * The funnel chains three unbounded windows over ONE hash exchange (no
  * self-joins: the textbook funnel is a 3-way self-join that explodes at
  * scale); retention joins per-user cohorts to per-user activity on the
  * shared key and broadcasts the ≤O(days) cohort-size side; sessionization
  * is lag + running-sum over the same per-user sort. Nothing materializes
  * per-pair or per-(user × step) intermediates, so the shapes survive a
  * 1000-executor fan-out unchanged: events hash to their user's partition
  * and every subsequent operator is partition-local.
  */
object ProductAnalytics extends QueryModule {

  /** Ordered funnel view → click → purchase, completion within 7 days of the
    * first view. Step semantics match the product-analytics standard: each
    * step's timestamp is the EARLIEST qualifying event STRICTLY AFTER the
    * previous step (min-over-threshold, not adjacency), so one pass over the
    * per-user partition suffices. Three chained window aggregates share one
    * hash exchange on user_id; the per-user frame then collapses to step
    * counts and a 3-row conversion table via a single explode.
    */
  /** Per-user funnel frame: (user_id, t1, t2, t3) with nulls for unreached
    * steps — the batch truth [[graft.streaming.StreamingFunnel]] must agree
    * with on in-order input. One shuffle: the window and the groupBy share
    * the user_id hash partitioning. */
  def funnelPerUser(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val perRow = events
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t1", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "click" &&
        col("ts") > col("t1"), col("ts"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" &&
        col("ts") > col("t2") &&
        col("ts") <= col("t1") + expr("INTERVAL 7 DAYS"), col("ts"))).over(w))
    // groupBy(user_id) reuses the window's hash partitioning — no 2nd shuffle
    perRow.groupBy(col("user_id"))
      .agg(first(col("t1")).as("t1"), first(col("t2")).as("t2"),
        first(col("t3")).as("t3"))
  }

  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val perUser = funnelPerUser(Tables(spark, dir, "events"))
    val counts = perUser.agg(count(col("t1")).as("n1"),
      count(col("t2")).as("n2"), count(col("t3")).as("n3"))
    counts
      .select(explode(array(
        struct(lit(1).as("step"), lit("view").as("event_type"),
          col("n1").as("n_users")),
        struct(lit(2).as("step"), lit("click").as("event_type"),
          col("n2").as("n_users")),
        struct(lit(3).as("step"), lit("purchase").as("event_type"),
          col("n3").as("n_users")))).as("s"), col("n1"))
      .select(col("s.step").as("step"), col("s.event_type").as("event_type"),
        col("s.n_users").as("n_users"),
        round(col("s.n_users").cast("double") / col("n1"), 4).as("conversion"))
      .orderBy(col("step"))
  }

  /** Daily cohort retention: cohort = calendar day of the user's first
    * `signup`, activity = distinct (user, day) over ALL events, cell =
    * distinct active users at each day offset ≥ 0 plus the cohort's
    * retention ratio. The cohort-size side is ≤ one row per calendar day —
    * broadcast by construction, never a shuffle partner.
    */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val cohort = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_day"))
    val activity = e.select(col("user_id"), to_date(col("ts")).as("active_day"))
      .distinct()
    val sizes = cohort.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("cohort_users"))
    activity.join(cohort, "user_id")
      .withColumn("day_offset", datediff(col("active_day"), col("cohort_day")).cast("long"))
      .filter(col("day_offset") >= 0)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .join(broadcast(sizes), "cohort_day")
      .select(col("cohort_day"), col("day_offset"), col("n_active"),
        col("cohort_users"),
        round(col("n_active").cast("double") / col("cohort_users"), 4).as("retention"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Gaps-and-islands sessionization (30-minute inactivity gap) with
    * per-user session statistics — the lag + running-sum formulation that
    * complements q32's built-in `session_window` (which emits the sessions
    * themselves; this emits what a dashboard wants: sessions per user,
    * events per session, longest session, total value). Session spans are
    * integer micros floored to seconds so the cross-engine compare is exact.
    */
  def sessionStats(spark: SparkSession, dir: String): DataFrame = {
    val byTs = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val marked = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("us"))
      .withColumn("new_s", when(col("us") - lag(col("us"), 1).over(byTs) <
        lit(30L * 60 * 1000000), lit(0L)).otherwise(lit(1L)))
      .withColumn("sid", sum(col("new_s")).over(
        byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val perSession = marked.groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"),
        floor((max(col("us")) - min(col("us"))) / lit(1000000L)).as("span_sec"),
        sum(col("value")).as("value_sum"))
    perSession.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("span_sec")).as("max_span_sec"),
        round(sum(col("value_sum")), 2).as("sum_value"))
      .withColumn("avg_events",
        round(col("n_events").cast("double") / col("n_sessions"), 4))
      .select(col("user_id"), col("n_sessions"), col("n_events"),
        col("avg_events"), col("max_span_sec"), col("sum_value"))
      .orderBy(col("user_id"))
  }

  val queries: Map[String, QueryFn] = Map(
    "q121_funnel_conversion" -> funnel _,
    "q122_retention_cohorts" -> retention _,
    "q123_session_stats" -> sessionStats _
  )

  val oracleSql: Map[String, String] = Map(
    "q121_funnel_conversion" ->
      """WITH pu AS (
        |  SELECT user_id, min(ts) FILTER (WHERE event_type = 'view') AS t1
        |  FROM events GROUP BY 1),
        |p2 AS (
        |  SELECT e.user_id, pu.t1, min(e.ts) AS t2
        |  FROM events e JOIN pu ON e.user_id = pu.user_id
        |  WHERE e.event_type = 'click' AND pu.t1 IS NOT NULL AND e.ts > pu.t1
        |  GROUP BY 1, 2),
        |p3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN p2 ON e.user_id = p2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > p2.t2
        |    AND e.ts <= p2.t1 + INTERVAL 7 DAY
        |  GROUP BY 1),
        |n AS (SELECT (SELECT count(t1) FROM pu) AS n1,
        |             (SELECT count(*) FROM p2) AS n2,
        |             (SELECT count(*) FROM p3) AS n3)
        |SELECT 1 AS step, 'view' AS event_type, n1 AS n_users,
        |       round(CAST(n1 AS DOUBLE) / n1, 4) AS conversion FROM n
        |UNION ALL SELECT 2, 'click', n2, round(CAST(n2 AS DOUBLE) / n1, 4) FROM n
        |UNION ALL SELECT 3, 'purchase', n3, round(CAST(n3 AS DOUBLE) / n1, 4) FROM n
        |ORDER BY 1""".stripMargin,
    "q122_retention_cohorts" ->
      """WITH cohort AS (
        |  SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM events),
        |sizes AS (SELECT cohort_day, count(*) AS cohort_users FROM cohort GROUP BY 1),
        |r AS (
        |  SELECT c.cohort_day,
        |         CAST(a.active_day - c.cohort_day AS BIGINT) AS day_offset,
        |         count(DISTINCT a.user_id) AS n_active
        |  FROM act a JOIN cohort c USING (user_id)
        |  WHERE a.active_day >= c.cohort_day GROUP BY 1, 2)
        |SELECT r.cohort_day, r.day_offset, r.n_active, s.cohort_users,
        |       round(CAST(r.n_active AS DOUBLE) / s.cohort_users, 4) AS retention
        |FROM r JOIN sizes s USING (cohort_day) ORDER BY 1, 2""".stripMargin,
    "q123_session_stats" ->
      """WITH o AS (
        |  SELECT user_id, event_id, value, epoch_us(ts) AS us,
        |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
        |                OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              < 30 * 60 * 1000000 THEN 0 ELSE 1 END AS new_s
        |  FROM events),
        |s AS (
        |  SELECT user_id, value, us,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o),
        |ps AS (
        |  SELECT user_id, sid, count(*) AS n_events,
        |         CAST(floor((max(us) - min(us)) / 1000000) AS BIGINT) AS span_sec,
        |         sum(value) AS value_sum
        |  FROM s GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions, sum(n_events) AS n_events,
        |       round(CAST(sum(n_events) AS DOUBLE) / count(*), 4) AS avg_events,
        |       max(span_sec) AS max_span_sec,
        |       round(sum(value_sum), 2) AS sum_value
        |FROM ps GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
