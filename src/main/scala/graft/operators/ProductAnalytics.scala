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

  /** q184 — COHORT LTV CURVE: cumulative purchase revenue per signup
    * cohort by day offset — the money twin of q122's retention matrix
    * (retention answers "do they come back?", this answers "what are
    * they worth by day N?" — the payback-period curve growth teams
    * steer spend by). Same plan skeleton as q122 deliberately: per-user
    * cohort day (one signup aggregate), revenue joined on the SHARED
    * user_id key, offset ≥ 0, then integer-cent sums per (cohort,
    * offset) and a running cumulative window over the per-cohort offset
    * rows (≤ horizon — a reduced aggregate, per the family rule). The
    * per-user average divides by the BROADCAST cohort size at the end;
    * every emitted double is one division on exact integer cents. */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val cohort = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_day"))
    val sizes = cohort.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("cohort_users"))
    val rev = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .join(cohort, "user_id")
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")).cast("long"))
      .filter(col("day_offset") >= 0)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(sum(col("cents")).as("rev_cents"), count(lit(1)).as("n_purchases"))
    val cum = Window.partitionBy(col("cohort_day")).orderBy(col("day_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev
      .withColumn("ltv_cents", sum(col("rev_cents")).over(cum))
      .join(broadcast(sizes), "cohort_day")
      .select(col("cohort_day"), col("day_offset"), col("n_purchases"),
        col("rev_cents"), col("ltv_cents"), col("cohort_users"),
        (round(col("ltv_cents").cast("double") / col("cohort_users") / 100, 4)
          + lit(0.0)).as("ltv_per_user"))
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

  /** q183 — CONCURRENT SESSIONS per hour + daily peak: how many q123
    * sessions were simultaneously open in each hour — the capacity-planning
    * curve (connection pools, autoscaling floors, peak-hour staffing)
    * that per-event counts cannot give because a session occupies its
    * whole span, not just its event instants. No sweep-line global sort:
    * each session EXPLODES into the hours it overlaps (`sequence` on the
    * hour numbers — bounded by session length, ≤ a handful under a 30-min
    * gap rule), then one count per hour; the daily peak is a window over
    * the per-day hour rows (≤24 — a reduced aggregate, per the family
    * discipline). Everything shuffles on (user), then (hour) — both
    * uniform keys; the interval semantics cost one bounded explode, the
    * same shape as q141's 28-day MAU expansion. */
  def concurrentSessions(spark: SparkSession, dir: String): DataFrame = {
    val byTs = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val marked = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("new_s", when(col("us") - lag(col("us"), 1).over(byTs) <
        lit(30L * 60 * 1000000), lit(0L)).otherwise(lit(1L)))
      .withColumn("sid", sum(col("new_s")).over(
        byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val sessions = marked.groupBy(col("user_id"), col("sid"))
      .agg(min(col("us")).as("s_us"), max(col("us")).as("e_us"))
    val hourly = sessions
      .select(explode(expr(
        "sequence(s_us div 3600000000, e_us div 3600000000)")).as("hour_no"))
      .groupBy(col("hour_no")).agg(count(lit(1)).as("n_concurrent"))
      .withColumn("day", expr("hour_no div 24"))
      .withColumn("hod", expr("cast(hour_no % 24 as int)"))
    hourly
      .withColumn("day_peak",
        max(col("n_concurrent")).over(Window.partitionBy(col("day"))))
      .select(col("day"), col("hod"), col("n_concurrent"), col("day_peak"),
        (col("n_concurrent") === col("day_peak")).as("is_peak"))
      .orderBy(col("day"), col("hod"))
  }

  /** q186 — q183's concurrency by DELTA SWEEP instead of hour explode:
    * each session contributes exactly TWO delta rows (+1 at its first
    * hour, −1 after its last) regardless of length, the dense hour grid
    * rides a per-day `sequence`, and the running sum is TWO-PHASE like
    * q93 — within-day running totals plus an exclusive prefix over the
    * per-day delta sums (≤ horizon rows, broadcast-scale) — so no global
    * sort and no midnight-crossing carry problem. Same output as q183
    * (the oracle is q183's verbatim, the q57/q58/q185 variant
    * discipline); the CHOICE is a cost crossover: the explode writes
    * O(session-hours) rows (bounded ~2 under a 30-min gap rule — q183
    * wins there), the sweep writes O(2·sessions + active hours) (wins
    * when sessions are LONG: always-on devices, connection leases,
    * day-scale jobs). Measured at 32× in §6.8. */
  def concurrentSessionsSweep(spark: SparkSession, dir: String): DataFrame = {
    val byTs = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val marked = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("new_s", when(col("us") - lag(col("us"), 1).over(byTs) <
        lit(30L * 60 * 1000000), lit(0L)).otherwise(lit(1L)))
      .withColumn("sid", sum(col("new_s")).over(
        byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val sessions = marked.groupBy(col("user_id"), col("sid"))
      .agg(expr("min(us) div 3600000000").as("s_h"),
        expr("max(us) div 3600000000").as("e_h"))
    // two delta rows per session, then one count per delta hour
    val deltas = sessions
      .select(explode(array(
        struct(col("s_h").as("hour_no"), lit(1L).as("d")),
        struct((col("e_h") + 1).as("hour_no"), lit(-1L).as("d")))).as("x"))
      .select(col("x.hour_no"), col("x.d"))
      .groupBy(col("hour_no")).agg(sum(col("d")).as("d"))
      // checkpointed: deltas feeds the span probe AND the dense grid
      // join — the whole sessionize subtree otherwise re-runs per branch
      // (r20 static dup-subtree catch); one row per delta hour is tiny
      .localCheckpoint(true)
    // dense hour grid (delta hours alone would skip mid-session hours)
    val span = deltas.agg(min(col("hour_no")).as("h0"), max(col("hour_no")).as("h1"))
    val grid = span.select(explode(expr("sequence(h0, h1)")).as("hour_no"))
    val dense = grid.join(deltas, Seq("hour_no"), "left_outer")
      .select(col("hour_no"), coalesce(col("d"), lit(0L)).as("d"),
        expr("hour_no div 24").as("day"))
    // phase 1: running sum WITHIN each day (≤24 rows per partition);
    // phase 2: exclusive prefix of per-day totals (≤ horizon rows) joined
    // back broadcast — together the global running sum, no global sort
    val inDay = Window.partitionBy(col("day")).orderBy(col("hour_no"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = dense.withColumn("run_d", sum(col("d")).over(inDay))
    val offsets = dense.groupBy(col("day")).agg(sum(col("d")).as("dsum"))
      .withColumn("carry", coalesce(
        sum(col("dsum")).over(Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("day"), col("carry"))
    local.join(broadcast(offsets), Seq("day"))
      .withColumn("n_concurrent", col("run_d") + col("carry"))
      .filter(col("n_concurrent") > 0)
      .withColumn("hod", expr("cast(hour_no % 24 as int)"))
      .withColumn("day_peak",
        max(col("n_concurrent")).over(Window.partitionBy(col("day"))))
      .select(col("day"), col("hod"), col("n_concurrent"), col("day_peak"),
        (col("n_concurrent") === col("day_peak")).as("is_peak"))
      .orderBy(col("day"), col("hod"))
  }

  /** Last-touch marketing attribution: each `purchase` is credited to the
    * user's most recent `click` or `view` STRICTLY before it and within a
    * 1-day lookback; purchases with no qualifying touch are `direct`.
    *
    * Spark-first shape: the textbook formulation is an as-of self-join of
    * purchases against touches (quadratic candidate expansion under skew);
    * here the per-user running `max(when(touch, ts))` window carries the
    * last touch of each kind to every row in ONE pass — the same
    * single-shuffle user_id partitioning as the rest of the family. The
    * strictly-before rule uses a 1-PRECEDING row frame PLUS an explicit
    * ts < purchase-ts guard, so a touch sharing the purchase's timestamp
    * never credits itself. Ties between a click and a view at the same
    * touch instant go to the click (the more intentful touch).
    */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val dayUs = 86400L * 1000000
    val touched = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("us"))
      .withColumn("last_click", max(when(col("event_type") === "click", col("us"))).over(w))
      .withColumn("last_view", max(when(col("event_type") === "view", col("us"))).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("lc", when(col("last_click") < col("us") &&
        col("last_click") >= col("us") - dayUs, col("last_click")))
      .withColumn("lv", when(col("last_view") < col("us") &&
        col("last_view") >= col("us") - dayUs, col("last_view")))
      .withColumn("touch", when(col("lc").isNotNull &&
          (col("lv").isNull || col("lc") >= col("lv")), lit("click"))
        .when(col("lv").isNotNull, lit("view"))
        .otherwise(lit("direct")))
      .withColumn("lag_sec", floor((col("us") - greatest(col("lc"), col("lv"))) / lit(1000000L)))
    touched.groupBy(col("touch"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value")), 2).as("total_value"),
        round(avg(col("lag_sec")), 4).as("avg_lag_sec"))
      .orderBy(col("touch"))
  }

  /** A/B experiment readout with Welch's t statistic: users are split into
    * arms by the same deterministic md5 content hash as q68 (no RNG), and
    * the purchase-value metric is compared arm-to-arm. All moments are
    * accumulated on exact integer cents (value has 2-dp precision), so
    * Σx and Σx² are order-independent BIGINTs and every downstream double
    * (mean, sample variance, Welch t, Welch–Satterthwaite dof) is one
    * identical expression tree in both engines — bit-stable without any
    * tolerance. Single scan → two-row aggregate → one broadcast-size
    * compare row.
    */
  def abWelch(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("value") * 100, 0).cast("long")
    val arms = Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), cents.as("cents"))
      .withColumn("arm", when(
        graft.functions.TextExpressions.md5Hash60Col(
          concat(col("user_id").cast("string"), lit(":ab"))) % 2 === 0,
        lit("A")).otherwise(lit("B")))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sx"),
        sum(col("cents") * col("cents")).as("sxx"))
      .withColumn("mean", col("sx").cast("double") / col("n") / 100)
      .withColumn("vr", (col("sxx") - col("sx").cast("double") * col("sx") / col("n"))
        / (col("n") - 1) / 10000)
    val a = arms.filter(col("arm") === "A")
      .select(col("n").as("n_a"), col("mean").as("mean_a"), col("vr").as("var_a"))
    val b = arms.filter(col("arm") === "B")
      .select(col("n").as("n_b"), col("mean").as("mean_b"), col("vr").as("var_b"))
    a.crossJoin(broadcast(b))
      .withColumn("se2", col("var_a") / col("n_a") + col("var_b") / col("n_b"))
      .select(col("n_a"), round(col("mean_a"), 6).as("mean_a"),
        round(col("var_a"), 6).as("var_a"),
        col("n_b"), round(col("mean_b"), 6).as("mean_b"),
        round(col("var_b"), 6).as("var_b"),
        (round((col("mean_a") - col("mean_b")) / sqrt(col("se2")), 6) + lit(0.0)).as("welch_t"),
        // x*x, not pow(x,2): pow's libm rounding may differ per engine;
        // the explicit product is one IEEE multiply in both
        round(col("se2") * col("se2") / (
          (col("var_a") / col("n_a")) * (col("var_a") / col("n_a")) / (col("n_a") - 1) +
            (col("var_b") / col("n_b")) * (col("var_b") / col("n_b")) / (col("n_b") - 1)),
          4).as("welch_dof"))
  }

  /** RFM customer segmentation: per-user Recency (days since last purchase
    * at the corpus horizon), Frequency (purchase count), Monetary (exact
    * integer cents), each scored into quintiles (5 = best), then mapped to
    * the classic segment labels. Ties inside a quintile ordering break by
    * user_id, so assignment is deterministic in both engines.
    *
    * Scale: the quintile windows run on the PER-USER AGGREGATE (≤ distinct
    * users, already reduced by the only real shuffle), not on events —
    * same class as q114's post-limit window. At extreme user cardinality
    * the quintile boundaries would come from the q93 two-phase rank
    * machinery or approx quantiles; the window form is the readable spec.
    */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day"),
        round(col("value") * 100, 0).cast("long").as("cents"))
    // horizon as an unbounded window over the aggregate — max over
    // per-user last_day ≡ max over all purchase days, and the quintile
    // ntiles below already force this single-partition window stage, so
    // the horizon rides it for free instead of a second events scan
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val perUser = e.groupBy(col("user_id"))
      .agg(max(col("day")).as("last_day"), count(lit(1)).as("n_purchases"),
        sum(col("cents")).as("m_cents"))
      .withColumn("max_day", max(col("last_day")).over(all))
      .withColumn("r_days", datediff(col("max_day"), col("last_day")).cast("long"))
    val scored = perUser
      .withColumn("r_score",
        ntile(5).over(Window.orderBy(col("r_days").desc, col("user_id"))))
      .withColumn("f_score",
        ntile(5).over(Window.orderBy(col("n_purchases"), col("user_id"))))
      .withColumn("m_score",
        ntile(5).over(Window.orderBy(col("m_cents"), col("user_id"))))
    scored
      .withColumn("segment",
        when(col("r_score") >= 4 && col("f_score") >= 4, "champion")
          .when(col("f_score") >= 4, "loyal")
          .when(col("m_score") === 5, "big_spender")
          .when(col("r_score") <= 2 && col("f_score") >= 3, "at_risk")
          .when(col("r_score") === 1 && col("f_score") <= 2, "lost")
          .otherwise("regular"))
      .select(col("user_id"), col("r_days"), col("n_purchases"),
        round(col("m_cents").cast("double") / 100, 2).as("monetary"),
        col("r_score"), col("f_score"), col("m_score"), col("segment"))
      .orderBy(col("user_id"))
  }

  /** Robust daily-volume anomaly detection per event type: median/MAD
    * (Iglewicz–Hoaglin modified z-score, |0.6745·(x−med)/MAD| > 3.5) over
    * the per-(type, day) event counts — the monitoring query an ops team
    * points at any event stream, and deliberately median-based so the
    * anomalies themselves can't poison the baseline (the mean/stddev form
    * masks exactly the spikes it should flag).
    *
    * Scale: counts reduce events to |types|×|days| rows before the exact
    * medians run; both median passes and the join-backs are on that tiny
    * aggregate (broadcast), so the only event-proportional work is the
    * first count. The zero-MAD degenerate case (over half the days
    * identical) falls back to flagging any c ≠ median.
    */
  def anomalyMad(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    val med = daily.groupBy(col("event_type"))
      .agg(expr("percentile(c, 0.5)").as("med"))
    val withMed = daily.join(broadcast(med), "event_type")
    val mad = withMed.groupBy(col("event_type"))
      .agg(expr("percentile(abs(c - med), 0.5)").as("mad"))
    withMed.join(broadcast(mad), "event_type")
      .withColumn("robust_z", when(col("mad") > 0,
        round(lit(0.6745) * (col("c") - col("med")) / col("mad"), 4) + lit(0.0)))
      .withColumn("is_anomaly", when(col("mad") > 0, abs(col("robust_z")) > 3.5)
        .otherwise(col("c") =!= col("med")))
      .select(col("event_type"), col("day"), col("c").as("n_events"),
        round(col("med"), 4).as("median_n"), round(col("mad"), 4).as("mad_n"),
        col("robust_z"), col("is_anomaly"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Item-item collaborative filtering on co-occurrence cosine — the
    * classic Amazon-style recommender primitive: items (the `props.k`
    * attribute) are similar when the same users touch both;
    * sim(i,j) = c_ij / √(c_i·c_j) over distinct-user sets.
    *
    * Scale: same discipline as q129 — pairs are generated per-row from
    * each user's sorted distinct-item array (never an item-table
    * self-join), the per-item user counts ride as broadcasts, and the
    * c_ij ≥ minUsers support filter runs on the pair aggregate before the
    * top-k. At web scale the per-user array gets a frequent-item cap (the
    * standard CF down-sampling of power users); the shape is unchanged.
    */
  def itemCooccurrence(spark: SparkSession, dir: String, minUsers: Int = 5,
                       topK: Int = 30): DataFrame = {
    val ui = Tables(spark, dir, "events")
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      .filter(col("item").isNotNull).distinct()
    val itemUsers = ui.groupBy(col("item")).agg(count(lit(1)).as("c"))
    val pairs = ui.groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("item"))).as("items"))
      .select(explode(expr(
        "flatten(transform(items, (x, i) -> transform(slice(items, i + 2, size(items)), " +
          "y -> struct(x AS i, y AS j))))")).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("c_ij"))
      .filter(col("c_ij") >= minUsers)
    pairs
      .join(broadcast(itemUsers.select(col("item").as("i"), col("c").as("c_i"))), "i")
      .join(broadcast(itemUsers.select(col("item").as("j"), col("c").as("c_j"))), "j")
      .withColumn("cosine",
        round(col("c_ij") / sqrt((col("c_i") * col("c_j")).cast("double")), 6))
      .orderBy(col("cosine").desc, col("i"), col("j"))
      .limit(topK)
      .select(col("i"), col("j"), col("c_ij"), col("c_i"), col("c_j"), col("cosine"))
  }

  /** First-order Markov transition matrix over each user's event sequence
    * (user-journey analysis): P(next | current) with exact integer counts
    * and one shared user_id shuffle — the lag/lead machinery q26 exercises,
    * aggregated into the journey graph a PM actually reads. The row-total
    * window runs over the |types|² aggregate, not over events. */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("cur"), col("nxt"))
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total", sum(col("n")).over(Window.partitionBy(col("cur"))))
      .select(col("cur"), col("nxt"), col("n"), col("row_total"),
        round(col("n") / col("row_total"), 6).as("p"))
      .orderBy(col("cur"), col("nxt"))
  }

  /** Kaplan–Meier survival curve for signup → first purchase, with
    * right-censoring at the corpus horizon — the time-to-conversion
    * analysis a growth team runs, and the one estimator here that is
    * DEFINED by an ordered product. S(t) = Π_{s ≤ t} (1 − d_s/n_s) is
    * computed as exp of the running sum of ln factors over the day-ordered
    * aggregate: the cumulative window fixes the summation order, so both
    * engines fold identical doubles in identical order. Risk sets and
    * event counts are exact integers; the day table is ≤ horizon rows, so
    * every window here runs on a constant-size aggregate (the only
    * event-proportional work is the per-user min/min aggregation, one
    * user_id shuffle).
    */
  def survivalKm(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val cohort = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("t0"))
    val conv = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("pday"))
      .join(cohort, "user_id")
      .filter(col("pday") >= col("t0"))
      .groupBy(col("user_id")).agg(min(col("pday")).as("conv_day"))
    val horizon = e.select(max(to_date(col("ts"))).as("hday"))
    val durations = cohort
      .join(conv, Seq("user_id"), "left_outer")
      .crossJoin(broadcast(horizon))
      .select(
        when(col("conv_day").isNotNull,
          datediff(col("conv_day"), col("t0"))).otherwise(
          datediff(col("hday"), col("t0"))).cast("long").as("dur"),
        when(col("conv_day").isNotNull, lit(1L)).otherwise(lit(0L)).as("evt"))
    val daily = durations.groupBy(col("dur"))
      .agg(sum(col("evt")).as("d"), count(lit(1)).as("total_at"))
    val byDay = Window.orderBy(col("dur"))
    val all = byDay.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    daily
      .withColumn("n_risk", sum(col("total_at")).over(all) - coalesce(
        sum(col("total_at")).over(byDay.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      // a day where every remaining subject converts has factor 0 —
      // ln is undefined (DuckDB errors, Spark nulls), so the zero is
      // tracked separately and forces survival to 0 from that day on
      .withColumn("lnf", when(col("d") < col("n_risk"),
        log(lit(1.0) - col("d") / col("n_risk"))).otherwise(lit(0.0)))
      .withColumn("zcum", sum(when(col("d") === col("n_risk"), lit(1L))
        .otherwise(lit(0L)))
        .over(byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("survival", when(col("zcum") > 0, lit(0.0))
        .otherwise(round(exp(sum(col("lnf"))
          .over(byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow))), 6)))
      .select(col("dur").as("day"), col("n_risk"), col("d").as("n_events"),
        (col("total_at") - col("d")).as("n_censored"), col("survival"))
      .orderBy(col("day"))
  }

  /** Top-k 3-step user journeys (sequential pattern counts) — q135's
    * higher-order companion: the "top paths" view every product-analytics
    * tool ships. Two `lead`s on the family's single user_id shuffle turn
    * each event into the path it starts; exact counts, then a distributed
    * TakeOrdered for the top-k — the path cardinality is |types|³ at most,
    * so nothing row-proportional survives the aggregate. */
  def journeyTrigrams(spark: SparkSession, dir: String, topK: Int = 15): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .filter(col("t3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("t2"), col("t3")).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(topK)
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("n").desc, col("path"))).cast("int"))
      .select(col("rnk"), col("path"), col("n"))
      .orderBy(col("rnk"))
  }

  /** q191 — LONGEST ACTIVITY STREAKS per user: consecutive-day runs from
    * the per-user distinct-day set (gaps-and-islands by the day − rank
    * constant-difference trick — q123's sessionization grammar at daily
    * grain), reporting active days, streak count, and the longest run —
    * the habit/engagement metric (Duolingo-style streaks, "n-day
    * contribution runs") product teams rank users by. Dedup to
    * (user, day) FIRST (the q141 rule: volume dies at the first
    * aggregate), then ONE user_id shuffle carries the rank window and
    * both aggregates; the top-k is a distributed TakeOrdered. */
  def activityStreaks(spark: SparkSession, dir: String, topK: Int = 50): DataFrame = {
    // repartition on user_id BEFORE the (user, day) distinct: hash(user)
    // satisfies the dedup's clustering AND the window's, so dedup, rank,
    // and both aggregates ride ONE exchange (the q92/q95 shared-shuffle
    // rule; plan-pinned)
    val days = Tables(spark, dir, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .repartition(col("user_id"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    days
      .withColumn("grp", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(sum(col("len")).as("active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("len")).as("longest_streak"))
      .orderBy(col("longest_streak").desc, col("user_id"))
      .limit(topK)
  }

  /** q192 — GROWTH ACCOUNTING: the daily new / retained / resurrected /
    * churned decomposition of the active-user base (the Social Capital
    * accounting framework — the canonical "where did the DAU change come
    * from" report that q141's DAU/stickiness totals do not explain). A
    * user's active day is `new` (first ever), `retained` (previous
    * active day within the lapse window), or `resurrected` (returned
    * after > lapse days away); a user CHURNS on the day their lapse
    * window expires with no activity (prev active day + lapse, emitted
    * from the same lag/lead pass — churn is an ABSENCE event, so it must
    * be derived, not observed; the end-of-horizon guard keeps not-yet-
    * expired users out). The identity net = new + resurrected − churned
    * ties the report to the active-base delta. One user_id shuffle
    * (dedup + lag + lead share it), then a ≤|days| aggregate; the
    * horizon scalar broadcasts. */
  def growthAccounting(spark: SparkSession, dir: String, lapse: Int = 7): DataFrame = {
    // same shared-shuffle rule as q191: hash(user) carries dedup + lag/lead
    val days = Tables(spark, dir, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .repartition(col("user_id"))
      .distinct()
    // horizon off the RAW scan (max over raw == max over distinct): deriving
    // it from `days` would re-run the dedup's user shuffle for one scalar
    val horizon = Tables(spark, dir, "events")
      .agg(max(expr("unix_micros(ts) div 86400000000")).as("hday"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    // ONE pass emits both row kinds: each (user, day) cursor row explodes
    // into its activity classification plus, when its lapse window expires
    // observably, the derived churn event — a union of two branches would
    // re-derive the scan AND the user shuffle per branch (plan-pinned)
    val seq = days
      .withColumn("prev", lag(col("day"), 1).over(w))
      .withColumn("nxt", lead(col("day"), 1).over(w))
      .crossJoin(broadcast(horizon))
    val cls = when(col("prev").isNull, "new")
      .when(col("day") - col("prev") <= lapse, "retained")
      .otherwise("resurrected")
    val churns = (col("nxt").isNull && col("day") + lapse <= col("hday")) ||
      (col("nxt").isNotNull && col("nxt") - col("day") > lapse)
    seq
      .select(explode(filter(array(
        struct(col("day").as("day_no"), cls.as("cls")),
        when(churns, struct((col("day") + lapse).as("day_no"),
          lit("churned").as("cls")))), x => x.isNotNull)).as("e"))
      .select(col("e.day_no").as("day_no"), col("e.cls").as("cls"))
      .groupBy(col("day_no"))
      .agg(sum(when(col("cls") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("cls") === "retained", 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("cls") === "resurrected", 1L).otherwise(0L)).as("n_resurrected"),
        sum(when(col("cls") === "churned", 1L).otherwise(0L)).as("n_churned"))
      .withColumn("net_active_delta",
        col("n_new") + col("n_resurrected") - col("n_churned"))
      .orderBy(col("day_no"))
  }

  val queries: Map[String, QueryFn] = Map(
    "q191_activity_streaks" -> ((s, d) => activityStreaks(s, d)),
    "q192_growth_accounting" -> ((s, d) => growthAccounting(s, d)),
    "q138_journey_trigrams" -> ((s, d) => journeyTrigrams(s, d)),
    "q134_item_cooccurrence" -> ((s, d) => itemCooccurrence(s, d)),
    "q135_event_transitions" -> eventTransitions _,
    "q136_survival_km" -> survivalKm _,
    "q121_funnel_conversion" -> funnel _,
    "q122_retention_cohorts" -> retention _,
    "q123_session_stats" -> sessionStats _,
    "q183_concurrent_sessions" -> concurrentSessions _,
    "q186_concurrent_sweep" -> concurrentSessionsSweep _,
    "q184_cohort_ltv" -> cohortLtv _,
    "q126_attribution_last_touch" -> attribution _,
    "q127_ab_welch" -> abWelch _,
    "q130_rfm_segments" -> rfmSegments _,
    "q131_anomaly_mad" -> anomalyMad _
  )

  val oracleSql: Map[String, String] = Map(
    "q191_activity_streaks" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |i AS (SELECT user_id, day,
        |        day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |      FROM d),
        |s AS (SELECT user_id, grp, count(*) AS len FROM i GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS active_days,
        |       count(*) AS n_streaks, CAST(max(len) AS BIGINT) AS longest_streak
        |FROM s GROUP BY 1
        |ORDER BY longest_streak DESC, user_id LIMIT 50""".stripMargin,
    // churn is derived: the lapse window expiring without activity, only
    // where the horizon can observe the full window (same rule as Spark)
    "q192_growth_accounting" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |h AS (SELECT max(day) AS hday FROM d),
        |sq AS (
        |  SELECT user_id, day,
        |         lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev,
        |         lead(day) OVER (PARTITION BY user_id ORDER BY day) AS nxt
        |  FROM d),
        |act AS (
        |  SELECT day AS day_no,
        |         CASE WHEN prev IS NULL THEN 'new'
        |              WHEN day - prev <= 7 THEN 'retained'
        |              ELSE 'resurrected' END AS cls
        |  FROM sq),
        |churn AS (
        |  SELECT day + 7 AS day_no, 'churned' AS cls
        |  FROM sq CROSS JOIN h
        |  WHERE (nxt IS NULL AND day + 7 <= hday)
        |     OR (nxt IS NOT NULL AND nxt - day > 7)),
        |u AS (SELECT * FROM act UNION ALL SELECT * FROM churn)
        |SELECT day_no,
        |       CAST(sum(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |       CAST(sum(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_retained,
        |       CAST(sum(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_resurrected,
        |       CAST(sum(CASE WHEN cls = 'churned' THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_churned,
        |       CAST(sum(CASE WHEN cls = 'new' THEN 1 ELSE 0 END)
        |            + sum(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END)
        |            - sum(CASE WHEN cls = 'churned' THEN 1 ELSE 0 END) AS BIGINT)
        |         AS net_active_delta
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    "q138_journey_trigrams" ->
      """WITH t AS (
        |  SELECT event_type AS t1,
        |         lead(event_type, 1) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS t2,
        |         lead(event_type, 2) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS t3
        |  FROM events),
        |c AS (SELECT t1 || '>' || t2 || '>' || t3 AS path, count(*) AS n
        |      FROM t WHERE t3 IS NOT NULL GROUP BY 1
        |      ORDER BY n DESC, path LIMIT 15)
        |SELECT CAST(row_number() OVER (ORDER BY n DESC, path) AS INT) AS rnk,
        |       path, n
        |FROM c ORDER BY rnk""".stripMargin,
    // the oracle takes the naive item×item self-join; the Spark side
    // generates pairs per-row from sorted per-user arrays (see scaladoc)
    "q134_item_cooccurrence" ->
      """WITH ui AS (
        |  SELECT DISTINCT user_id, CAST(props->>'k' AS INTEGER) AS item
        |  FROM events WHERE props->>'k' IS NOT NULL),
        |iu AS (SELECT item, count(*) AS c FROM ui GROUP BY 1),
        |p AS (SELECT x.item AS i, y.item AS j, count(*) AS c_ij
        |      FROM ui x JOIN ui y ON x.user_id = y.user_id AND x.item < y.item
        |      GROUP BY 1, 2 HAVING count(*) >= 5),
        |s AS (SELECT i, j, c_ij, a.c AS c_i, b.c AS c_j,
        |        round(c_ij / sqrt(CAST(a.c * b.c AS DOUBLE)), 6) AS cosine
        |      FROM p JOIN iu a ON a.item = p.i JOIN iu b ON b.item = p.j)
        |SELECT i, j, c_ij, c_i, c_j, cosine FROM s
        |ORDER BY cosine DESC, i, j LIMIT 30""".stripMargin,
    "q135_event_transitions" ->
      """WITH t AS (
        |  SELECT event_type AS cur,
        |         lead(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |c AS (SELECT cur, nxt, count(*) AS n FROM t
        |      WHERE nxt IS NOT NULL GROUP BY 1, 2)
        |SELECT cur, nxt, n,
        |       CAST(sum(n) OVER (PARTITION BY cur) AS BIGINT) AS row_total,
        |       round(n / sum(n) OVER (PARTITION BY cur), 6) AS p
        |FROM c ORDER BY cur, nxt""".stripMargin,
    "q136_survival_km" ->
      """WITH cohort AS (
        |  SELECT user_id, CAST(min(ts) AS DATE) AS t0
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |conv AS (
        |  SELECT e.user_id, min(CAST(e.ts AS DATE)) AS conv_day
        |  FROM events e JOIN cohort c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS DATE) >= c.t0
        |  GROUP BY 1),
        |h AS (SELECT max(CAST(ts AS DATE)) AS hday FROM events),
        |dur AS (
        |  SELECT CASE WHEN v.conv_day IS NOT NULL
        |              THEN CAST(v.conv_day - c.t0 AS BIGINT)
        |              ELSE CAST(h.hday - c.t0 AS BIGINT) END AS dur,
        |         CASE WHEN v.conv_day IS NOT NULL THEN 1 ELSE 0 END AS evt
        |  FROM cohort c LEFT JOIN conv v ON c.user_id = v.user_id CROSS JOIN h),
        |daily AS (
        |  SELECT dur, CAST(sum(evt) AS BIGINT) AS d, count(*) AS total_at
        |  FROM dur GROUP BY 1),
        |km AS (
        |  SELECT dur, d, total_at,
        |         sum(total_at) OVER () - coalesce(sum(total_at)
        |           OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
        |                 AND 1 PRECEDING), 0) AS n_risk
        |  FROM daily)
        |SELECT dur AS day, CAST(n_risk AS BIGINT) AS n_risk, d AS n_events,
        |       total_at - d AS n_censored,
        |       CASE WHEN sum(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
        |              OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
        |                    AND CURRENT ROW) > 0 THEN 0.0
        |            ELSE round(exp(sum(CASE WHEN d < n_risk
        |                   THEN ln(1 - d / n_risk) ELSE 0.0 END)
        |              OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
        |                    AND CURRENT ROW)), 6) END AS survival
        |FROM km ORDER BY day""".stripMargin,
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
    "q184_cohort_ltv" ->
      """WITH cohort AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |sizes AS (SELECT cohort_day, count(*) AS cohort_users
        |          FROM cohort GROUP BY 1),
        |rev AS (
        |  SELECT c.cohort_day,
        |         CAST(CAST(e.ts AS DATE) - c.cohort_day AS BIGINT) AS day_offset,
        |         CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
        |         count(*) AS n_purchases
        |  FROM events e JOIN cohort c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS DATE) >= c.cohort_day
        |  GROUP BY 1, 2),
        |cum AS (
        |  SELECT *, CAST(sum(rev_cents) OVER (PARTITION BY cohort_day
        |              ORDER BY day_offset ROWS BETWEEN UNBOUNDED PRECEDING
        |              AND CURRENT ROW) AS BIGINT) AS ltv_cents
        |  FROM rev)
        |SELECT m.cohort_day, m.day_offset, m.n_purchases, m.rev_cents,
        |       m.ltv_cents, s.cohort_users,
        |       round(CAST(m.ltv_cents AS DOUBLE) / s.cohort_users / 100, 4) + 0.0
        |         AS ltv_per_user
        |FROM cum m JOIN sizes s USING (cohort_day)
        |ORDER BY m.cohort_day, m.day_offset""".stripMargin,
    // result-identical to q183 by contract — the sweep is plan shape only
    "q186_concurrent_sweep" ->
      """WITH o AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |s AS (
        |  SELECT *, CASE WHEN us - lag(us) OVER (PARTITION BY user_id
        |                   ORDER BY us, event_id) < 1800000000
        |                 THEN 0 ELSE 1 END AS new_s
        |  FROM o),
        |m AS (
        |  SELECT user_id,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                          ROWS UNBOUNDED PRECEDING) AS sid, us
        |  FROM s),
        |iv AS (SELECT user_id, sid, min(us) AS s_us, max(us) AS e_us
        |       FROM m GROUP BY 1, 2),
        |h AS (
        |  SELECT unnest(generate_series(s_us // 3600000000,
        |                                e_us // 3600000000)) AS hour_no
        |  FROM iv),
        |c AS (SELECT hour_no, count(*) AS n_concurrent FROM h GROUP BY 1),
        |d AS (SELECT hour_no // 24 AS day, CAST(hour_no % 24 AS INT) AS hod,
        |             n_concurrent FROM c)
        |SELECT day, hod, n_concurrent,
        |       CAST(max(n_concurrent) OVER (PARTITION BY day) AS BIGINT) AS day_peak,
        |       n_concurrent = max(n_concurrent) OVER (PARTITION BY day) AS is_peak
        |FROM d ORDER BY day, hod""".stripMargin,
    "q183_concurrent_sessions" ->
      """WITH o AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |s AS (
        |  SELECT *, CASE WHEN us - lag(us) OVER (PARTITION BY user_id
        |                   ORDER BY us, event_id) < 1800000000
        |                 THEN 0 ELSE 1 END AS new_s
        |  FROM o),
        |m AS (
        |  SELECT user_id,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                          ROWS UNBOUNDED PRECEDING) AS sid, us
        |  FROM s),
        |iv AS (SELECT user_id, sid, min(us) AS s_us, max(us) AS e_us
        |       FROM m GROUP BY 1, 2),
        |h AS (
        |  SELECT unnest(generate_series(s_us // 3600000000,
        |                                e_us // 3600000000)) AS hour_no
        |  FROM iv),
        |c AS (SELECT hour_no, count(*) AS n_concurrent FROM h GROUP BY 1),
        |d AS (SELECT hour_no // 24 AS day, CAST(hour_no % 24 AS INT) AS hod,
        |             n_concurrent FROM c)
        |SELECT day, hod, n_concurrent,
        |       CAST(max(n_concurrent) OVER (PARTITION BY day) AS BIGINT) AS day_peak,
        |       n_concurrent = max(n_concurrent) OVER (PARTITION BY day) AS is_peak
        |FROM d ORDER BY day, hod""".stripMargin,
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
        |SELECT user_id, count(*) AS n_sessions,
        |       CAST(sum(n_events) AS BIGINT) AS n_events,
        |       round(CAST(sum(n_events) AS DOUBLE) / count(*), 4) AS avg_events,
        |       max(span_sec) AS max_span_sec,
        |       round(sum(value_sum), 2) AS sum_value
        |FROM ps GROUP BY 1 ORDER BY 1""".stripMargin,
    "q126_attribution_last_touch" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us
        |  FROM events),
        |t AS (
        |  SELECT *,
        |    max(CASE WHEN event_type = 'click' THEN us END)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click,
        |    max(CASE WHEN event_type = 'view' THEN us END)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view
        |  FROM e),
        |p AS (
        |  SELECT value, us,
        |    CASE WHEN last_click < us AND last_click >= us - 86400000000 THEN last_click END AS lc,
        |    CASE WHEN last_view < us AND last_view >= us - 86400000000 THEN last_view END AS lv
        |  FROM t WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT value, us,
        |    CASE WHEN lc IS NOT NULL AND (lv IS NULL OR lc >= lv) THEN 'click'
        |         WHEN lv IS NOT NULL THEN 'view' ELSE 'direct' END AS touch,
        |    floor((us - greatest(lc, lv)) / 1000000) AS lag_sec
        |  FROM p)
        |SELECT touch, count(*) AS n_purchases,
        |       round(sum(value), 2) AS total_value,
        |       round(avg(lag_sec), 4) AS avg_lag_sec
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "q127_ab_welch" ->
      """WITH x AS (
        |  SELECT CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':ab'), 1, 15)
        |                    AS BIGINT) % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT arm, count(*) AS n, sum(cents) AS sx, sum(cents * cents) AS sxx
        |  FROM x GROUP BY 1),
        |s AS (
        |  SELECT arm, n,
        |         CAST(sx AS DOUBLE) / n / 100 AS mean,
        |         (sxx - CAST(sx AS DOUBLE) * sx / n) / (n - 1) / 10000 AS vr
        |  FROM m),
        |a AS (SELECT n AS n_a, mean AS mean_a, vr AS var_a FROM s WHERE arm = 'A'),
        |b AS (SELECT n AS n_b, mean AS mean_b, vr AS var_b FROM s WHERE arm = 'B'),
        |j AS (SELECT *, var_a / n_a + var_b / n_b AS se2 FROM a CROSS JOIN b)
        |SELECT n_a, round(mean_a, 6) AS mean_a, round(var_a, 6) AS var_a,
        |       n_b, round(mean_b, 6) AS mean_b, round(var_b, 6) AS var_b,
        |       round((mean_a - mean_b) / sqrt(se2), 6) + 0.0 AS welch_t,
        |       round(se2 * se2 / (
        |         (var_a / n_a) * (var_a / n_a) / (n_a - 1) +
        |         (var_b / n_b) * (var_b / n_b) / (n_b - 1)), 4) AS welch_dof
        |FROM j""".stripMargin,
    "q130_rfm_segments" ->
      """WITH p AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |u AS (
        |  SELECT user_id, max(day) AS last_day, count(*) AS n_purchases,
        |         sum(cents) AS m_cents
        |  FROM p GROUP BY 1),
        |u2 AS (SELECT *, max(last_day) OVER () AS max_day FROM u),
        |r AS (
        |  SELECT user_id, CAST(max_day - last_day AS BIGINT) AS r_days,
        |         n_purchases, m_cents,
        |         ntile(5) OVER (ORDER BY max_day - last_day DESC, user_id) AS r_score,
        |         ntile(5) OVER (ORDER BY n_purchases, user_id) AS f_score,
        |         ntile(5) OVER (ORDER BY m_cents, user_id) AS m_score
        |  FROM u2)
        |SELECT user_id, r_days, n_purchases,
        |       round(CAST(m_cents AS DOUBLE) / 100, 2) AS monetary,
        |       CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
        |       CAST(m_score AS INT) AS m_score,
        |       CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
        |            WHEN f_score >= 4 THEN 'loyal'
        |            WHEN m_score = 5 THEN 'big_spender'
        |            WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
        |            WHEN r_score = 1 AND f_score <= 2 THEN 'lost'
        |            ELSE 'regular' END AS segment
        |FROM r ORDER BY user_id""".stripMargin,
    "q131_anomaly_mad" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |med AS (SELECT event_type, quantile_cont(c, 0.5) AS med
        |        FROM daily GROUP BY 1),
        |wm AS (SELECT d.event_type, d.day, d.c, m.med
        |       FROM daily d JOIN med m USING (event_type)),
        |md AS (SELECT event_type, quantile_cont(abs(c - med), 0.5) AS mad
        |       FROM wm GROUP BY 1)
        |SELECT wm.event_type, wm.day, wm.c AS n_events,
        |       round(wm.med, 4) AS median_n, round(md.mad, 4) AS mad_n,
        |       CASE WHEN md.mad > 0
        |            THEN round(0.6745 * (wm.c - wm.med) / md.mad, 4) + 0.0 END
        |         AS robust_z,
        |       CASE WHEN md.mad > 0
        |            THEN abs(round(0.6745 * (wm.c - wm.med) / md.mad, 4) + 0.0) > 3.5
        |            ELSE wm.c <> wm.med END AS is_anomaly
        |FROM wm JOIN md USING (event_type)
        |ORDER BY wm.event_type, wm.day""".stripMargin
  )
}
