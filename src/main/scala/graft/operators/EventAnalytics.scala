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
    * reach the parquet scan (PushedFilters + pruned ReadSchema).
    *
    * `charge` rounds to cents on an INTEGER decision — `round(x·100)` to
    * scale 0 — not `round(x, 2)`: scale-2 rounding of a raw double is the
    * one place the engines may disagree (Spark decides on the decimal
    * shortest-string, DuckDB on the binary value, and a .xx5 boundary is
    * not binary-representable — two rows at sf0.1 flipped their last
    * cent, caught by the r16 cross-scale sweep). Scale-0 rounding is
    * cross-engine safe: a shortest-repr of ".5" implies the binary value
    * IS exactly .5, where both engines round up. */
  def filterProject(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(expr("l_shipdate >= TIMESTAMP '2000-01-01'") &&
        expr("l_shipdate < TIMESTAMP '2000-02-01'") &&
        col("l_discount") > 0.05 && col("l_quantity") < 25)
      .select(col("l_orderkey"), col("l_linenumber"),
        (round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax")) * 100).cast("long") / 100.0).as("charge"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Shared per-series delta pipeline for the PromQL family: lag-window
    * deltas on the (name, user label) series key with the counter-reset
    * rule. One definition so q82 and q83 can never desynchronize. */
  private def seriesDeltas(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("name"), col("user_id"))
      .orderBy(col("tus"), col("value"))
    Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type").as("name"), col("user_id"),
        unix_micros(col("ts")).as("tus"), col("value"))
      .withColumn("delta", col("value") - lag(col("value"), 1).over(w))
      .withColumn("dt", col("tus") - lag(col("tus"), 1).over(w))
      .withColumn("inc",
        when(col("delta").isNull, lit(null))
          .when(col("delta") < 0, col("value")) // counter reset: restart from 0
          .otherwise(col("delta")))
  }

  /** Integer floor division with DuckDB `//` semantics. Spark's `div`
    * truncates toward zero, so negative (pre-1970) microsecond timestamps
    * land one bucket HIGHER than the oracle's floor division (ADVICE r09).
    * `(a - pmod(a, n)) / n` floors for all signs — pmod is non-negative —
    * and stays exact: the numerator is an exact multiple of n below 2^53. */
  private def floorDiv(a: org.apache.spark.sql.Column, n: Long): org.apache.spark.sql.Column =
    ((a - pmod(a, lit(n))) / lit(n)).cast("long")

  /** Rate guarded against an all-same-timestamp series: sum(dt) = 0 must
    * yield NULL in BOTH engines (Spark's non-ANSI divide gives NULL, but
    * DuckDB's IEEE division would give ±inf/NaN — mirrored by an explicit
    * CASE in the oracle). */
  private def safeRate: org.apache.spark.sql.Column =
    when(sum(col("dt")) > 0,
      round(sum(col("inc")) / (sum(col("dt")) / lit(1e6)), 6))

  /** PromQL-style `increase`/`rate` with counter-reset handling — the
    * query the reference's actual consumers run over its output stream
    * (a Prometheus counter that restarts begins again at ~0; a negative
    * delta therefore means "the full new value accumulated since reset",
    * PromQL's extrapolation-free core rule). Series key = (name, user
    * label), exactly the relay's data model (`record.go:8-13`). Shape: one
    * shuffle on the series key for the lag window, then a partial+final
    * aggregate — per-series state is one previous sample; at 100 TB this
    * is the canonical "sessionized scan" plan, and the deterministic
    * (ts, value) ordering makes same-timestamp samples reproducible. */
  def promRate(spark: SparkSession, dir: String): DataFrame =
    seriesDeltas(spark, dir)
      .withColumn("reset", when(col("delta") < 0, 1).otherwise(0))
      .groupBy(col("name"))
      .agg(count(lit(1)).as("n_samples"),
        sum(col("reset")).cast("long").as("n_resets"),
        round(sum(col("inc")), 2).as("total_increase"),
        safeRate.as("rate_per_sec"))
      .orderBy(col("name"))

  /** PromQL `topk(3, rate(...))`: the q82 rate computed PER SERIES, then
    * the top series per metric — the composition every Prometheus
    * dashboard runs. Rates are rounded BEFORE ranking so the float sum's
    * last-ulp noise can't flip rank order between engines (the q74 rule). */
  def promTopkRate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wr = Window.partitionBy(col("name"))
      .orderBy(col("rate_per_sec").desc, col("user_id"))
    seriesDeltas(spark, dir)
      .groupBy(col("name"), col("user_id"))
      .agg(safeRate.as("rate_per_sec"))
      .filter(col("rate_per_sec").isNotNull)
      .withColumn("rn", row_number().over(wr))
      .filter(col("rn") <= 3)
      .select(col("name"), col("user_id"), col("rate_per_sec"), col("rn"))
      .orderBy(col("name"), col("rn"))
  }

  /** PromQL range-window gauges — `sum/max/min_over_time` per metric per
    * hour (plus active-series count, Prometheus's cardinality metric; sum
    * rather than avg because a 2-3-sample float average rounds on decimal
    * half-boundaries differently per engine's summation order — sum at 2
    * decimals is boundary-safe, and avg = sum/n is consumer-side).
    * Pure tumbling-window aggregate: partial map-side combine, one shuffle
    * on (name, hour) — uniform keys, bounded state, the cheapest possible
    * shape for "dashboard panels over the relay stream". */
  def promOverTime(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type").as("name"), col("user_id"),
        timestamp_micros(floorDiv(unix_micros(col("ts")), 3600000000L) * lit(3600000000L))
          .as("hour"),
        col("value"))
      .groupBy(col("name"), col("hour"))
      .agg(count(lit(1)).as("n_samples"),
        round(sum(col("value")), 2).as("sum_over_time"),
        round(max(col("value")), 4).as("max_over_time"),
        round(min(col("value")), 4).as("min_over_time"),
        countDistinct(col("user_id")).as("n_series"))
      .orderBy(col("name"), col("hour"))
      .limit(200)

  /** q171 — gap-fill + LINEAR INTERPOLATION onto an aligned 1 h grid per
    * metric: the resampling that turns irregular samples into the regular
    * frame ML feature pipelines join on, and the interpolating dual of the
    * PromQL lookback (which is last-value-only, q96). The Spark-first
    * shape is the UNION trick: inject grid points as null-valued rows,
    * sort ONCE per series, and carry the bracketing samples with
    * last/first(ignoreNulls) over the preceding/following frames of the
    * SAME window order — O(n log n) per series, where the naive
    * grid⋈samples as-of pair expansion is |grid|·|samples|. The grid is
    * clamped inside each series' sample span, so every point is bracketed
    * and no extrapolation is invented. Order ties are totalized
    * ((tus, is_grid, value) — a same-timestamp sample sorts before its
    * grid point, making on-sample grid values exact); the lerp is one
    * rounded emission (q74 discipline, signed-zero guarded). */
  def gapFill(spark: SparkSession, dir: String): DataFrame =
    gapFillCore(
      Tables(spark, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("event_type").as("name"), unix_micros(col("ts")).as("tus"),
          col("value")),
      keys = Seq("name"), step = 3600000000L)

  /** q175 — the SAME gap-fill at per-(metric, user) series granularity on
    * a daily grid: q171's 5-metric corpus caps its window parallelism at
    * 5 partitions; this variant runs the identical plan over ~150× the
    * key cardinality, which is the regime the operator actually ships in
    * (one series per entity). Nothing else changes — same core, same
    * oracle shape — the point is that per-series cost is the SORT of that
    * series' rows, so throughput scales with series count × executor
    * slots, not with any global structure. */
  def gapFillPerUser(spark: SparkSession, dir: String): DataFrame =
    gapFillCore(
      Tables(spark, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("event_type").as("name"), col("user_id"),
          unix_micros(col("ts")).as("tus"), col("value")),
      keys = Seq("name", "user_id"), step = 86400000000L)

  private[graft] def gapFillCore(s: DataFrame, keys: Seq[String], step: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kc = keys.map(col)
    val grid = s.groupBy(kc: _*)
      .agg(min(col("tus")).as("mn"), max(col("tus")).as("mx"))
      .withColumn("gmin", expr(s"((mn + ${step - 1}L) div ${step}L) * ${step}L"))
      .withColumn("gmax", expr(s"(mx div ${step}L) * ${step}L"))
      .filter(col("gmin") <= col("gmax"))
      .select(kc :+ explode(expr(s"sequence(gmin, gmax, ${step}L)")).as("tus"): _*)
    val u = s.select(kc ++ Seq(col("tus"), col("value"), lit(0).as("is_grid")): _*)
      .unionAll(grid.select(kc ++ Seq(col("tus"),
        lit(null).cast("double").as("value"), lit(1).as("is_grid")): _*))
    // Both bracket lookups are RUNNING frames (unbounded-preceding →
    // current): the next-side uses the REVERSED order rather than a
    // [current, unbounded-following] frame, which Spark's WindowExec
    // executes as a per-row re-scan — O(n²) per series (measured: 200 s at
    // sf0.1; this form is 0.5 s). The reversed preceding-set equals the
    // forward following-set row-for-row (grid rows sort after same-ts
    // samples forward, before them reversed — exactly the strict-next
    // semantics the pt = tus guard expects), so the oracle keeps the
    // forward following-frame form and hashes identically.
    val wp = Window.partitionBy(kc: _*)
      .orderBy(col("tus").asc, col("is_grid").asc, col("value").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wn = Window.partitionBy(kc: _*)
      .orderBy(col("tus").desc, col("is_grid").desc, col("value").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    u.withColumn("pv", last(col("value"), ignoreNulls = true).over(wp))
      .withColumn("pt",
        last(when(col("is_grid") === 0, col("tus")), ignoreNulls = true).over(wp))
      .withColumn("nv", last(col("value"), ignoreNulls = true).over(wn))
      .withColumn("nt",
        last(when(col("is_grid") === 0, col("tus")), ignoreNulls = true).over(wn))
      .filter(col("is_grid") === 1)
      // pt = tus ⇔ a sample sits ON the grid point (it sorts before the
      // grid row, so pv already carries it — and the next-side window may
      // legitimately see nothing when that sample ends the series)
      .select(kc ++ Seq(timestamp_micros(col("tus")).as("grid_ts"),
        (round(when(col("pt") === col("tus"), col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            ((col("tus") - col("pt")).cast("double")
              / (col("nt") - col("pt")).cast("double"))), 6) + lit(0.0)).as("value")): _*)
      .orderBy(kc :+ col("grid_ts"): _*)
  }

  /** PromQL instant-vector family — `irate`, `idelta`, `delta`: the
    * last-two-samples operators (prometheus `functions.go` instantValue:
    * irate/idelta read ONLY the final two points in range; delta is
    * last−first with gauge semantics, no reset rule). Shares
    * [[seriesDeltas]] with q82/q83 so the reset rule can't drift, then
    * keeps just each series' newest delta row via a descending
    * `row_number` — same tiebreak (ts, value) as the delta window itself,
    * so duplicate-timestamp scrapes pick the same "last" row in both
    * engines. One shuffle on the series key; the three window functions
    * (rank, first-value, count) all share its partitioning. */
  def promInstant(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wDesc = Window.partitionBy(col("name"), col("user_id"))
      .orderBy(col("tus").desc, col("value").desc)
    val wAsc = Window.partitionBy(col("name"), col("user_id"))
      .orderBy(col("tus"), col("value"))
    val wAll = Window.partitionBy(col("name"), col("user_id"))
    seriesDeltas(spark, dir)
      .withColumn("rn", row_number().over(wDesc))
      .withColumn("first_v", first(col("value")).over(wAsc))
      .withColumn("n_samples", count(lit(1)).over(wAll))
      .filter(col("rn") === 1)
      .select(col("name"), col("user_id"),
        when(col("dt") > 0, round(col("inc") / (col("dt") / lit(1e6)), 6))
          .as("irate_per_sec"),
        round(col("delta"), 4).as("idelta"),
        round(col("value") - col("first_v"), 4).as("delta_over_time"),
        col("n_samples"))
      .orderBy(col("name"), col("user_id"))
      .limit(300)
  }

  /** PromQL `predict_linear` + `quantile_over_time` per series: least-
    * squares extrapolation 5 minutes past each series' last sample
    * (prometheus `functions.go` linearRegression) and the exact
    * interpolated p90 — the capacity-planning pair. The regression runs on
    * PER-SERIES-CENTERED seconds (x = t − min(t)): epoch-microsecond x
    * values would put var(x) ~1e30 on a ~1e15 mean, where float
    * cancellation makes cov/var engine-divergent; centered, both engines
    * agree to 6 decimals. `regr_slope`/`regr_intercept` are Spark-native
    * declarative aggregates (codegen'd, mergeable partials — one shuffle
    * with map-side combine); single-sample and single-instant series yield
    * NULL slope in both engines (0/0 division) and are filtered by the
    * n ≥ 2 contract. */
  def promPredictLinear(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("name"), col("user_id"))
    val centered = Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type").as("name"), col("user_id"),
        unix_micros(col("ts")).as("tus"), col("value"))
      .withColumn("t0", min(col("tus")).over(w))
      .withColumn("x", (col("tus") - col("t0")) / lit(1e6))
    centered.groupBy(col("name"), col("user_id"))
      .agg(count(lit(1)).as("n_samples"),
        regr_slope(col("value"), col("x")).as("slope_raw"),
        regr_intercept(col("value"), col("x")).as("icept_raw"),
        max(col("x")).as("x_end"),
        expr("percentile(value, 0.9)").as("p90_raw"))
      .filter(col("n_samples") >= 2)
      .select(col("name"), col("user_id"), col("n_samples"),
        // `+ 0.0` normalizes IEEE signed zero: a raw slope of ~-1e-9 rounds
        // to -0.0 in DuckDB but +0.0 in Spark — value-equal, bit-unequal, so
        // the driver's bitwise hash diverges. `-0.0 + 0.0 = +0.0` in both
        // engines; applied to every rounded double on both sides.
        (round(col("slope_raw"), 6) + lit(0.0)).as("slope_per_sec"),
        (round(col("icept_raw"), 4) + lit(0.0)).as("intercept"),
        (round(col("icept_raw") + col("slope_raw") * (col("x_end") + lit(300)), 4)
          + lit(0.0)).as("predict_5m"),
        (round(col("p90_raw"), 4) + lit(0.0)).as("p90_over_time"))
      .orderBy(col("name"), col("user_id"))
      .limit(300)
  }

  /** PromQL `histogram_quantile` — bucketed estimation, the way every
    * Prometheus latency SLO is actually computed: samples land in
    * cumulative `le` buckets ([1,2,5,10,25,50,100,+Inf] here, a standard
    * latency ladder), and the quantile is linearly interpolated INSIDE the
    * first bucket whose cumulative count reaches q·total (prometheus
    * promql/quantile.go bucketQuantile: uniform-within-bucket assumption,
    * +Inf clamps to the highest finite bound). This is the mergeable,
    * fixed-size alternative to exact percentiles (q56) — bucket counts
    * combine map-side and across time windows, which is why Prometheus
    * chose the representation. Batch analogue over each (metric, hour)'s
    * raw samples (server-side PromQL runs it on bucket-counter RATES; the
    * interpolation math is identical).
    *
    * One shuffle to (name, hour, le) counts with map-side combine, then
    * two window passes sharing the (name, hour) partitioning; the bucket
    * ladder bounds per-group state at 8 rows regardless of sample count. */
  /** The `le` ladder shared by batch q98 and the streaming twin
    * (`streaming/StreamingHistogramQuantile`): one definition so the two
    * execution modes cannot disagree on bucket bounds. +Inf is 1e9. */
  val HistBuckets: Seq[Double] = Seq(1.0, 2.0, 5.0, 10.0, 25.0, 50.0, 100.0)

  def promHistogramQuantile(spark: SparkSession, dir: String, q: Double = 0.95): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("name"), col("hour")).orderBy(col("le"))
    val wAll = Window.partitionBy(col("name"), col("hour"))
    val leCol = HistBuckets.foldRight(lit(1e9): org.apache.spark.sql.Column) {
      (bound, rest) => when(col("value") <= bound, bound).otherwise(rest)
    }
    val buckets = Tables(spark, dir, "events")
      .filter(col("value").isNotNull && col("value") >= 0)
      .select(col("event_type").as("name"),
        timestamp_micros(floorDiv(unix_micros(col("ts")), 3600000000L) * lit(3600000000L))
          .as("hour"),
        col("value"))
      .withColumn("le", leCol)
    // `lo` is the previous LADDER bound, not the previous non-empty
    // bucket: promql's bucketQuantile interpolates inside [lo(le), le]
    // even when intermediate buckets are empty (they only pass cumulative
    // count through). A lag() over the non-empty rows would widen the
    // interpolation span and misplace the estimate.
    val loCol = HistBuckets.zip(0.0 +: HistBuckets.init)
      .foldRight(lit(HistBuckets.last): org.apache.spark.sql.Column) {
        case ((bound, prev), rest) => when(col("le") === bound, prev).otherwise(rest)
      }
    buckets.groupBy(col("name"), col("hour"), col("le")).agg(count(lit(1)).as("cnt"))
      .withColumn("cumcnt", sum(col("cnt")).over(w))
      .withColumn("total", sum(col("cnt")).over(wAll))
      .withColumn("lo", loCol)
      .withColumn("cumlo", col("cumcnt") - col("cnt"))
      .filter(col("cumcnt") >= lit(q) * col("total"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("name"), col("hour"), col("total").cast("long").as("n_samples"),
        round(when(col("le") >= 1e9, lit(100.0))
          .otherwise(col("lo") + (col("le") - col("lo")) *
            ((lit(q) * col("total") - col("cumlo")) / col("cnt"))), 4).as("p95"))
      .orderBy(col("name"), col("hour"))
      .limit(200)
  }

  /** PromQL binary operation with vector matching —
    * `rate(error[...]) / rate(click[...])` matched `on(user)`: the
    * error-budget-burn query every SLO dashboard runs. PromQL's binary-op
    * semantics over instant vectors are relational: evaluate each side,
    * equi-join on the matching label set (one-to-one here; unmatched
    * series DROP, the default inner-join behavior — promql/engine.go
    * VectorBinop), apply the scalar op. Both sides reuse the exact q82
    * rate pipeline ([[seriesDeltas]] + [[safeRate]]) so the reset rule
    * cannot drift from the rest of the family; null rates (single-instant
    * series) drop like PromQL drops NaN-producing sides.
    *
    * Scale shape: the naive form joins two branches that each re-derive
    * the scan + delta window; instead the label match is a PIVOT — one
    * scan, one per-series rate aggregate, one (user) pivot aggregate.
    * The "join" collapses into the pivot's group-by on the matching label
    * (inner-join drop = both pivot columns non-null), so the only
    * series-cardinality shuffle is the pivot's, on the uniform user key.
    * This is the general evaluation trick for promql binary ops on a
    * columnar engine: vector matching is a pivot, not a self-join. */
  def promVectorRatio(spark: SparkSession, dir: String): DataFrame =
    seriesDeltas(spark, dir)
      .filter(col("name").isin("error", "click"))
      .groupBy(col("name"), col("user_id"))
      .agg(safeRate.as("rate_per_sec"))
      .filter(col("rate_per_sec").isNotNull)
      .groupBy(col("user_id"))
      .pivot("name", Seq("error", "click"))
      .agg(first(col("rate_per_sec")))
      .filter(col("error").isNotNull && col("click").isNotNull)
      .select(col("user_id"), col("error").as("error_rate"),
        col("click").as("click_rate"),
        round(col("error") / col("click"), 6).as("ratio"))
      .orderBy(col("user_id"))
      .limit(300)

  /** PromQL RANGE-QUERY evaluation — `sum by (name) (rate(m[24h]))` on an
    * aligned 6-hour step grid: the shape every Grafana panel actually
    * issues (a range query = the grid of instant evaluations at
    * `start/end/step`, promql/engine.go rangeEval). Per-series increase
    * uses the family's shared reset rule; each sample then lands in the
    * ≤ ⌈w/step⌉+1 aligned steps whose trailing window [s−w, s] contains
    * it — a BOUNDED explode (5 rows/sample here), the dual of q91's
    * bucketed range join: turn "for each step, which samples?" into
    * "for each sample, which steps?" so the grid never joins against the
    * sample table. One shuffle onto (name, step) with map-side combine.
    * Extrapolation-free core rule as everywhere in this family (increase
    * is the sum of in-window deltas; rate divides by the window). */
  def promRangeEval(spark: SparkSession, dir: String,
                    stepSec: Long = 21600L, windowSec: Long = 86400L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("name"), col("user_id"))
      .orderBy(col("tsec"), col("value"))
    val incs = Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type").as("name"), col("user_id"),
        floorDiv(unix_micros(col("ts")), 1000000L).as("tsec"), col("value"))
      .withColumn("delta", col("value") - lag(col("value"), 1).over(w))
      .withColumn("inc", when(col("delta").isNull, lit(null))
        .when(col("delta") < 0, col("value")).otherwise(col("delta")))
      .filter(col("inc").isNotNull)
    incs
      .select(col("name"), col("user_id"), col("inc"),
        explode(sequence(
          floorDiv(col("tsec") + lit(stepSec - 1), stepSec) * lit(stepSec),
          floorDiv(col("tsec") + lit(windowSec), stepSec) * lit(stepSec),
          lit(stepSec))).as("step"))
      .groupBy(col("name"), col("step").as("step_sec"))
      .agg(countDistinct(col("user_id")).as("n_series"),
        count(lit(1)).as("n_samples"),
        round(sum(col("inc")), 2).as("total_increase"))
      // rate from the ROUNDED total: the raw float sum differs across
      // engines in the last ulp, which flips round(x, 6) on exact
      // half-boundaries; the 2-dp total is identical on both sides
      .withColumn("rate_per_sec", round(col("total_increase") / windowSec, 6))
      .orderBy(col("name"), col("step_sec"))
      .limit(500)
  }

  /** PromQL MANY-TO-ONE vector matching —
    * `rate(m[...]) / on(user) group_left(segment) user_quota`: the other
    * matching cardinality every real dashboard hits (promql/engine.go
    * VectorBinop, `CardManyToOne` branch). The "many" side is the
    * per-(metric, user) rate vector (the family's shared q82 pipeline);
    * the "one" side is a per-user info vector — unique on the matching
    * label by PromQL contract (duplicate match labels are a hard error) —
    * whose extra `segment` label is COPIED onto every matched many-side
    * row (`group_left(segment)`) and whose value scales it (rate per
    * account quota). Unmatched rows on either side drop (inner).
    *
    * Scale shape: the one side is an aggregate over the matching label —
    * small by construction (≤ one row per label value, here per user) —
    * so the match is a BROADCAST hash join: zero shuffle of the many side
    * beyond its own rate aggregate, no matter how many series it has.
    * That broadcast is exactly how a 1000-executor cluster wants
    * `group_left` evaluated, and `PlanRegressionSpec` pins it.
    * (`group_right` is this operator with the sides swapped — promql
    * normalizes it to the group_left form before eval, and so would we:
    * same plan, the broadcast still lands on the "one" side.) */
  def promGroupLeft(spark: SparkSession, dir: String): DataFrame = {
    val rates = seriesDeltas(spark, dir)
      .groupBy(col("name"), col("user_id"))
      .agg(safeRate.as("rate_per_sec"))
      .filter(col("rate_per_sec").isNotNull)
    val info = Tables(spark, dir, "customer")
      .select(col("c_custkey").as("user_id"),
        col("c_mktsegment").as("segment"),
        round(abs(col("c_acctbal")) + lit(1.0), 2).as("quota"))
    rates.join(broadcast(info), Seq("user_id"))
      .select(col("name"), col("user_id"), col("segment"), col("rate_per_sec"),
        round(col("rate_per_sec") / col("quota"), 6).as("rate_per_quota"))
      .orderBy(col("name"), col("user_id"))
      .limit(300)
  }

  /** PromQL `offset` + `absent()` — the two instant-vector modifiers left
    * in the family (promql/engine.go evalVectorSelector's offset shift;
    * functions.go funcAbsent). `m offset 1w` evaluates the selector at
    * eval_ts − offset, i.e. each series' newest sample at or before the
    * shifted instant — the week-over-week comparison every SLO review
    * runs (`m - m offset 1w`). `absent(m)` is the alerting dual: 1 when
    * NO series matches the selector — here an anti-join of an expected
    * metric catalog against the live series set, the batch twin of the
    * streaming staleness operator (`StreamingStaleness`).
    *
    * ONE scan, one shuffle: both the "now" and the "offset" picks are a
    * single conditional struct-max aggregate — max((ts, value)) per
    * series, and the same max over only the rows at or before the shifted
    * instant — so the selector never re-reads or re-sorts the input (the
    * row_number formulation would window-sort events twice). eval_ts is
    * the corpus' newest sample, a 1-row broadcast scalar (never a driver
    * collect); the aggregated per-series picks (series-cardinality, tiny)
    * persist to feed both the diff rows and the absent anti-join, and the
    * 7-row catalog broadcasts. Struct max compares (ts, value)
    * lexicographically in both engines — the family tiebreak, so
    * duplicate-timestamp picks are engine-reproducible. */
  def promOffsetAbsent(spark: SparkSession, dir: String,
                       offsetSec: Long = 604800L): DataFrame = {
    val samples = Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type").as("name"), col("user_id"),
        unix_micros(col("ts")).as("tus"), col("value"))
    val evalTs = samples.agg(max(col("tus")).as("eval_tus"))
    val picks = samples
      .crossJoin(broadcast(evalTs)) // 1-row scalar: the evaluation instant
      .groupBy(col("name"), col("user_id"))
      .agg(
        max(struct(col("tus"), col("value"))).getField("value").as("v_now"),
        max(when(col("tus") <= col("eval_tus") - lit(offsetSec * 1000000L),
          struct(col("tus"), col("value")))).getField("value").as("v_prev"))
      // series-cardinality; serves the diff AND absent branches. Eager
      // localCheckpoint, not persist(): the returned plan references this
      // frame lazily, so a persist() could never be unpersisted here and
      // would leak a CacheManager entry across the suite (VERDICT r13 #3
      // class); checkpoint blocks are ContextCleaner-reclaimed.
      .localCheckpoint(true)
    // `m - m offset 1w` is a binary op: series with no sample at or
    // before the shifted instant drop (inner-join semantics).
    val diffs = picks.filter(col("v_prev").isNotNull)
      .select(col("name"), col("user_id"), col("v_now"), col("v_prev"),
        // + 0.0 normalizes signed zero (the q97 rule): a diff of ~-1e-9
        // rounds to -0.0 in DuckDB, +0.0 in Spark.
        (round(col("v_now") - col("v_prev"), 4) + lit(0.0)).as("diff_1w"),
        lit(0L).as("absent"))
    import spark.implicits._
    val catalog = ExpectedMetrics.toDF("name")
    val absent = catalog.join(
        picks.select(col("name")).distinct(), Seq("name"), "left_anti")
      .select(col("name"), lit(null).cast("long").as("user_id"),
        lit(null).cast("double").as("v_now"),
        lit(null).cast("double").as("v_prev"),
        lit(null).cast("double").as("diff_1w"),
        lit(1L).as("absent"))
    // absent rows first: they are the alert signal, and a LIMIT must
    // never be able to cut them off behind hundreds of diff rows.
    diffs.unionAll(absent)
      .orderBy(col("absent").desc, col("name"), col("user_id"))
      .limit(400)
  }

  /** The alert catalog `absent()` checks: the five live metrics plus two
    * that never report — the rows a Prometheus alert would fire on. */
  val ExpectedMetrics: Seq[String] =
    Seq("click", "error", "purchase", "signup", "view",
      "latency_p99", "gc_seconds")

  /** PromQL SUBQUERY evaluation — `max_over_time(rate(m[24h])[*:6h])` per
    * series: the nested-eval shape (promql/engine.go evalSubquery) that
    * turns "what is the rate now" into "what was the WORST rate" — the
    * query behind every burn-rate alert window. A subquery evaluates the
    * inner expression at every aligned step of its resolution, producing
    * an intermediate range vector, then the outer `_over_time` function
    * aggregates those step values per series. Here: the inner rate grid
    * is q100's bounded sample→step explode evaluated PER SERIES (each
    * reset-corrected increase lands in the ≤ ⌈w/step⌉+1 steps whose
    * trailing window holds it); the outer max/avg folds each series' grid
    * column. `[*:6h]` = the subquery spans the whole corpus retention
    * (an explicit range bound would add q102's 1-row broadcast scalar —
    * composition, not new machinery).
    *
    * The intermediate range vector is held as INTEGER micro-rates
    * (round(inc·1e6/w) per step, from the 2-dp total — the q100
    * contract): a nested eval aggregates ALREADY-AGGREGATED floats, and
    * summing 6-dp doubles in engine-specific order flips round(avg, 4)
    * on exact half-boundaries (measured: 1 series in 300 at sf0.01).
    * Integer step values make the outer sum exact, so max and avg divide
    * IDENTICAL operands in both engines — the only way a nested float
    * eval stays bit-reproducible. ONE scan, two shuffles ((name,user)
    * deltas → (name,user,step) partials), then the outer fold rides the
    * same (name,user) clustering. */
  def promSubquery(spark: SparkSession, dir: String,
                   stepSec: Long = 21600L, windowSec: Long = 86400L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("name"), col("user_id"))
      .orderBy(col("tsec"), col("value"))
    val stepRates = Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type").as("name"), col("user_id"),
        floorDiv(unix_micros(col("ts")), 1000000L).as("tsec"), col("value"))
      .withColumn("delta", col("value") - lag(col("value"), 1).over(w))
      .withColumn("inc", when(col("delta").isNull, lit(null))
        .when(col("delta") < 0, col("value")).otherwise(col("delta")))
      .filter(col("inc").isNotNull)
      .select(col("name"), col("user_id"), col("inc"),
        explode(sequence(
          floorDiv(col("tsec") + lit(stepSec - 1), stepSec) * lit(stepSec),
          floorDiv(col("tsec") + lit(windowSec), stepSec) * lit(stepSec),
          lit(stepSec))).as("step"))
      .groupBy(col("name"), col("user_id"), col("step"))
      .agg(round(sum(col("inc")), 2).as("inc2"))
      .withColumn("rate_ppm",
        round(col("inc2") * lit(1e6) / windowSec, 0).cast("long"))
    stepRates.groupBy(col("name"), col("user_id"))
      .agg(count(lit(1)).as("n_steps"),
        (max(col("rate_ppm")) / lit(1e6)).as("max_rate"),
        round(sum(col("rate_ppm")) / (count(lit(1)) * lit(1e6)), 4).as("avg_rate"))
      .orderBy(col("name"), col("user_id"))
      .limit(300)
  }

  /** PromQL label manipulation + output shaping — `label_replace`,
    * `label_join`, `clamp`, `bottomk`: the four output-shaping operators a
    * dashboard applies after the math (prometheus functions.go
    * funcLabelReplace/funcLabelJoin/funcClampMin/funcClampMax; the bottomk
    * branch of engine.go's aggregation heap). `label_replace` derives a
    * `tier` label from the leading digit of the user label (regex capture,
    * as the real function does on arbitrary label text); `label_join`
    * concatenates (name, tier) into a `series` identity; `clamp` bounds
    * the rate into [1e-4, 3e-4] (both bounds inside the observed rate
    * distribution, so floor and ceiling each do real work); `bottomk(3)`
    * keeps each metric's three SLOWEST series — ranked on the 6-dp rate
    * (deterministic across engines), the ascending dual of q83's topk.
    *
    * All four are pure projections over the family's shared rate vector:
    * zero shuffles beyond q83's shape (series agg + per-name rank window),
    * and the regex runs on the already-aggregated series-cardinality
    * vector, never per sample — at 100 TB the label ops cost nothing. */
  def promLabelOps(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wb = Window.partitionBy(col("name"))
      .orderBy(col("rate_per_sec"), col("user_id"))
    seriesDeltas(spark, dir)
      .groupBy(col("name"), col("user_id"))
      .agg(safeRate.as("rate_per_sec"))
      .filter(col("rate_per_sec").isNotNull)
      .withColumn("tier",
        concat(lit("t"), regexp_extract(col("user_id").cast("string"), "^(\\d)", 1)))
      .withColumn("series", concat_ws(":", col("name"), col("tier")))
      .withColumn("rate_clamped",
        least(greatest(col("rate_per_sec"), lit(0.0001)), lit(0.0003)))
      .withColumn("rn", row_number().over(wb))
      .filter(col("rn") <= 3)
      .select(col("name"), col("user_id"), col("tier"), col("series"),
        col("rate_clamped"), col("rn"))
      .orderBy(col("name"), col("rn"))
  }

  /** PromQL counter-hygiene family — `changes()`, `resets()`,
    * `stddev_over_time`, `last_over_time` per series (prometheus
    * functions.go funcChanges/funcResets/funcStddevOverTime/
    * funcLastOverTime): the fleet-health query that finds flapping gauges
    * and crash-looping counters. `changes` counts non-zero deltas and
    * `resets` negative ones — both ride [[seriesDeltas]]' single window
    * pass; `last_over_time` is the q102 struct-max pick, so no second
    * sort; `stddev_pop` matches promql's population semantics (Spark and
    * DuckDB both use mergeable central-moment partials). One shuffle on
    * the series key; everything else combines map-side. */
  def promChangesResets(spark: SparkSession, dir: String): DataFrame =
    seriesDeltas(spark, dir)
      .groupBy(col("name"), col("user_id"))
      .agg(count(lit(1)).as("n_samples"),
        sum(when(col("delta").isNotNull && col("delta") =!= 0, 1).otherwise(0))
          .cast("long").as("n_changes"),
        sum(when(col("delta") < 0, 1).otherwise(0)).cast("long").as("n_resets"),
        (round(stddev_pop(col("value")), 4) + lit(0.0)).as("stddev_over_time"),
        max(struct(col("tus"), col("value"))).getField("value").as("last_over_time"))
      .orderBy(col("name"), col("user_id"))
      .limit(300)

  /** PromQL `holt_winters` (a.k.a. double_exponential_smoothing since
    * prometheus v3) — per-series level+trend smoothing with sf=0.3,
    * tf=0.1 (functions.go funcDoubleExponentialSmoothing/calcTrendValue:
    * s1 seeds at the first sample, the trend seeds at v1−v0, then each
    * step folds x = sf·v_i, b = tf·(s1−s0)+(1−tf)·b, y = (1−sf)·(s1+b)).
    *
    * The recurrence is inherently sequential PER SERIES — the shape that
    * tempts a driver-side loop — but per-series sample count is bounded
    * by retention (the same assumption PromQL's own in-memory evaluation
    * makes), so it distributes as: one shuffle to (name, user), sort the
    * collected samples as an array, and run the fold as a higher-order
    * `aggregate` expression — codegen-evaluated per row, no UDF, no
    * driver involvement, series-parallel across the cluster. Both engines
    * execute the identical IEEE op sequence over the identically-sorted
    * array ((t, v) lexicographic — the family tiebreak), so the raw
    * doubles match bit-for-bit before rounding; the smoothing constants
    * are spelled as the same literals (0.3/0.7/0.1/0.9) on both sides
    * because `1 - 0.3` computed at runtime is NOT the double `0.7`. */
  def promHoltWinters(spark: SparkSession, dir: String): DataFrame = {
    val arr = Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type").as("name"), col("user_id"),
        unix_micros(col("ts")).as("t"), col("value").as("v"))
      .groupBy(col("name"), col("user_id"))
      .agg(count(lit(1)).as("n_samples"),
        array_sort(collect_list(struct(col("t"), col("v")))).as("samples"))
      .filter(col("n_samples") >= 2)
    arr.select(col("name"), col("user_id"), col("n_samples"),
        expr("""
          aggregate(
            slice(samples, 2, size(samples) - 1),
            named_struct('s0', cast(0.0 as double),
                         's1', element_at(samples, 1).v,
                         'b',  cast(0.0 as double),
                         'n',  cast(1 as bigint)),
            (acc, e) -> CASE WHEN acc.n = 1
              THEN named_struct('s0', acc.s1,
                     's1', 0.3 * e.v + 0.7 * (acc.s1 + (e.v - acc.s1)),
                     'b',  e.v - acc.s1,
                     'n',  cast(2 as bigint))
              ELSE named_struct('s0', acc.s1,
                     's1', 0.3 * e.v + 0.7 * (acc.s1 + (0.1 * (acc.s1 - acc.s0) + 0.9 * acc.b)),
                     'b',  0.1 * (acc.s1 - acc.s0) + 0.9 * acc.b,
                     'n',  acc.n + 1) END)
        """).as("hw"))
      .select(col("name"), col("user_id"), col("n_samples"),
        (round(col("hw.s1"), 4) + lit(0.0)).as("smoothed"),
        (round(col("hw.b"), 4) + lit(0.0)).as("trend"))
      .orderBy(col("name"), col("user_id"))
      .limit(300)
  }

  /** Shared integer micro-rate vector: each series' 6-dp rate as a LONG
    * ppm count (the q103 contract — integer cross-series arithmetic is
    * order-independent, so downstream aggregates divide IDENTICAL
    * operands in both engines regardless of partial-combine order). */
  private def seriesRatesPpm(spark: SparkSession, dir: String): DataFrame =
    seriesDeltas(spark, dir)
      .groupBy(col("name"), col("user_id"))
      .agg(safeRate.as("rate_per_sec"))
      .filter(col("rate_per_sec").isNotNull)
      .withColumn("ppm", round(col("rate_per_sec") * lit(1e6), 0).cast("long"))

  /** PromQL cross-series AGGREGATION operators — `count`, `avg`, `stddev`,
    * `stdvar`, `quantile(0.5/0.9, …)`, `group` over the per-series rate
    * vector, grouped by metric (promql/engine.go aggregation: the operator
    * set beyond the sum/topk/bottomk already covered by q100/q83/q104).
    * `stddev`/`stdvar` use population semantics, as promql does; `group`
    * is the constant-1 presence aggregator (v2.32+). Rates enter as
    * integer ppm ([[seriesRatesPpm]]) so the means and moments are built
    * from identical operands in both engines — the cross-engine sum-order
    * hazard is confined to the last-ulp of IDENTICAL integer sums, which
    * cannot flip a 4-dp round. Two shuffles total (series agg, then the
    * tiny per-name agg), both with map-side combine. */
  def promAggAcross(spark: SparkSession, dir: String): DataFrame =
    seriesRatesPpm(spark, dir)
      .groupBy(col("name"))
      .agg(count(lit(1)).as("n_series"),
        (round(avg(col("ppm")), 4) + lit(0.0)).as("avg_ppm"),
        (round(stddev_pop(col("ppm")), 4) + lit(0.0)).as("stddev_ppm"),
        (round(var_pop(col("ppm")), 4) + lit(0.0)).as("stdvar_ppm"),
        (round(expr("percentile(ppm, 0.5)"), 4) + lit(0.0)).as("p50_ppm"),
        (round(expr("percentile(ppm, 0.9)"), 4) + lit(0.0)).as("p90_ppm"),
        lit(1L).as("group_all"))
      .orderBy(col("name"))

  /** PromQL `count_values` — the value-distribution fingerprint (promql
    * aggregation with a value-derived label): how many series currently
    * report each distinct rate, keyed by the stringified value exactly as
    * the real operator materializes its new label. The canonical use is
    * spotting fleets stuck at identical values (version numbers, zeroed
    * counters). One extra tiny shuffle over the series vector; the value
    * label is formatted AFTER aggregation, on distinct-value cardinality. */
  def promCountValues(spark: SparkSession, dir: String): DataFrame =
    seriesRatesPpm(spark, dir)
      .groupBy(col("name"), col("ppm"))
      .agg(count(lit(1)).as("n_series"))
      .select(col("name"), col("ppm").cast("string").as("rate_ppm"),
        col("n_series"))
      .orderBy(col("name"), col("rate_ppm").cast("long"))
      .limit(500)

  /** PromQL `absent_over_time` + `present_over_time` on an hourly grid —
    * the alerting TIMELINE (functions.go funcAbsentOverTime/
    * funcPresentOverTime): for every expected metric and every hour of
    * the corpus, did it report? q102's `absent()` answers at one instant;
    * this is its range-vector dual, and the batch twin of the streaming
    * staleness operator's transition log ([[StreamingStaleness]]).
    *
    * The timeline is SUMMARIZED per metric — present/absent hour counts
    * plus the longest continuous absence (the number an alert's FOR
    * clause compares against) — rather than materialized as a grid of
    * hour rows: the gaps-and-islands form over each metric's distinct
    * present hours. All arithmetic is integer hour indices, so the
    * oracle comparison is exact by construction.
    *
    * Shape: the heavy input collapses FIRST — one map-side-combined
    * distinct to (name, hour) (tiny: metrics × hours) — then one window
    * pass for inner gaps, a 7-row broadcast join against the catalog,
    * and the corpus bounds ride a 1-row broadcast (never a driver
    * collect). At 100 TB nothing after the first distinct scales with
    * input rows. */
  def promAbsentOverTime(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val hourly = Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type").as("name"),
        floorDiv(unix_micros(col("ts")), 3600000000L).as("h"))
      .distinct()
      // metrics × hours cardinality; serves bounds AND gaps. Eager
      // localCheckpoint, not persist() — same leak-free discipline as
      // promOffsetAbsent (VERDICT r13 #3 class).
      .localCheckpoint(true)
    val bounds = hourly.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    // gaps-and-islands on each metric's distinct present hours: the
    // longest run of absent hours is the max of (inner gaps between
    // consecutive present hours, the leading gap from the corpus start,
    // the trailing gap to the corpus end)
    val w = Window.partitionBy(col("name")).orderBy(col("h"))
    val perMetric = hourly
      .withColumn("gap_before", col("h") - lag(col("h"), 1).over(w) - lit(1L))
      .groupBy(col("name"))
      .agg(count(lit(1)).as("present_hours"),
        coalesce(max(col("gap_before")), lit(0L)).as("inner_gap"),
        min(col("h")).as("first_h"), max(col("h")).as("last_h"))
    val catalog = ExpectedMetrics.toDF("name")
    catalog.join(broadcast(perMetric), Seq("name"), "left")
      .crossJoin(broadcast(bounds))
      .withColumn("n_hours", col("h1") - col("h0") + lit(1L))
      .select(col("name"), col("n_hours"),
        coalesce(col("present_hours"), lit(0L)).as("present_hours"),
        (col("n_hours") - coalesce(col("present_hours"), lit(0L))).as("absent_hours"),
        when(col("present_hours").isNull, col("n_hours"))
          .otherwise(greatest(col("inner_gap"),
            col("first_h") - col("h0"), col("h1") - col("last_h")))
          .as("longest_gap_hours"))
      .orderBy(col("name"))
  }

  /** PromQL time functions — `day_of_week()`/`hour()` over the sample
    * stream (prometheus functions.go funcDayOfWeek/funcHour), composed
    * into the weekly-seasonality heatmap behind capacity planning: per
    * (dow, hour) slot across the corpus, events seen, distinct live
    * series, and the mean sample value. dow follows promql's convention
    * (0 = Sunday, UTC); epoch day 0 was a Thursday, so
    * dow = (epoch_day + 4) mod 7 — pure integer arithmetic, no calendar
    * or timezone library on either engine, and floor-division/pmod all
    * the way down so pre-1970 samples bucket identically too (the q84
    * rule; the oracle mirrors pmod with a double-mod). The mean divides
    * per-row 1e-4-quantized integer sums (the q103/q107 exactness
    * contract) so both engines divide identical operands. One scan, one
    * 168-key map-side-combined shuffle; the exact series-distinct is the
    * costly half at 100 TB (Spark's two-stage distinct expansion) — the
    * mergeable-sketch trade for it is q21's HLL. */
  def promTimeFns(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .withColumn("tsec0", floorDiv(unix_micros(col("ts")), 1000000L))
      .select(col("event_type").as("name"), col("user_id"),
        round(col("value") * lit(10000), 0).cast("long").as("v4"),
        pmod(floorDiv(col("tsec0"), 86400L) + lit(4L), lit(7L)).as("dow"),
        floorDiv(pmod(col("tsec0"), lit(86400L)), 3600L).as("hour"))
      .groupBy(col("dow"), col("hour"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(concat_ws("|", col("name"), col("user_id"))).as("n_series"),
        (round(sum(col("v4")) / (lit(10000.0) * count(lit(1))), 4) + lit(0.0))
          .as("avg_value"))
      .orderBy(col("dow"), col("hour"))
  }

  val queries: Map[String, QueryFn] = Map(
    "q171_gap_fill" -> gapFill _,
    "q175_gap_fill_series" -> gapFillPerUser _,
    "q00_flagship_hourly" -> hourlyRollup _,
    "q01_filter_project" -> filterProject _,
    "q82_prom_rate" -> promRate _,
    "q83_prom_topk_rate" -> promTopkRate _,
    "q84_prom_over_time" -> promOverTime _,
    "q96_prom_instant" -> promInstant _,
    "q97_prom_predict_linear" -> promPredictLinear _,
    "q98_prom_histogram_quantile" -> ((s: SparkSession, dir: String) =>
      promHistogramQuantile(s, dir)),
    "q99_prom_vector_ratio" -> promVectorRatio _,
    "q100_prom_range_eval" -> ((s: SparkSession, dir: String) => promRangeEval(s, dir)),
    "q101_prom_group_left" -> promGroupLeft _,
    "q102_prom_offset_absent" -> ((s: SparkSession, dir: String) =>
      promOffsetAbsent(s, dir)),
    "q104_prom_label_ops" -> promLabelOps _,
    "q109_prom_absent_over_time" -> promAbsentOverTime _,
    "q107_prom_agg_across" -> promAggAcross _,
    "q108_prom_count_values" -> promCountValues _,
    "q105_prom_changes_resets" -> promChangesResets _,
    "q106_prom_holt_winters" -> promHoltWinters _,
    "q103_prom_subquery" -> ((s: SparkSession, dir: String) =>
      promSubquery(s, dir)),
    "q111_prom_time_fns" -> promTimeFns _,
    "q115_prom_deriv_math" -> promDerivMath _
  )

  /** PromQL function-surface close-out: `deriv` (per-series least-squares
    * slope — prometheus functions.go funcDeriv, the identical regression
    * behind q97's predict_linear minus the projection), `avg_over_time`,
    * the element-wise math vector functions (`abs`/`sgn`/`sqrt`/`log2`/
    * `ceil`/`floor` — functions.go's simpleCall table), and `sort_desc`
    * result ordering. The math functions are pure scalar maps applied
    * AFTER the per-series aggregate, so the plan is exactly q97's: one
    * shuffle on the series key carrying mergeable regr_* and avg partials,
    * then zero-shuffle projections — the element-wise layer adds no cost
    * at any scale. `sgn` reads the ROUNDED slope on both engines so a
    * ±1e-9 slope is sign-stable, and `sort_desc` orders by the rounded
    * value with a (name, user) tiebreak, the q74 round-before-rank rule. */
  def promDerivMath(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("name"), col("user_id"))
    Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type").as("name"), col("user_id"),
        unix_micros(col("ts")).as("tus"), col("value"))
      .withColumn("x", (col("tus") - min(col("tus")).over(w)) / lit(1e6))
      .groupBy(col("name"), col("user_id"))
      .agg(count(lit(1)).as("n_samples"),
        regr_slope(col("value"), col("x")).as("d"),
        avg(col("value")).as("avg_raw"))
      .filter(col("n_samples") >= 2)
      .select(col("name"), col("user_id"), col("n_samples"),
        (round(col("d"), 6) + lit(0.0)).as("deriv_per_sec"),
        (round(col("avg_raw"), 6) + lit(0.0)).as("avg_ot"),
        signum(round(col("d"), 6) + lit(0.0)).cast("int").as("sgn_deriv"),
        (round(sqrt(abs(col("avg_raw"))), 6) + lit(0.0)).as("sqrt_abs_avg"),
        (round(log2(abs(col("avg_raw")) + lit(1.0)), 6) + lit(0.0)).as("log2_avg"),
        ceil(col("avg_raw")).cast("long").as("ceil_avg"),
        floor(col("avg_raw")).cast("long").as("floor_avg"))
      .orderBy(col("deriv_per_sec").desc, col("name"), col("user_id"))
      .limit(300)
  }

  val oracleSql: Map[String, String] = Map(
    // same union-and-carry shape; IGNORE NULLS windows, identical total order
    "q171_gap_fill" ->
      """WITH s AS (
        |  SELECT event_type AS name, epoch_us(ts) AS tus, value
        |  FROM events WHERE value IS NOT NULL),
        |mm AS (SELECT name, min(tus) AS mn, max(tus) AS mx FROM s GROUP BY 1),
        |g AS (
        |  SELECT name,
        |         unnest(generate_series(((mn + 3599999999) // 3600000000) * 3600000000,
        |                                (mx // 3600000000) * 3600000000,
        |                                3600000000)) AS tus
        |  FROM mm
        |  WHERE ((mn + 3599999999) // 3600000000) * 3600000000
        |        <= (mx // 3600000000) * 3600000000),
        |u AS (
        |  SELECT name, tus, value, 0 AS is_grid FROM s
        |  UNION ALL
        |  SELECT name, tus, NULL, 1 FROM g),
        |f AS (
        |  SELECT *,
        |    last_value(value IGNORE NULLS) OVER w AS pv,
        |    last_value(CASE WHEN is_grid = 0 THEN tus END IGNORE NULLS) OVER w AS pt,
        |    first_value(value IGNORE NULLS) OVER wn AS nv,
        |    first_value(CASE WHEN is_grid = 0 THEN tus END IGNORE NULLS) OVER wn AS nt
        |  FROM u
        |  WINDOW w AS (PARTITION BY name ORDER BY tus, is_grid, value
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wn AS (PARTITION BY name ORDER BY tus, is_grid, value
        |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT name, make_timestamp(tus) AS grid_ts,
        |       round(CASE WHEN pt = tus THEN pv
        |                  ELSE pv + (nv - pv) *
        |                       (CAST(tus - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE)) END, 6)
        |         + 0.0 AS value
        |FROM f WHERE is_grid = 1 ORDER BY name, grid_ts""".stripMargin,
    // q171's shape at (name, user_id) granularity, daily step
    "q175_gap_fill_series" ->
      """WITH s AS (
        |  SELECT event_type AS name, user_id, epoch_us(ts) AS tus, value
        |  FROM events WHERE value IS NOT NULL),
        |mm AS (SELECT name, user_id, min(tus) AS mn, max(tus) AS mx
        |       FROM s GROUP BY 1, 2),
        |g AS (
        |  SELECT name, user_id,
        |         unnest(generate_series(((mn + 86399999999) // 86400000000) * 86400000000,
        |                                (mx // 86400000000) * 86400000000,
        |                                86400000000)) AS tus
        |  FROM mm
        |  WHERE ((mn + 86399999999) // 86400000000) * 86400000000
        |        <= (mx // 86400000000) * 86400000000),
        |u AS (
        |  SELECT name, user_id, tus, value, 0 AS is_grid FROM s
        |  UNION ALL
        |  SELECT name, user_id, tus, NULL, 1 FROM g),
        |f AS (
        |  SELECT *,
        |    last_value(value IGNORE NULLS) OVER w AS pv,
        |    last_value(CASE WHEN is_grid = 0 THEN tus END IGNORE NULLS) OVER w AS pt,
        |    first_value(value IGNORE NULLS) OVER wn AS nv,
        |    first_value(CASE WHEN is_grid = 0 THEN tus END IGNORE NULLS) OVER wn AS nt
        |  FROM u
        |  WINDOW w AS (PARTITION BY name, user_id ORDER BY tus, is_grid, value
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wn AS (PARTITION BY name, user_id ORDER BY tus, is_grid, value
        |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT name, user_id, make_timestamp(tus) AS grid_ts,
        |       round(CASE WHEN pt = tus THEN pv
        |                  ELSE pv + (nv - pv) *
        |                       (CAST(tus - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE)) END, 6)
        |         + 0.0 AS value
        |FROM f WHERE is_grid = 1 ORDER BY name, user_id, grid_ts""".stripMargin,
    "q84_prom_over_time" ->
      """WITH s AS (
        |  SELECT event_type AS name, user_id,
        |         make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS hour, value
        |  FROM events WHERE value IS NOT NULL)
        |SELECT name, hour, CAST(count(*) AS BIGINT) AS n_samples,
        |       round(sum(value), 2) AS sum_over_time,
        |       round(max(value), 4) AS max_over_time,
        |       round(min(value), 4) AS min_over_time,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_series
        |FROM s GROUP BY 1, 2 ORDER BY name, hour LIMIT 200""".stripMargin,
    "q83_prom_topk_rate" ->
      """WITH s AS (
        |  SELECT event_type AS name, user_id, epoch_us(ts) AS tus, value
        |  FROM events WHERE value IS NOT NULL),
        |d AS (
        |  SELECT name, user_id, tus, value,
        |         value - lag(value) OVER w AS delta,
        |         tus - lag(tus) OVER w AS dt
        |  FROM s WINDOW w AS (PARTITION BY name, user_id ORDER BY tus, value)),
        |r AS (
        |  SELECT name, user_id,
        |         CASE WHEN sum(dt) > 0
        |              THEN round(sum(CASE WHEN delta IS NULL THEN NULL
        |                             WHEN delta < 0 THEN value ELSE delta END)
        |                    / (sum(dt) / 1e6), 6) END AS rate_per_sec
        |  FROM d GROUP BY 1, 2),
        |k AS (
        |  SELECT name, user_id, rate_per_sec,
        |         CAST(row_number() OVER (PARTITION BY name
        |           ORDER BY rate_per_sec DESC, user_id) AS INT) AS rn
        |  FROM r WHERE rate_per_sec IS NOT NULL)
        |SELECT name, user_id, rate_per_sec, rn FROM k WHERE rn <= 3
        |ORDER BY name, rn""".stripMargin,
    "q82_prom_rate" ->
      """WITH s AS (
        |  SELECT event_type AS name, user_id, epoch_us(ts) AS tus, value
        |  FROM events WHERE value IS NOT NULL),
        |d AS (
        |  SELECT name, user_id, tus, value,
        |         value - lag(value) OVER w AS delta,
        |         tus - lag(tus) OVER w AS dt
        |  FROM s WINDOW w AS (PARTITION BY name, user_id ORDER BY tus, value)),
        |c AS (
        |  SELECT name,
        |         CASE WHEN delta IS NULL THEN NULL
        |              WHEN delta < 0 THEN value
        |              ELSE delta END AS inc,
        |         CASE WHEN delta < 0 THEN 1 ELSE 0 END AS reset, dt
        |  FROM d)
        |SELECT name, CAST(count(*) AS BIGINT) AS n_samples,
        |       CAST(sum(reset) AS BIGINT) AS n_resets,
        |       round(sum(inc), 2) AS total_increase,
        |       CASE WHEN sum(dt) > 0
        |            THEN round(sum(inc) / (sum(dt) / 1e6), 6) END AS rate_per_sec
        |FROM c GROUP BY name ORDER BY name""".stripMargin,
    "q00_flagship_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |       count(*) AS n_events,
        |       round(sum(value), 2) AS sum_value,
        |       round(avg(CAST(props->>'k' AS INT)), 4) AS avg_k
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    // cents decided at scale 0 (integer) — the cross-engine-safe rounding;
    // see the filterProject scaladoc
    "q01_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |       CAST(round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 100)
        |            AS BIGINT) / 100.0 AS charge
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2000-01-01'
        |  AND l_shipdate < TIMESTAMP '2000-02-01'
        |  AND l_discount > 0.05 AND l_quantity < 25
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q96_prom_instant" ->
      """WITH s AS (
        |  SELECT event_type AS name, user_id, epoch_us(ts) AS tus, value
        |  FROM events WHERE value IS NOT NULL),
        |d AS (
        |  SELECT name, user_id, tus, value,
        |         value - lag(value) OVER w AS delta,
        |         tus - lag(tus) OVER w AS dt
        |  FROM s WINDOW w AS (PARTITION BY name, user_id ORDER BY tus, value)),
        |lastd AS (
        |  SELECT name, user_id, value, delta, dt,
        |         CASE WHEN delta IS NULL THEN NULL WHEN delta < 0 THEN value ELSE delta END AS inc,
        |         row_number() OVER (PARTITION BY name, user_id ORDER BY tus DESC, value DESC) AS rn
        |  FROM d),
        |firsts AS (
        |  SELECT name, user_id, CAST(count(*) AS BIGINT) AS n_samples,
        |         first(value ORDER BY tus, value) AS first_v
        |  FROM d GROUP BY 1, 2)
        |SELECT f.name, f.user_id,
        |       CASE WHEN ld.dt > 0 THEN round(ld.inc / (ld.dt / 1e6), 6) END AS irate_per_sec,
        |       round(ld.delta, 4) AS idelta,
        |       round(ld.value - f.first_v, 4) AS delta_over_time,
        |       f.n_samples
        |FROM firsts f JOIN lastd ld USING (name, user_id)
        |WHERE ld.rn = 1
        |ORDER BY name, user_id LIMIT 300""".stripMargin,
    "q97_prom_predict_linear" ->
      """WITH c AS (
        |  SELECT event_type AS name, user_id, value,
        |         (epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY event_type, user_id)) / 1e6 AS x
        |  FROM events WHERE value IS NOT NULL)
        |SELECT name, user_id, CAST(count(*) AS BIGINT) AS n_samples,
        |       round(regr_slope(value, x), 6) + 0.0 AS slope_per_sec,
        |       round(regr_intercept(value, x), 4) + 0.0 AS intercept,
        |       round(regr_intercept(value, x) + regr_slope(value, x) * (max(x) + 300), 4) + 0.0 AS predict_5m,
        |       round(quantile_cont(value, 0.9), 4) + 0.0 AS p90_over_time
        |FROM c GROUP BY 1, 2
        |HAVING count(*) >= 2
        |ORDER BY name, user_id LIMIT 300""".stripMargin,
    "q98_prom_histogram_quantile" ->
      """WITH s AS (
        |  SELECT event_type AS name,
        |         make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS hour, value
        |  FROM events WHERE value IS NOT NULL AND value >= 0),
        |b AS (
        |  SELECT name, hour,
        |         CASE WHEN value <= 1 THEN 1 WHEN value <= 2 THEN 2 WHEN value <= 5 THEN 5
        |              WHEN value <= 10 THEN 10 WHEN value <= 25 THEN 25 WHEN value <= 50 THEN 50
        |              WHEN value <= 100 THEN 100 ELSE 1e9 END AS le
        |  FROM s),
        |c AS (SELECT name, hour, le, count(*) AS cnt FROM b GROUP BY 1, 2, 3),
        |cum AS (
        |  SELECT name, hour, le, cnt,
        |         sum(cnt) OVER (PARTITION BY name, hour ORDER BY le) AS cumcnt,
        |         sum(cnt) OVER (PARTITION BY name, hour) AS total,
        |         CASE le WHEN 1 THEN 0 WHEN 2 THEN 1 WHEN 5 THEN 2 WHEN 10 THEN 5
        |                 WHEN 25 THEN 10 WHEN 50 THEN 25 WHEN 100 THEN 50 ELSE 100 END AS lo,
        |         sum(cnt) OVER (PARTITION BY name, hour ORDER BY le) - cnt AS cumlo
        |  FROM c),
        |pick AS (
        |  SELECT *, row_number() OVER (PARTITION BY name, hour ORDER BY le) AS rn
        |  FROM cum WHERE cumcnt >= 0.95 * total)
        |SELECT name, hour, CAST(total AS BIGINT) AS n_samples,
        |       round(CASE WHEN le >= 1e9 THEN 100
        |            ELSE lo + (le - lo) * ((0.95 * total - cumlo) / cnt) END, 4) AS p95
        |FROM pick WHERE rn = 1
        |ORDER BY name, hour LIMIT 200""".stripMargin,
    "q99_prom_vector_ratio" ->
      """WITH s AS (
        |  SELECT event_type AS name, user_id, epoch_us(ts) AS tus, value
        |  FROM events WHERE value IS NOT NULL),
        |d AS (
        |  SELECT name, user_id, tus, value,
        |         value - lag(value) OVER w AS delta,
        |         tus - lag(tus) OVER w AS dt
        |  FROM s WINDOW w AS (PARTITION BY name, user_id ORDER BY tus, value)),
        |r AS (
        |  SELECT name, user_id,
        |         CASE WHEN sum(dt) > 0
        |              THEN round(sum(CASE WHEN delta IS NULL THEN NULL
        |                             WHEN delta < 0 THEN value ELSE delta END)
        |                    / (sum(dt) / 1e6), 6) END AS rate_per_sec
        |  FROM d GROUP BY 1, 2),
        |v AS (SELECT name, user_id, rate_per_sec FROM r WHERE rate_per_sec IS NOT NULL)
        |SELECT e.user_id, e.rate_per_sec AS error_rate, c.rate_per_sec AS click_rate,
        |       round(e.rate_per_sec / c.rate_per_sec, 6) AS ratio
        |FROM v e JOIN v c ON e.user_id = c.user_id
        |WHERE e.name = 'error' AND c.name = 'click'
        |ORDER BY e.user_id LIMIT 300""".stripMargin,
    "q100_prom_range_eval" ->
      """WITH s AS (
        |  SELECT event_type AS name, user_id, epoch_us(ts) // 1000000 AS tsec, value
        |  FROM events WHERE value IS NOT NULL),
        |d AS (
        |  SELECT name, user_id, tsec, value,
        |         value - lag(value) OVER w AS delta
        |  FROM s WINDOW w AS (PARTITION BY name, user_id ORDER BY tsec, value)),
        |i AS (
        |  SELECT name, user_id, tsec,
        |         CASE WHEN delta IS NULL THEN NULL WHEN delta < 0 THEN value ELSE delta END AS inc
        |  FROM d),
        |x AS (
        |  SELECT name, user_id, inc,
        |         unnest(range(((tsec + 21599) // 21600) * 21600,
        |                      ((tsec + 86400) // 21600) * 21600 + 1, 21600)) AS step
        |  FROM i WHERE inc IS NOT NULL)
        |SELECT name, CAST(step AS BIGINT) AS step_sec,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_series,
        |       CAST(count(*) AS BIGINT) AS n_samples,
        |       round(sum(inc), 2) AS total_increase,
        |       round(round(sum(inc), 2) / 86400, 6) AS rate_per_sec
        |FROM x GROUP BY 1, 2 ORDER BY name, step_sec LIMIT 500""".stripMargin,
    "q101_prom_group_left" ->
      """WITH s AS (
        |  SELECT event_type AS name, user_id, epoch_us(ts) AS tus, value
        |  FROM events WHERE value IS NOT NULL),
        |d AS (
        |  SELECT name, user_id, tus, value,
        |         value - lag(value) OVER w AS delta,
        |         tus - lag(tus) OVER w AS dt
        |  FROM s WINDOW w AS (PARTITION BY name, user_id ORDER BY tus, value)),
        |r AS (
        |  SELECT name, user_id,
        |         CASE WHEN sum(dt) > 0
        |              THEN round(sum(CASE WHEN delta IS NULL THEN NULL
        |                             WHEN delta < 0 THEN value ELSE delta END)
        |                    / (sum(dt) / 1e6), 6) END AS rate_per_sec
        |  FROM d GROUP BY 1, 2),
        |v AS (SELECT name, user_id, rate_per_sec FROM r WHERE rate_per_sec IS NOT NULL),
        |i AS (SELECT c_custkey AS user_id, c_mktsegment AS segment,
        |             round(abs(c_acctbal) + 1.0, 2) AS quota FROM customer)
        |SELECT v.name, v.user_id, i.segment, v.rate_per_sec,
        |       round(v.rate_per_sec / i.quota, 6) AS rate_per_quota
        |FROM v JOIN i USING (user_id)
        |ORDER BY name, user_id LIMIT 300""".stripMargin,
    "q102_prom_offset_absent" ->
      """WITH s AS (
        |  SELECT event_type AS name, user_id, epoch_us(ts) AS tus, value
        |  FROM events WHERE value IS NOT NULL),
        |ev AS (SELECT max(tus) AS eval_tus FROM s),
        |picks AS (
        |  SELECT name, user_id,
        |         (max({'t': tus, 'v': value})).v AS v_now,
        |         (max(CASE WHEN tus <= eval_tus - 604800000000
        |               THEN {'t': tus, 'v': value} END)).v AS v_prev
        |  FROM s, ev GROUP BY 1, 2),
        |diffs AS (
        |  SELECT name, user_id, v_now, v_prev,
        |         round(v_now - v_prev, 4) + 0.0 AS diff_1w,
        |         CAST(0 AS BIGINT) AS absent
        |  FROM picks WHERE v_prev IS NOT NULL),
        |catalog(name) AS (VALUES ('click'), ('error'), ('purchase'),
        |  ('signup'), ('view'), ('latency_p99'), ('gc_seconds')),
        |absent_rows AS (
        |  SELECT c.name, CAST(NULL AS BIGINT) AS user_id,
        |         CAST(NULL AS DOUBLE) AS v_now, CAST(NULL AS DOUBLE) AS v_prev,
        |         CAST(NULL AS DOUBLE) AS diff_1w, CAST(1 AS BIGINT) AS absent
        |  FROM catalog c ANTI JOIN (SELECT DISTINCT name FROM picks) live USING (name))
        |SELECT * FROM (SELECT * FROM diffs UNION ALL SELECT * FROM absent_rows)
        |ORDER BY absent DESC, name, user_id LIMIT 400""".stripMargin,
    "q104_prom_label_ops" ->
      """WITH s AS (
        |  SELECT event_type AS name, user_id, epoch_us(ts) AS tus, value
        |  FROM events WHERE value IS NOT NULL),
        |d AS (
        |  SELECT name, user_id, tus, value,
        |         value - lag(value) OVER w AS delta,
        |         tus - lag(tus) OVER w AS dt
        |  FROM s WINDOW w AS (PARTITION BY name, user_id ORDER BY tus, value)),
        |r AS (
        |  SELECT name, user_id,
        |         CASE WHEN sum(dt) > 0
        |              THEN round(sum(CASE WHEN delta IS NULL THEN NULL
        |                             WHEN delta < 0 THEN value ELSE delta END)
        |                    / (sum(dt) / 1e6), 6) END AS rate_per_sec
        |  FROM d GROUP BY 1, 2),
        |v AS (
        |  SELECT name, user_id, rate_per_sec,
        |         't' || regexp_extract(CAST(user_id AS VARCHAR), '^(\d)', 1) AS tier,
        |         least(greatest(rate_per_sec, 0.0001), 0.0003) AS rate_clamped
        |  FROM r WHERE rate_per_sec IS NOT NULL),
        |k AS (
        |  SELECT name, user_id, tier, concat_ws(':', name, tier) AS series, rate_clamped,
        |         CAST(row_number() OVER (PARTITION BY name
        |           ORDER BY rate_per_sec, user_id) AS INT) AS rn
        |  FROM v)
        |SELECT name, user_id, tier, series, rate_clamped, rn FROM k WHERE rn <= 3
        |ORDER BY name, rn""".stripMargin,
    "q109_prom_absent_over_time" ->
      """WITH s AS (
        |  SELECT DISTINCT event_type AS name, epoch_us(ts) // 3600000000 AS h
        |  FROM events WHERE value IS NOT NULL),
        |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM s),
        |g AS (
        |  SELECT name, h, h - lag(h) OVER (PARTITION BY name ORDER BY h) - 1 AS gap_before
        |  FROM s),
        |m AS (
        |  SELECT name, count(*) AS present_hours,
        |         coalesce(max(gap_before), 0) AS inner_gap,
        |         min(h) AS first_h, max(h) AS last_h
        |  FROM g GROUP BY name),
        |catalog(name) AS (VALUES ('click'), ('error'), ('purchase'),
        |  ('signup'), ('view'), ('latency_p99'), ('gc_seconds'))
        |SELECT c.name AS name, CAST(b.h1 - b.h0 + 1 AS BIGINT) AS n_hours,
        |       CAST(coalesce(m.present_hours, 0) AS BIGINT) AS present_hours,
        |       CAST(b.h1 - b.h0 + 1 - coalesce(m.present_hours, 0) AS BIGINT) AS absent_hours,
        |       CAST(CASE WHEN m.present_hours IS NULL THEN b.h1 - b.h0 + 1
        |            ELSE greatest(m.inner_gap, m.first_h - b.h0, b.h1 - m.last_h) END AS BIGINT)
        |         AS longest_gap_hours
        |FROM catalog c LEFT JOIN m ON m.name = c.name CROSS JOIN b
        |ORDER BY 1""".stripMargin,
    "q107_prom_agg_across" ->
      """WITH s AS (
        |  SELECT event_type AS name, user_id, epoch_us(ts) AS tus, value
        |  FROM events WHERE value IS NOT NULL),
        |d AS (
        |  SELECT name, user_id, tus, value,
        |         value - lag(value) OVER w AS delta,
        |         tus - lag(tus) OVER w AS dt
        |  FROM s WINDOW w AS (PARTITION BY name, user_id ORDER BY tus, value)),
        |r AS (
        |  SELECT name, user_id,
        |         CASE WHEN sum(dt) > 0
        |              THEN round(sum(CASE WHEN delta IS NULL THEN NULL
        |                             WHEN delta < 0 THEN value ELSE delta END)
        |                    / (sum(dt) / 1e6), 6) END AS rate_per_sec
        |  FROM d GROUP BY 1, 2),
        |p AS (
        |  SELECT name, user_id,
        |         CAST(round(rate_per_sec * 1e6, 0) AS BIGINT) AS ppm
        |  FROM r WHERE rate_per_sec IS NOT NULL)
        |SELECT name, CAST(count(*) AS BIGINT) AS n_series,
        |       round(avg(ppm), 4) + 0.0 AS avg_ppm,
        |       round(stddev_pop(ppm), 4) + 0.0 AS stddev_ppm,
        |       round(var_pop(ppm), 4) + 0.0 AS stdvar_ppm,
        |       round(quantile_cont(ppm, 0.5), 4) + 0.0 AS p50_ppm,
        |       round(quantile_cont(ppm, 0.9), 4) + 0.0 AS p90_ppm,
        |       CAST(1 AS BIGINT) AS group_all
        |FROM p GROUP BY name ORDER BY name""".stripMargin,
    "q108_prom_count_values" ->
      """WITH s AS (
        |  SELECT event_type AS name, user_id, epoch_us(ts) AS tus, value
        |  FROM events WHERE value IS NOT NULL),
        |d AS (
        |  SELECT name, user_id, tus, value,
        |         value - lag(value) OVER w AS delta,
        |         tus - lag(tus) OVER w AS dt
        |  FROM s WINDOW w AS (PARTITION BY name, user_id ORDER BY tus, value)),
        |r AS (
        |  SELECT name, user_id,
        |         CASE WHEN sum(dt) > 0
        |              THEN round(sum(CASE WHEN delta IS NULL THEN NULL
        |                             WHEN delta < 0 THEN value ELSE delta END)
        |                    / (sum(dt) / 1e6), 6) END AS rate_per_sec
        |  FROM d GROUP BY 1, 2),
        |p AS (
        |  SELECT name, user_id,
        |         CAST(round(rate_per_sec * 1e6, 0) AS BIGINT) AS ppm
        |  FROM r WHERE rate_per_sec IS NOT NULL)
        |SELECT name, CAST(ppm AS VARCHAR) AS rate_ppm,
        |       CAST(count(*) AS BIGINT) AS n_series
        |FROM p GROUP BY name, ppm
        |ORDER BY name, CAST(rate_ppm AS BIGINT) LIMIT 500""".stripMargin,
    "q105_prom_changes_resets" ->
      """WITH s AS (
        |  SELECT event_type AS name, user_id, epoch_us(ts) AS tus, value
        |  FROM events WHERE value IS NOT NULL),
        |d AS (
        |  SELECT name, user_id, tus, value,
        |         value - lag(value) OVER w AS delta
        |  FROM s WINDOW w AS (PARTITION BY name, user_id ORDER BY tus, value))
        |SELECT name, user_id, CAST(count(*) AS BIGINT) AS n_samples,
        |       CAST(sum(CASE WHEN delta IS NOT NULL AND delta <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
        |       CAST(sum(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
        |       round(stddev_pop(value), 4) + 0.0 AS stddev_over_time,
        |       (max({'t': tus, 'v': value})).v AS last_over_time
        |FROM d GROUP BY 1, 2
        |ORDER BY name, user_id LIMIT 300""".stripMargin,
    // Recursive CTE, NOT list_reduce: DuckDB 1.0's list_reduce with a
    // struct accumulator aliases partially-updated fields — the 'b' field
    // expression observes the freshly-written 's1' (reproduced: b =
    // 0.1·(s1_NEW − s0_old) + 0.9·b_old from sample 4 on), silently
    // corrupting any multi-field fold. The recursion reads only the
    // previous iteration's row, so each step sees a consistent state and
    // matches the Spark fold bit-for-bit on all 300 sf0.01 series.
    "q106_prom_holt_winters" ->
      """WITH RECURSIVE s AS (
        |  SELECT event_type AS name, user_id, epoch_us(ts) AS t, value AS v
        |  FROM events WHERE value IS NOT NULL),
        |o AS (
        |  SELECT name, user_id, v,
        |         row_number() OVER (PARTITION BY name, user_id ORDER BY t, v) AS rn,
        |         count(*) OVER (PARTITION BY name, user_id) AS n
        |  FROM s),
        |r AS (
        |  SELECT name, user_id, n, 1 AS it,
        |         CAST(0.0 AS DOUBLE) AS s0, v AS s1, CAST(0.0 AS DOUBLE) AS b
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT r.name, r.user_id, r.n, r.it + 1,
        |         r.s1,
        |         CASE WHEN r.it = 1 THEN 0.3 * o.v + 0.7 * (r.s1 + (o.v - r.s1))
        |              ELSE 0.3 * o.v + 0.7 * (r.s1 + (0.1 * (r.s1 - r.s0) + 0.9 * r.b)) END,
        |         CASE WHEN r.it = 1 THEN o.v - r.s1
        |              ELSE 0.1 * (r.s1 - r.s0) + 0.9 * r.b END
        |  FROM r JOIN o ON o.name = r.name AND o.user_id = r.user_id AND o.rn = r.it + 1)
        |SELECT name, user_id, CAST(n AS BIGINT) AS n_samples,
        |       round(s1, 4) + 0.0 AS smoothed, round(b, 4) + 0.0 AS trend
        |FROM r WHERE it = n AND n >= 2
        |ORDER BY name, user_id LIMIT 300""".stripMargin,
    "q103_prom_subquery" ->
      """WITH s AS (
        |  SELECT event_type AS name, user_id, epoch_us(ts) // 1000000 AS tsec, value
        |  FROM events WHERE value IS NOT NULL),
        |d AS (
        |  SELECT name, user_id, tsec, value,
        |         value - lag(value) OVER w AS delta
        |  FROM s WINDOW w AS (PARTITION BY name, user_id ORDER BY tsec, value)),
        |i AS (
        |  SELECT name, user_id, tsec,
        |         CASE WHEN delta IS NULL THEN NULL WHEN delta < 0 THEN value ELSE delta END AS inc
        |  FROM d),
        |x AS (
        |  SELECT name, user_id, inc,
        |         unnest(range(((tsec + 21599) // 21600) * 21600,
        |                      ((tsec + 86400) // 21600) * 21600 + 1, 21600)) AS step
        |  FROM i WHERE inc IS NOT NULL),
        |g AS (
        |  SELECT name, user_id, step,
        |         CAST(round(round(sum(inc), 2) * 1e6 / 86400, 0) AS BIGINT) AS rate_ppm
        |  FROM x GROUP BY 1, 2, 3)
        |SELECT name, user_id, CAST(count(*) AS BIGINT) AS n_steps,
        |       max(rate_ppm) / 1e6 AS max_rate,
        |       round(sum(rate_ppm) / (count(*) * 1e6), 4) AS avg_rate
        |FROM g GROUP BY 1, 2
        |ORDER BY name, user_id LIMIT 300""".stripMargin,
    // dow/hour via pure integer epoch arithmetic (day 0 = Thursday, promql
    // dow 0 = Sunday); the double-mod mirrors Spark's non-negative pmod so
    // pre-1970 samples bucket identically under DuckDB's sign-of-dividend %
    "q111_prom_time_fns" ->
      """WITH f AS (
        |  SELECT event_type AS name, user_id,
        |         CAST(round(value * 10000, 0) AS BIGINT) AS v4,
        |         epoch_us(ts) // 1000000 AS tsec
        |  FROM events WHERE value IS NOT NULL)
        |SELECT ((((tsec // 86400) + 4) % 7 + 7) % 7) AS dow,
        |       (((tsec % 86400) + 86400) % 86400) // 3600 AS hour,
        |       count(*) AS n_events,
        |       count(DISTINCT name || '|' || CAST(user_id AS VARCHAR)) AS n_series,
        |       round(CAST(sum(v4) AS BIGINT) / (10000.0 * count(*)), 4) + 0.0
        |         AS avg_value
        |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q115_prom_deriv_math" ->
      """WITH c AS (
        |  SELECT event_type AS name, user_id, value,
        |         (epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY event_type, user_id)) / 1e6 AS x
        |  FROM events WHERE value IS NOT NULL),
        |a AS (
        |  SELECT name, user_id, CAST(count(*) AS BIGINT) AS n_samples,
        |         regr_slope(value, x) AS d, avg(value) AS avg_raw
        |  FROM c GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT name, user_id, n_samples,
        |       round(d, 6) + 0.0 AS deriv_per_sec,
        |       round(avg_raw, 6) + 0.0 AS avg_ot,
        |       CAST(sign(round(d, 6) + 0.0) AS INT) AS sgn_deriv,
        |       round(sqrt(abs(avg_raw)), 6) + 0.0 AS sqrt_abs_avg,
        |       round(log2(abs(avg_raw) + 1.0), 6) + 0.0 AS log2_avg,
        |       CAST(ceil(avg_raw) AS BIGINT) AS ceil_avg,
        |       CAST(floor(avg_raw) AS BIGINT) AS floor_avg
        |FROM a
        |ORDER BY deriv_per_sec DESC, name, user_id LIMIT 300""".stripMargin
  )
}
