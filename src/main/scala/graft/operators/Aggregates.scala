package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregation breadth (SURVEY.md §2.5): min/max/count(distinct), HLL
  * approx distinct, rollup / cube / grouping sets.
  *
  * Scale notes: every query here is a partial (map-side) hash aggregate
  * followed by one shuffle keyed on the group columns; output cardinality is
  * tiny and group keys are low-cardinality uniform (event types, statuses,
  * segments), so the shuffle moves combined partials only — the pattern
  * holds unchanged at 100 TB. `count(distinct user_id)` expands to the
  * standard two-phase Spark plan (partial distinct then final); for a
  * high-cardinality distinct at scale the HLL variant (`q21`) is the knob —
  * fixed-size sketches, no second shuffle, mergeable across executors.
  *
  * Rollup/cube grouping-null markers are folded to the sentinel 'ALL' so the
  * output is total-ordered without null-ordering divergence between engines
  * (Spark sorts NULLS FIRST, DuckDB NULLS LAST by default).
  */
object Aggregates extends QueryModule {

  /** min / max / avg / sum / count / count(distinct) per event type. */
  def aggStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        round(min(col("value")), 4).as("min_value"),
        round(max(col("value")), 4).as("max_value"),
        round(avg(col("value")), 4).as("avg_value"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("event_type"))

  /** HLL sketch distinct — no DuckDB oracle (approximation differs by
    * implementation); the driver records a rows-only check. The exact
    * distinct is q20's `n_users`; this is the 100 TB-scale substitute.
    *
    * Deliberately NOT combined with an exact `countDistinct` in one agg:
    * mixing them makes Spark key the partial aggregate on (group, user) and
    * carry a full per-pair HLL sketch (1.6k words at rsd=0.01) through the
    * shuffle — observed 13 KB/row in the round-2 plan audit. Alone, the
    * sketch count equals the group count: 5 rows through the exchange. */
  def aggApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
      .orderBy(col("event_type"))

  /** ROLLUP (status, priority) with sentinel-folded subtotal rows. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy(col("status"), col("priority"))

  /** CUBE (returnflag, linestatus) with sentinel-folded subtotal rows. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("qty"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** GROUPING SETS ((mktsegment), (nationkey), ()) over customer. */
  def groupingSetsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .groupingSets(
        Seq(Seq(col("c_mktsegment")), Seq(col("c_nationkey")), Seq.empty),
        col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("c_acctbal")), 2).as("total_bal"))
      .select(
        coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
        coalesce(col("c_nationkey").cast("string"), lit("ALL")).as("nationkey"),
        col("n"), col("total_bal"))
      .orderBy(col("segment"), col("nationkey"))

  /** Second-moment statistics: stddev/variance/correlation/covariance. */
  def statsMoments(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .agg(
        round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(covar_samp(col("l_discount"), col("l_tax")), 6).as("covar_disc_tax"))
      .orderBy(col("l_linestatus"))

  /** Pivot: event counts per user-bucket × event_type (explicit values so
    * the output schema is static — required for a scalable pivot). */
  def pivotEvents(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .withColumn("bucket", col("user_id") % 10)
      .groupBy(col("bucket"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .orderBy(col("bucket"))

  /** Two-phase salted aggregation — the skew-mitigation shape: partial agg
    * on (key, salt) spreads a hot key over 16 reducers, then a cheap final
    * agg over 16 partials per key. Result provably equals the plain groupBy
    * (the oracle IS the plain groupBy). `event_type` has only 5 values —
    * exactly the "few giant keys" profile where a single-phase shuffle
    * would bottleneck on 5 reducers at 100 TB. (Spark's map-side partial
    * aggregation already does this implicitly for algebraic aggregates;
    * the explicit salt is the pattern needed when partial agg can't help —
    * e.g. exact distinct or collect-style states.) */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("value")).as("psum"))
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).cast("long").as("n"),
        round(sum(col("psum")), 2).as("sum_value"))
      .orderBy(col("event_type"))

  /** Exact interpolated percentiles (p50/p90/p99) — at 100 TB the exact
    * form needs a full sort per group; `approx_percentile` (t-digest) is
    * the scale substitute, same call shape. */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"))
      .orderBy(col("event_type"))

  /** The 100 TB percentile path: `approx_percentile` (KLL/t-digest-style
    * sketch) — mergeable partial state through one shuffle instead of a
    * full per-group sort. No SQL oracle (sketches differ by
    * implementation); rows-only in CORRECTNESS, with the accuracy gate in
    * `LlmOpsSemanticsSpec` asserting each quantile lands within the
    * sketch's rank-error bound of q56's exact value. */
  def approxPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        round(expr("approx_percentile(value, 0.5, 10000)"), 4).as("p50"),
        round(expr("approx_percentile(value, 0.9, 10000)"), 4).as("p90"),
        round(expr("approx_percentile(value, 0.99, 10000)"), 4).as("p99"))
      .orderBy(col("event_type"))

  /** Mergeable-sketch rollup — the 100 TB incremental-maintenance idiom:
    * build one HLL sketch per (event_type, day) — at scale these are
    * materialized once per ingest day — then answer the weekly distinct
    * question by MERGING sketches (`hll_union_agg`) instead of rescanning
    * raw events. The second aggregation's input is (groups × days) tiny
    * sketch blobs, not the corpus; monthly/yearly rollups reuse the same
    * daily sketches. No SQL oracle (Datasketches binary format); rows-only
    * plus the accuracy gate in `LlmOpsSemanticsSpec`. */
  def hllUnionRollup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .withColumn("day", to_date(col("ts")))
      .groupBy(col("event_type"), col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .withColumn("week", date_trunc("week", col("day")).cast("date"))
      .groupBy(col("event_type"), col("week"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"))
      .orderBy(col("event_type"), col("week"))

  /** Count-min sketch per event type — the frequency-estimation member of
    * the sketch family (HLL = distinct, t-digest = quantiles, CMS = heavy
    * hitters): mergeable partial state, one shuffle, and the resulting
    * sketch answers "how often did user X appear" for ANY key after the
    * fact with ε-overcount guarantees. No SQL oracle (binary sketch);
    * rows-only plus the deserialize-and-check accuracy gate in
    * `LlmOpsSemanticsSpec`. Seed fixed for deterministic output. */
  def cmsFrequency(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(count_min_sketch(col("user_id"), lit(0.001), lit(0.99), lit(42)).as("cms"))
      .orderBy(col("event_type"))

  /** KMV distinct sketches with set-operation estimation — the sketch the
    * built-in HLL family (q21/q64) cannot give you: HLL unions but never
    * intersects; KMV supports both, because the k smallest hashes of A∪B
    * are computable from the two sketches and the fraction of them lying in
    * A∩B is an unbiased Jaccard estimate (Beyer et al., SIGMOD'07). Here:
    * distinct CLICK users ∩ distinct PURCHASE users, estimated purely from
    * two 64-long sketches, with the exact counts alongside as the in-row
    * accuracy witness.
    *
    * The sketch is [[graft.functions.KmvAgg]] — a typed Aggregator with
    * bounded O(k) state and associative merge, so Spark map-side-combines
    * it like any sum (see its scaladoc for the 100 TB contract). Because
    * the hashes are the deterministic md5-prefix family, the DuckDB oracle
    * reproduces the estimate BIT-EXACTLY from a window `row_number ≤ k` —
    * an oracle-checkable approximate operator, unlike the rows-only
    * HLL/CMS entries. */
  def kmvIntersection(spark: SparkSession, dir: String, k: Int = 64): DataFrame = {
    import org.apache.spark.sql.Column
    val e = Tables(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), col("user_id")).distinct()
      .withColumn("h", conv(substring(
        md5(concat(col("user_id").cast("string"), lit(":kmv"))), 1, 15), 16, 10)
        .cast("long"))
    val sk = e.groupBy(col("event_type"))
      .agg(graft.functions.KmvSketch.kmv(k)(col("h")).as("sk"),
        count(lit(1)).as("exact"))
    val a = sk.filter(col("event_type") === "click")
      .select(col("sk").as("sa"), col("exact").as("exact_a"))
    val b = sk.filter(col("event_type") === "purchase")
      .select(col("sk").as("sb"), col("exact").as("exact_b"))
    val exactInter = e.filter(col("event_type") === "click").select(col("user_id"))
      .intersect(e.filter(col("event_type") === "purchase").select(col("user_id")))
      .agg(count(lit(1)).as("exact_inter"))
    def est(s: Column): Column = when(size(s) < k, size(s).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(1152921504606846976L).cast("double") /
        element_at(s, k))
    a.crossJoin(broadcast(b)).crossJoin(broadcast(exactInter))
      .withColumn("su", slice(array_sort(array_union(col("sa"), col("sb"))), 1, k))
      .withColumn("n_common",
        size(array_intersect(array_intersect(col("su"), col("sa")), col("sb"))))
      .select(lit(k).as("k"), col("exact_a"), round(est(col("sa")), 4).as("est_a"),
        col("exact_b"), round(est(col("sb")), 4).as("est_b"),
        col("exact_inter"),
        round(col("n_common").cast("double") * est(col("su")) / size(col("su")), 4).as("est_inter"))
  }

  val queries: Map[String, QueryFn] = Map(
    "q137_kmv_intersection" -> ((s, d) => kmvIntersection(s, d)),
    "q66_agg_cms_frequency" -> cmsFrequency _,
    "q64_agg_hll_union" -> hllUnionRollup _,
    "q62_agg_approx_percentiles" -> approxPercentiles _,
    "q56_agg_percentiles" -> percentiles _,
    "q54_agg_salted" -> saltedAgg _,
    "q18_agg_moments" -> statsMoments _,
    "q19_agg_pivot" -> pivotEvents _,
    "q20_agg_stats" -> aggStats _,
    "q21_agg_approx_distinct" -> aggApproxDistinct _,
    "q22_agg_rollup" -> rollupAgg _,
    "q23_agg_cube" -> cubeAgg _,
    "q24_agg_grouping_sets" -> groupingSetsAgg _
  )

  val oracleSql: Map[String, String] = Map(
    // window row_number ≤ k reproduces the bounded-heap Aggregator's
    // sketch exactly: a KMV estimate is a pure fn of the k smallest hashes
    "q137_kmv_intersection" ->
      """WITH du AS (
        |  SELECT DISTINCT event_type, user_id FROM events
        |  WHERE event_type IN ('click', 'purchase')),
        |hh AS (SELECT event_type,
        |         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':kmv'), 1, 15)
        |           AS BIGINT) AS h
        |       FROM du),
        |rk AS (SELECT event_type, h,
        |         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        |       FROM hh),
        |sk AS (SELECT event_type, list(h ORDER BY h) AS s
        |       FROM rk WHERE rn <= 64 GROUP BY 1),
        |ex AS (SELECT event_type, count(*) AS exact FROM du GROUP BY 1),
        |a AS (SELECT sk.s AS sa, ex.exact AS exact_a
        |      FROM sk JOIN ex USING (event_type) WHERE event_type = 'click'),
        |b AS (SELECT sk.s AS sb, ex.exact AS exact_b
        |      FROM sk JOIN ex USING (event_type) WHERE event_type = 'purchase'),
        |xi AS (SELECT count(*) AS exact_inter FROM
        |       (SELECT user_id FROM du WHERE event_type = 'click'
        |        INTERSECT
        |        SELECT user_id FROM du WHERE event_type = 'purchase')),
        |j AS (SELECT *, list_sort(list_distinct(sa || sb))[1:64] AS su
        |      FROM a CROSS JOIN b CROSS JOIN xi)
        |SELECT 64 AS k, exact_a,
        |  round(CASE WHEN len(sa) < 64 THEN CAST(len(sa) AS DOUBLE)
        |        ELSE 63.0 * CAST(1152921504606846976 AS DOUBLE) / sa[64] END, 4)
        |    AS est_a,
        |  exact_b,
        |  round(CASE WHEN len(sb) < 64 THEN CAST(len(sb) AS DOUBLE)
        |        ELSE 63.0 * CAST(1152921504606846976 AS DOUBLE) / sb[64] END, 4)
        |    AS est_b,
        |  exact_inter,
        |  round(CAST(len(list_intersect(list_intersect(su, sa), sb)) AS DOUBLE) *
        |    (CASE WHEN len(su) < 64 THEN CAST(len(su) AS DOUBLE)
        |     ELSE 63.0 * CAST(1152921504606846976 AS DOUBLE) / su[64] END) / len(su), 4)
        |    AS est_inter
        |FROM j""".stripMargin,
    "q56_agg_percentiles" ->
      """SELECT event_type,
        |       round(quantile_cont(value, 0.5), 4) AS p50,
        |       round(quantile_cont(value, 0.9), 4) AS p90,
        |       round(quantile_cont(value, 0.99), 4) AS p99
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q54_agg_salted" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q18_agg_moments" ->
      """SELECT l_linestatus,
        |       round(stddev_samp(l_extendedprice), 4) AS sd_price,
        |       round(var_samp(l_quantity), 4) AS var_qty,
        |       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |       round(covar_samp(l_discount, l_tax), 6) AS covar_disc_tax
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q19_agg_pivot" ->
      """SELECT user_id % 10 AS bucket,
        |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q20_agg_stats" ->
      """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
        |       round(min(value), 4) AS min_value, round(max(value), 4) AS max_value,
        |       round(avg(value), 4) AS avg_value, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q22_agg_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY 1, 2""".stripMargin,
    "q23_agg_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |       coalesce(l_linestatus, 'ALL') AS linestatus,
        |       count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY 1, 2""".stripMargin,
    "q24_agg_grouping_sets" ->
      """SELECT coalesce(c_mktsegment, 'ALL') AS segment,
        |       coalesce(CAST(c_nationkey AS VARCHAR), 'ALL') AS nationkey,
        |       count(*) AS n, round(sum(c_acctbal), 2) AS total_bal
        |FROM customer
        |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        |ORDER BY 1, 2""".stripMargin
  )
}
