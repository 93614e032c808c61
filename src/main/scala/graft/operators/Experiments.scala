package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experimentation / causal-readout operators (SURVEY.md §2.5 [ext]) —
  * the statistical layer a growth team runs on top of the q121–q138
  * product-analytics family: resampled uncertainty for the A/B readout and
  * position-based multi-touch credit.
  *
  * Scale discipline: q151 is the POISSON bootstrap (Chamandy et al.,
  * "Estimating Uncertainty for Massive Data Streams", Google 2012) — the
  * resampling scheme built for data that cannot be materialized B times:
  * each row draws its per-replicate multiplicity from a hash (one pass,
  * map-side combinable, B×|arms| running sums), instead of the textbook
  * bootstrap's B shuffled copies. q154's credit windows ride the family's
  * single user_id exchange like q126.
  */
object Experiments extends QueryModule {

  /** Cumulative Poisson(1) CDF thresholds, spelled as identical literals in
    * both engines (runtime exp() would differ in the last ulp). */
  private val poissonCdf = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119)

  /** q151 — A/B uncertainty via the Poisson bootstrap: B=100 replicates,
    * each row's replicate-b multiplicity drawn from Poisson(1) through the
    * md5 content hash (no RNG — reproducible across engines, runs, and
    * partitionings). Per (arm, replicate) the weighted sums stay INTEGER
    * (weights × cents), so every replicate mean is one exact division and
    * the replicate diffs are bit-identical across engines. The CI is
    * ORDER-STATISTIC (3rd / 98th of 100 sorted diffs — percentile_disc,
    * not interpolation), sidestepping cross-engine interpolation
    * arithmetic. One scan → 100× row expansion of the purchase slice →
    * 200-group aggregate; nothing is ever materialized B times.
    */
  def abBootstrap(spark: SparkSession, dir: String, reps: Int = 100): DataFrame = {
    val cents = round(col("value") * 100, 0).cast("long")
    // md5Hash60Col ≡ conv(substring(md5(s),1,15),16,10) — same VALUE, one
    // codegen call instead of hex materialization + substring + base
    // conversion per (row × replicate); oracle keeps the SQL idiom
    val armOf = when(
      graft.functions.TextExpressions.md5Hash60Col(
        concat(col("user_id").cast("string"), lit(":ab"))) % 2 === 0,
      lit("A")).otherwise(lit("B"))
    // fanOut (opt r20, graft.Par): the replicate explode drives reps
    // md5 evaluations per purchase row and otherwise runs at the
    // unsplittable scan's 1-task parallelism; no-op at scale
    val p = graft.Par.fanOut(Tables(spark, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), cents.as("cents")))
      .withColumn("arm", armOf)
    val u = graft.functions.TextExpressions.md5Hash60Col(
      concat(col("event_id").cast("string"), lit(":bs"), col("b").cast("string")))
      .cast("double") / lit(1152921504606846976.0) // 2^60
    val w = poissonCdf.zipWithIndex.foldRight(lit(poissonCdf.length): org.apache.spark.sql.Column) {
      case ((t, k), rest) => when(col("u") < t, k).otherwise(rest)
    }
    val perRep = p
      .withColumn("b", explode(sequence(lit(0), lit(reps - 1))))
      .withColumn("u", u)
      .withColumn("w", w.cast("long"))
      .groupBy(col("b"))
      .agg(
        sum(when(col("arm") === "A", col("w")).otherwise(0L)).as("wa"),
        sum(when(col("arm") === "A", col("w") * col("cents")).otherwise(0L)).as("wca"),
        sum(when(col("arm") === "B", col("w")).otherwise(0L)).as("wb"),
        sum(when(col("arm") === "B", col("w") * col("cents")).otherwise(0L)).as("wcb"))
      .withColumn("diff", col("wca").cast("double") / col("wa") / 100
        - col("wcb").cast("double") / col("wb") / 100)
    val byDiff = Window.orderBy(col("diff"), col("b"))
    val ci = perRep.withColumn("rn", row_number().over(byDiff))
      .agg(min(when(col("rn") === 3, col("diff"))).as("ci_lo_raw"),
        min(when(col("rn") === 98, col("diff"))).as("ci_hi_raw"),
        count(lit(1)).as("n_reps"))
    val obs = p.agg(
        sum(when(col("arm") === "A", col("cents")).otherwise(0L)).as("sa"),
        sum(when(col("arm") === "A", 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") === "B", col("cents")).otherwise(0L)).as("sb"),
        sum(when(col("arm") === "B", 1L).otherwise(0L)).as("nb"))
      .select((col("sa").cast("double") / col("na") / 100
        - col("sb").cast("double") / col("nb") / 100).as("diff_obs_raw"))
    obs.crossJoin(broadcast(ci))
      .select(col("n_reps"),
        (round(col("diff_obs_raw"), 6) + lit(0.0)).as("diff_obs"),
        (round(col("ci_lo_raw"), 6) + lit(0.0)).as("ci_lo"),
        (round(col("ci_hi_raw"), 6) + lit(0.0)).as("ci_hi"),
        (col("ci_lo_raw") > 0 || col("ci_hi_raw") < 0).as("significant"))
  }

  /** q154 — position-based (U-shaped) multi-touch attribution: each
    * purchase credits 40% to the FIRST and 40% to the LAST qualifying
    * touch in the 1-day lookback and 20% to the middle pool (100% to a
    * sole touch, 50/50 with exactly two, `direct` when none) — q126's
    * last-touch generalized to
    * the industry-standard position model. The first/last picks are
    * struct-min/max over a RANGE frame ending strictly before the
    * purchase (one user_id exchange, no as-of self-join); credit is
    * accumulated in integer cents×10 so cross-engine sums are exact.
    */
  def attributionPosition(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-dayUs, -1)
    val isTouch = col("event_type").isin("view", "click")
    val touched = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"),
        unix_micros(col("ts")).as("us"))
      .withColumn("first_t",
        min(when(isTouch, struct(col("us"), col("event_id"), col("event_type")))).over(w))
      .withColumn("last_t",
        max(when(isTouch, struct(col("us"), col("event_id"), col("event_type")))).over(w))
      .withColumn("n_t", count(when(isTouch, lit(1))).over(w))
      .filter(col("event_type") === "purchase")
    // credit rows: (bucket, cents*credit*10) — integers end to end.
    // 0 touches: direct 100%; 1: sole touch 100%; 2: first/last 50/50;
    // ≥3: first 40, last 40, middle pool 20 (the U shape)
    val credits = touched.select(explode(array(
        struct(
          when(col("n_t") === 0, lit("direct"))
            .otherwise(col("first_t.event_type")).as("bucket"),
          when(col("n_t") <= 1, col("cents") * 10)
            .when(col("n_t") === 2, col("cents") * 5)
            .otherwise(col("cents") * 4).as("dcents")),
        struct(when(col("n_t") >= 2, col("last_t.event_type")).as("bucket"),
          when(col("n_t") === 2, col("cents") * 5)
            .otherwise(col("cents") * 4).as("dcents")),
        struct(when(col("n_t") >= 3, lit("middle")).as("bucket"),
          (col("cents") * 2).as("dcents")))).as("c"))
      .select(col("c.bucket").as("bucket"), col("c.dcents").as("dcents"))
      .filter(col("bucket").isNotNull)
    credits.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_credits"), sum(col("dcents")).as("sum_dcents"))
      .select(col("bucket"), col("n_credits"),
        round(col("sum_dcents").cast("double") / 1000, 2).as("credited_value"))
      .orderBy(col("bucket"))
  }

  /** q155 — funnel step latencies: for users who progressed, the
    * view→click and click→purchase transition times, summarized per step
    * pair (n, min, exact p50/p90, max, in whole seconds). Rides
    * [[ProductAnalytics.funnelPerUser]]'s single user_id shuffle; the
    * percentile pass runs on the two-row-per-user latency table. The
    * "where does the funnel stall" readout that turns q121's conversion
    * counts into an actionable queue model.
    */
  def funnelLatency(spark: SparkSession, dir: String): DataFrame = {
    val perUser = ProductAnalytics.funnelPerUser(
      Tables(spark, dir, "events"))
    val lat = perUser.select(explode(array(
        struct(lit("1_view_to_click").as("step_pair"),
          when(col("t2").isNotNull,
            floor((unix_micros(col("t2")) - unix_micros(col("t1"))) / 1000000L))
            .as("lat_sec")),
        struct(lit("2_click_to_purchase").as("step_pair"),
          when(col("t3").isNotNull,
            floor((unix_micros(col("t3")) - unix_micros(col("t2"))) / 1000000L))
            .as("lat_sec")))).as("s"))
      .select(col("s.step_pair").as("step_pair"), col("s.lat_sec").as("lat_sec"))
      .filter(col("lat_sec").isNotNull)
    lat.groupBy(col("step_pair"))
      .agg(count(lit(1)).as("n_users"),
        min(col("lat_sec")).as("min_sec"),
        expr("percentile(lat_sec, 0.5)").as("p50_raw"),
        expr("percentile(lat_sec, 0.9)").as("p90_raw"),
        max(col("lat_sec")).as("max_sec"))
      .select(col("step_pair"), col("n_users"), col("min_sec"),
        (round(col("p50_raw"), 4) + lit(0.0)).as("p50_sec"),
        (round(col("p90_raw"), 4) + lit(0.0)).as("p90_sec"),
        col("max_sec"))
      .orderBy(col("step_pair"))
  }

  /** q156 — retention drivers: for each event type, the 2×2 contingency of
    * "did it in the first week after signup" × "still active 14+ days
    * after signup", scored with the Haldane-smoothed odds ratio and
    * retention lift. All cells are exact integer counts off ONE user-level
    * aggregate (three conditional flags per user), so the heavy work is a
    * single user_id shuffle; the per-type table is |types| rows. The
    * "which behaviors predict retention" query every growth team runs —
    * correlational by construction, and labeled as such.
    */
  def retentionDrivers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"), to_date(col("ts")).as("day"))
    val cohort = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("day")).as("t0"))
    val flags = e.join(cohort, "user_id")
      .groupBy(col("user_id"))
      .agg(first(col("t0")).as("t0"),
        max(when(datediff(col("day"), col("t0")) >= 14, 1L).otherwise(0L)).as("retained"),
        collect_set(when(datediff(col("day"), col("t0")).between(0, 6),
          col("event_type"))).as("week1_types"))
    val types = Seq("view", "click", "purchase").toDF("etype")
    flags.crossJoin(broadcast(types))
      .withColumn("exposed", array_contains(col("week1_types"), col("etype")))
      .groupBy(col("etype"))
      .agg(
        sum(when(col("exposed") && col("retained") === 1, 1L).otherwise(0L)).as("a"),
        sum(when(col("exposed") && col("retained") === 0, 1L).otherwise(0L)).as("b"),
        sum(when(!col("exposed") && col("retained") === 1, 1L).otherwise(0L)).as("c"),
        sum(when(!col("exposed") && col("retained") === 0, 1L).otherwise(0L)).as("d"))
      .withColumn("n", col("a") + col("b") + col("c") + col("d"))
      .select(col("etype"), col("a").as("exp_ret"), col("b").as("exp_churn"),
        col("c").as("unexp_ret"), col("d").as("unexp_churn"),
        (round((col("a") + 0.5) * (col("d") + 0.5)
          / ((col("b") + 0.5) * (col("c") + 0.5)), 6) + lit(0.0)).as("odds_ratio"),
        (when(col("a") + col("b") > 0,
          round((col("a").cast("double") / (col("a") + col("b")))
            / ((col("a") + col("c")).cast("double") / col("n")), 6) + lit(0.0)))
          .as("retention_lift"))
      .orderBy(col("etype"))
  }

  /** q157 — per-user journey entropy: Shannon entropy of each user's
    * transition distribution (q135's per-user refinement) — the
    * exploration-vs-habit signal behind engagement scoring. The entropy
    * fold runs over the SORTED per-user pair array via a higher-order
    * `aggregate` (the q106 ordered-fold discipline: both engines fold
    * identical doubles in identical order — DuckDB mirrors it with an
    * ORDER BY inside the sum aggregate), so raw doubles hash-match.
    */
  def pathEntropy(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("user_id"), col("event_type").as("cur"), col("nxt"))
      .agg(count(lit(1)).as("c"))
    pairs.groupBy(col("user_id"))
      .agg(sum(col("c")).as("n_transitions"),
        count(lit(1)).as("n_pairs"),
        expr("array_sort(collect_list(struct(cur, nxt, c)))").as("ps"))
      .withColumn("entropy_raw", expr(
        "aggregate(ps, cast(0.0 as double), (acc, s) -> " +
          "acc - (cast(s.c as double) / n_transitions) * " +
          "ln(cast(s.c as double) / n_transitions))"))
      .select(col("user_id"), col("n_transitions"), col("n_pairs"),
        (round(col("entropy_raw"), 6) + lit(0.0)).as("entropy"))
      .orderBy(col("user_id"))
  }

  /** q202 — MANN–WHITNEY U test on the q127 A/B arms (Mann & Whitney
    * 1947): the rank-sum complement of q127's Welch t — revenue-per-
    * purchase distributions are heavy-tailed, so the parametric t can be
    * driven by a handful of whale orders while the rank test asks the
    * robust question ("does one arm stochastically dominate?"). Arms are
    * q127's md5 rule verbatim. Exactness: pooled midranks collapse to the
    * counts-of-distinct-values aggregate (rank = 1 + Σ c before, tie = c
    * — the q172 two-phase form, so the one global running sum rides an
    * AGGREGATE), 2·R_A is an exact integer, 2·U_A = 2·R_A − 2·(n_A(n_A+1)/2)
    * stays integer, and the tie-corrected normal deviate
    * z = (U_A − n_A·n_B/2)/√Var with Var = n_A·n_B/12·((N+1) −
    * Σ(t³−t)/(N(N−1))) divides exact integer terms once. */
  def abMannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("value") * 100, 0).cast("long")
    val obs = Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(cents.as("cents"),
        (graft.functions.TextExpressions.md5Hash60Col(
          concat(col("user_id").cast("string"), lit(":ab"))) % 2 === 0)
          .as("is_a"))
    val byVal = obs.groupBy(col("cents"))
      .agg(count(lit(1)).as("c"),
        sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"))
    val wCum = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = byVal
      .withColumn("cum_before", coalesce(sum(col("c")).over(wCum), lit(0L)))
      // all c rows at this value share rank = cum_before + 1, tie count c:
      // twice the midrank = 2·rank + c − 1
      .withColumn("r2", lit(2L) * (col("cum_before") + 1L) + col("c") - 1L)
    ranked.agg(
        sum(col("ca")).as("n_a"), sum(col("c") - col("ca")).as("n_b"),
        sum(col("ca") * col("r2")).as("r2a"),
        sum(col("c") * col("c") * col("c") - col("c")).as("tie3"))
      .withColumn("nn", col("n_a") + col("n_b"))
      .withColumn("u2a", col("r2a") - col("n_a") * (col("n_a") + 1))
      .withColumn("var_u",
        col("n_a").cast("double") * col("n_b") / 12
          * ((col("nn") + 1) - col("tie3").cast("double")
            / (col("nn") * (col("nn") - 1))))
      .select(col("n_a"), col("n_b"),
        (col("u2a").cast("double") / 2).as("u_a"),
        (round(col("var_u"), 4) + lit(0.0)).as("var_u"),
        (round((col("u2a").cast("double") / 2
            - col("n_a").cast("double") * col("n_b") / 2) / sqrt(col("var_u")), 6)
          + lit(0.0)).as("z"))
  }

  val queries: Map[String, QueryFn] = Map(
    "q151_ab_bootstrap" -> ((s, d) => abBootstrap(s, d)),
    "q154_attribution_position" -> attributionPosition _,
    "q155_funnel_latency" -> funnelLatency _,
    "q156_retention_drivers" -> retentionDrivers _,
    "q157_path_entropy" -> pathEntropy _,
    "q202_ab_mann_whitney" -> abMannWhitney _
  )

  val oracleSql: Map[String, String] = Map(
    // q127's md5 arm rule verbatim; midranks two-phase off the
    // counts-of-distinct-values (q172's trick); integer 2U_A; one division
    "q202_ab_mann_whitney" ->
      """WITH p AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
        |         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':ab'), 1, 15)
        |           AS BIGINT) % 2 = 0 AS is_a
        |  FROM events WHERE event_type = 'purchase'),
        |bv AS (
        |  SELECT cents, CAST(count(*) AS BIGINT) AS c,
        |         CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS ca
        |  FROM p GROUP BY 1),
        |rk AS (
        |  SELECT *, COALESCE(CAST(sum(c) OVER (ORDER BY cents
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
        |           0) AS cum_before
        |  FROM bv),
        |r2 AS (SELECT *, 2 * (cum_before + 1) + c - 1 AS r2 FROM rk),
        |agg AS (
        |  SELECT CAST(sum(ca) AS BIGINT) AS n_a,
        |         CAST(sum(c - ca) AS BIGINT) AS n_b,
        |         CAST(sum(ca * r2) AS BIGINT) AS r2a,
        |         CAST(sum(c * c * c - c) AS BIGINT) AS tie3
        |  FROM r2),
        |x AS (
        |  SELECT *, n_a + n_b AS nn, r2a - n_a * (n_a + 1) AS u2a,
        |         CAST(n_a AS DOUBLE) * n_b / 12
        |           * ((n_a + n_b + 1) - CAST(tie3 AS DOUBLE)
        |             / ((n_a + n_b) * (n_a + n_b - 1))) AS var_u
        |  FROM agg)
        |SELECT n_a, n_b, CAST(u2a AS DOUBLE) / 2 AS u_a,
        |       round(var_u, 4) + 0.0 AS var_u,
        |       round((CAST(u2a AS DOUBLE) / 2 - CAST(n_a AS DOUBLE) * n_b / 2)
        |             / sqrt(var_u), 6) + 0.0 AS z
        |FROM x""".stripMargin,
    "q151_ab_bootstrap" ->
      """WITH p AS (
        |  SELECT event_id,
        |         CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':ab'), 1, 15)
        |                   AS BIGINT) % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |x AS (
        |  SELECT p.*, CAST(r.range AS INTEGER) AS b,
        |         CAST(CAST('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':bs'
        |           || CAST(r.range AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE)
        |           / 1152921504606846976.0 AS u
        |  FROM p CROSS JOIN range(100) r),
        |wgt AS (
        |  SELECT *, CAST(CASE
        |    WHEN u < 0.36787944117144233 THEN 0
        |    WHEN u < 0.7357588823428847 THEN 1
        |    WHEN u < 0.9196986029286058 THEN 2
        |    WHEN u < 0.9810118431238462 THEN 3
        |    WHEN u < 0.9963401531726563 THEN 4
        |    WHEN u < 0.9994058151824183 THEN 5
        |    WHEN u < 0.9999167588507119 THEN 6
        |    ELSE 7 END AS BIGINT) AS w
        |  FROM x),
        |reps AS (
        |  SELECT b,
        |         CAST(sum(CASE WHEN arm = 'A' THEN w ELSE 0 END) AS BIGINT) AS wa,
        |         CAST(sum(CASE WHEN arm = 'A' THEN w * cents ELSE 0 END) AS BIGINT) AS wca,
        |         CAST(sum(CASE WHEN arm = 'B' THEN w ELSE 0 END) AS BIGINT) AS wb,
        |         CAST(sum(CASE WHEN arm = 'B' THEN w * cents ELSE 0 END) AS BIGINT) AS wcb
        |  FROM wgt GROUP BY 1),
        |diffs AS (
        |  SELECT b, CAST(wca AS DOUBLE) / wa / 100
        |            - CAST(wcb AS DOUBLE) / wb / 100 AS diff
        |  FROM reps),
        |ranked AS (
        |  SELECT diff, row_number() OVER (ORDER BY diff, b) AS rn FROM diffs),
        |ci AS (
        |  SELECT min(CASE WHEN rn = 3 THEN diff END) AS ci_lo_raw,
        |         min(CASE WHEN rn = 98 THEN diff END) AS ci_hi_raw,
        |         count(*) AS n_reps
        |  FROM ranked),
        |obs AS (
        |  SELECT CAST(sum(CASE WHEN arm = 'A' THEN cents ELSE 0 END) AS DOUBLE)
        |           / sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) / 100
        |       - CAST(sum(CASE WHEN arm = 'B' THEN cents ELSE 0 END) AS DOUBLE)
        |           / sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) / 100 AS diff_obs_raw
        |  FROM p)
        |SELECT n_reps,
        |       round(diff_obs_raw, 6) + 0.0 AS diff_obs,
        |       round(ci_lo_raw, 6) + 0.0 AS ci_lo,
        |       round(ci_hi_raw, 6) + 0.0 AS ci_hi,
        |       ci_lo_raw > 0 OR ci_hi_raw < 0 AS significant
        |FROM obs CROSS JOIN ci""".stripMargin,
    // the oracle picks first/last via correlated min-subqueries; the Spark
    // side is struct-min/max over one RANGE-framed window (see scaladoc)
    "q154_attribution_position" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         CAST(round(value * 100) AS BIGINT) AS cents, epoch_us(ts) AS us
        |  FROM events),
        |p AS (
        |  SELECT e.*,
        |    (SELECT t.event_type FROM e t
        |     WHERE t.user_id = e.user_id AND t.event_type IN ('view', 'click')
        |       AND t.us BETWEEN e.us - 86400000000 AND e.us - 1
        |     ORDER BY t.us, t.event_id LIMIT 1) AS first_type,
        |    (SELECT t.event_type FROM e t
        |     WHERE t.user_id = e.user_id AND t.event_type IN ('view', 'click')
        |       AND t.us BETWEEN e.us - 86400000000 AND e.us - 1
        |     ORDER BY t.us DESC, t.event_id DESC LIMIT 1) AS last_type,
        |    (SELECT count(*) FROM e t
        |     WHERE t.user_id = e.user_id AND t.event_type IN ('view', 'click')
        |       AND t.us BETWEEN e.us - 86400000000 AND e.us - 1) AS n_t
        |  FROM e WHERE e.event_type = 'purchase'),
        |credits AS (
        |  SELECT CASE WHEN n_t = 0 THEN 'direct' ELSE first_type END AS bucket,
        |         CASE WHEN n_t <= 1 THEN cents * 10
        |              WHEN n_t = 2 THEN cents * 5 ELSE cents * 4 END AS dcents
        |  FROM p
        |  UNION ALL
        |  SELECT last_type, CASE WHEN n_t = 2 THEN cents * 5 ELSE cents * 4 END
        |  FROM p WHERE n_t >= 2
        |  UNION ALL
        |  SELECT 'middle', cents * 2 FROM p WHERE n_t >= 3)
        |SELECT bucket, count(*) AS n_credits,
        |       round(CAST(sum(dcents) AS DOUBLE) / 1000, 2) AS credited_value
        |FROM credits GROUP BY 1 ORDER BY 1""".stripMargin,
    // per-user step times replicate the q121 funnel CTEs exactly
    "q155_funnel_latency" ->
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
        |lat AS (
        |  SELECT '1_view_to_click' AS step_pair,
        |         CAST(floor((epoch_us(t2) - epoch_us(t1)) / 1000000) AS BIGINT)
        |           AS lat_sec
        |  FROM p2
        |  UNION ALL
        |  SELECT '2_click_to_purchase',
        |         CAST(floor((epoch_us(p3.t3) - epoch_us(p2.t2)) / 1000000) AS BIGINT)
        |  FROM p3 JOIN p2 USING (user_id))
        |SELECT step_pair, count(*) AS n_users, min(lat_sec) AS min_sec,
        |       round(quantile_cont(lat_sec, 0.5), 4) + 0.0 AS p50_sec,
        |       round(quantile_cont(lat_sec, 0.9), 4) + 0.0 AS p90_sec,
        |       max(lat_sec) AS max_sec
        |FROM lat GROUP BY 1 ORDER BY 1""".stripMargin,
    "q156_retention_drivers" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS DATE) AS day FROM events),
        |cohort AS (
        |  SELECT user_id, min(day) AS t0 FROM e
        |  WHERE event_type = 'signup' GROUP BY 1),
        |flags AS (
        |  SELECT e.user_id,
        |         max(CASE WHEN e.day - c.t0 >= 14 THEN 1 ELSE 0 END) AS retained,
        |         max(CASE WHEN e.event_type = 'view'
        |                   AND e.day - c.t0 BETWEEN 0 AND 6 THEN 1 ELSE 0 END) AS w_view,
        |         max(CASE WHEN e.event_type = 'click'
        |                   AND e.day - c.t0 BETWEEN 0 AND 6 THEN 1 ELSE 0 END) AS w_click,
        |         max(CASE WHEN e.event_type = 'purchase'
        |                   AND e.day - c.t0 BETWEEN 0 AND 6 THEN 1 ELSE 0 END) AS w_purchase
        |  FROM e JOIN cohort c USING (user_id) GROUP BY 1),
        |x AS (
        |  SELECT 'view' AS etype, w_view AS exposed, retained FROM flags
        |  UNION ALL SELECT 'click', w_click, retained FROM flags
        |  UNION ALL SELECT 'purchase', w_purchase, retained FROM flags),
        |ct AS (
        |  SELECT etype,
        |         CAST(sum(CASE WHEN exposed = 1 AND retained = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |         CAST(sum(CASE WHEN exposed = 1 AND retained = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |         CAST(sum(CASE WHEN exposed = 0 AND retained = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |         CAST(sum(CASE WHEN exposed = 0 AND retained = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM x GROUP BY 1)
        |SELECT etype, a AS exp_ret, b AS exp_churn, c AS unexp_ret, d AS unexp_churn,
        |       round((a + 0.5) * (d + 0.5) / ((b + 0.5) * (c + 0.5)), 6) + 0.0
        |         AS odds_ratio,
        |       CASE WHEN a + b > 0 THEN
        |         round((CAST(a AS DOUBLE) / (a + b))
        |           / (CAST(a + c AS DOUBLE) / (a + b + c + d)), 6) + 0.0 END
        |         AS retention_lift
        |FROM ct ORDER BY etype""".stripMargin,
    // the cumulative window fixes the fold order (the q136 discipline);
    // IEEE acc−x ≡ acc+(−x), so it matches Spark's aggregate() fold
    "q157_path_entropy" ->
      """WITH t AS (
        |  SELECT user_id, event_type AS cur,
        |         lead(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |p AS (SELECT user_id, cur, nxt, count(*) AS c FROM t
        |      WHERE nxt IS NOT NULL GROUP BY 1, 2, 3),
        |p2 AS (
        |  SELECT user_id, cur, nxt, c,
        |         sum(c) OVER (PARTITION BY user_id) AS n_transitions,
        |         count(*) OVER (PARTITION BY user_id) AS n_pairs
        |  FROM p),
        |ent AS (
        |  SELECT user_id, n_transitions, n_pairs,
        |         sum(-(CAST(c AS DOUBLE) / n_transitions)
        |             * ln(CAST(c AS DOUBLE) / n_transitions))
        |           OVER (PARTITION BY user_id ORDER BY cur, nxt
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS e,
        |         row_number() OVER (PARTITION BY user_id ORDER BY cur, nxt) AS rn
        |  FROM p2)
        |SELECT user_id, CAST(n_transitions AS BIGINT) AS n_transitions,
        |       n_pairs, round(e, 6) + 0.0 AS entropy
        |FROM ent WHERE rn = n_pairs ORDER BY user_id""".stripMargin
  )
}
