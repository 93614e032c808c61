package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** All eight join forms from SURVEY.md §2.5 over the TPC-H-ish tables and
  * the `events` stream stand-in.
  *
  * Scale notes (100 TB / 1000-executor framing):
  *   - dimension joins (`region`, `nation`) are explicitly [[broadcast]] —
  *     dims are KBs at any scale, so the fact side never shuffles;
  *   - `orders ⋈ lineitem` is a shuffle (sort-merge) join on the natural
  *     key — both sides hash-partition on `orderkey`, which is uniformly
  *     distributed (no skew) and is the partitioning a real deployment would
  *     bucket both tables on to eliminate the shuffle entirely;
  *   - the range/as-of joins are equi-joins on `user_id` with a range
  *     predicate pushed into the join condition: Spark executes them as a
  *     hash join on `user_id` + post-filter, so the work per user is
  *     (clicks_u × purchases_u), bounded by per-user activity, never a
  *     global cross product.
  */
object Joins extends QueryModule {

  /** Broadcast hash join: customer ⋈ nation ⋈ region (dims broadcast). */
  def broadcastJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val n = broadcast(Tables(spark, dir, "nation"))
    val r = broadcast(Tables(spark, dir, "region"))
    c.join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("total_bal"))
      .orderBy(col("r_name"))
  }

  /** Shuffle (sort-merge) join on the big-big pair: orders ⋈ lineitem. */
  def shuffleJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val l = Tables(spark, dir, "lineitem")
    l.join(o.hint("merge"), l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** Left outer join: every customer kept, orders counted (0 if none). */
  def leftOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
    val perCust = c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(c("c_custkey"), c("c_nationkey"))
      .agg(count(o("o_orderkey")).as("n_orders"))
    perCust.groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_customers"),
        sum(when(col("n_orders") === 0, 1L).otherwise(0L)).as("n_without_orders"))
      .orderBy(col("nationkey"))
  }

  /** Left semi join: customers having at least one big order. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val big = Tables(spark, dir, "orders").filter(col("o_totalprice") > 300000)
    c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** Left anti join: parts with no late-2001 shipment. */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables(spark, dir, "part")
    val late = Tables(spark, dir, "lineitem")
      .filter(expr("l_shipdate >= TIMESTAMP '2001-09-01'"))
    p.join(late, p("p_partkey") === late("l_partkey"), "left_anti")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"))
      .orderBy(col("p_brand"))
  }

  /** Cross join: tiny × tiny only (5 regions × 3 statuses). */
  def crossJoin(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables(spark, dir, "region").select(col("r_name"))
    val s = Tables(spark, dir, "orders").select(col("o_orderstatus")).distinct()
    r.crossJoin(s).orderBy(col("r_name"), col("o_orderstatus"))
  }

  /** Range (theta) join: click→purchase pairs within 24h, same user.
    * Honest baseline form: equi-join on user only, so per-user expansion is
    * quadratic in per-user event density — [[rangeJoinBucketed]] (q91) is
    * the identical-output refinement that bounds it. */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("pts"))
    clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("cts") < col("pts") &&
          col("cts") >= col("pts") - expr("INTERVAL 24 HOURS"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("user_id"))
  }

  /** Bucketed range join — q16's scale refinement, the q57 trick applied
    * to the 24 h band (VERDICT r08 "What's wrong" #2): bucket size = the
    * range width, clicks keyed by their own day-bucket, each purchase
    * EXPLODED to its own + preceding bucket (the interval `(pts−24h, pts)`
    * spans exactly those two), equi-join on (user, bucket), then the exact
    * range predicate. A click lives in exactly one bucket, so no pair can
    * match twice — output ≡ q16, same oracle, no dedup step.
    *
    * Scale shape: the shuffle key widens from `user` to `(user, bucket)`,
    * so pair expansion is quadratic per (user, DAY) instead of per user's
    * whole history — at 100× per-user density over a year, ~365× less
    * expansion per key — and a hot user's history now spreads across 365
    * shuffle partitionings instead of one skewed key. Cost: 2× the
    * purchase rows through the shuffle (the exploded bucket column),
    * linear and cheap next to the avoided quadratic tail. */
  def rangeJoinBucketed(spark: SparkSession, dir: String): DataFrame = {
    val bucketUs = 24L * 3600 * 1000000 // bucket = range width, exactly
    val e = Tables(spark, dir, "events")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"),
        floor(unix_micros(col("ts")) / lit(bucketUs)).cast("long").as("cb"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("pts"),
        floor(unix_micros(col("ts")) / lit(bucketUs)).cast("long").as("pb"))
      .withColumn("jb", explode(array(col("pb"), col("pb") - 1)))
    clicks.join(purchases,
        col("user_id") === col("p_user") && col("cb") === col("jb") &&
          col("cts") < col("pts") &&
          col("cts") >= col("pts") - expr("INTERVAL 24 HOURS"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("user_id"))
  }

  /** As-of join: for each purchase, the latest same-user click at/before it.
    * Composed as equi-join on user + range predicate + `row_number() = 1`
    * (SURVEY.md §2.5 "as-of = range join + window row_number=1").
    *
    * Scale refinement: per-user pair expansion is quadratic in per-user
    * history depth. [[asofJoinBucketed]] (q57) adds a coarse time bucket to
    * the equi-join key to bound expansion per bucket; [[asofJoinSorted]]
    * (q58) eliminates pair expansion entirely with a sort-based running
    * "last click" window. All three produce identical output. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("pts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("cts"))
    val w = Window.partitionBy(col("purchase_id"))
      .orderBy(col("cts").desc, col("click_id").desc)
    purchases.join(clicks,
        col("p_user") === col("user_id") && col("cts") <= col("pts"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("purchase_id"), col("click_id"),
        (unix_micros(col("pts")) - unix_micros(col("cts"))).as("gap_us"))
      .orderBy(col("purchase_id"))
  }

  /** Bucketed as-of join (the deep-history refinement [[asofJoin]]'s
    * scaladoc promises): adds a coarse time bucket to the equi-join key so
    * each purchase pairs only with clicks in its own and the preceding
    * bucket — per-(user, bucket) expansion replaces per-user expansion,
    * bounding the quadratic blowup on deep histories. Purchases with no
    * click in their own or preceding bucket (a sparse tail: 155 of 1981 at
    * 7-day buckets on sf0.01, measured) fall back to the unbucketed as-of
    * on just that residue — at scale the unmatched set is small enough to
    * broadcast. Buckets are integer `floor(unix_micros / bucketUs)` — plain
    * Column `/` is double division, which made the phase-1 equi-join match
    * nothing (ADVICE r03). Output is identical to q17 (same oracle). */
  def asofJoinBucketed(spark: SparkSession, dir: String): DataFrame = {
    val bucketUs = 7L * 24 * 3600 * 1000000 // 7-day buckets
    val e = Tables(spark, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("pts"),
        floor(unix_micros(col("ts")) / lit(bucketUs)).cast("long").as("pb"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("cts"),
        floor(unix_micros(col("ts")) / lit(bucketUs)).cast("long").as("cb"))
    val w = Window.partitionBy(col("purchase_id"))
      .orderBy(col("cts").desc, col("click_id").desc)
    def pick(joined: DataFrame): DataFrame =
      joined.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("purchase_id"), col("click_id"),
          (unix_micros(col("pts")) - unix_micros(col("cts"))).as("gap_us"))
    // Phase 1: equi-join on (user, bucket) with the purchase exploded to its
    // own + preceding bucket — each (purchase, click) pair matches at most
    // once because a click lives in exactly one bucket.
    val near = pick(
      purchases.withColumn("jb", explode(array(col("pb"), col("pb") - 1)))
        .join(clicks,
          col("p_user") === col("user_id") && col("cb") === col("jb") &&
            col("cts") <= col("pts")))
    // Phase 2: the residue (no click within two buckets) runs the plain
    // as-of; left_anti keeps it to the sparse tail.
    val residue = purchases
      .join(near.select(col("purchase_id").as("matched_id")),
        col("purchase_id") === col("matched_id"), "left_anti")
    val far = pick(residue.join(clicks,
      col("p_user") === col("user_id") && col("cts") <= col("pts")))
    near.unionAll(far).orderBy(col("purchase_id"))
  }

  /** Sort-based as-of join: union clicks+purchases, one shuffle on
    * `user_id`, and a running `last(click, ignoreNulls)` window — zero pair
    * expansion, O(h log h) per user history instead of O(h²). This is the
    * shape to prefer when purchases are dense relative to clicks; the
    * ordering (ts, kind, event_id) makes ties resolve exactly like q17's
    * `ORDER BY cts DESC, click_id DESC` (same-timestamp clicks sort before
    * the purchase, larger click_id last ⇒ running-last picks it). */
  def asofJoinSorted(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "click", 0).otherwise(1).as("kind"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("lc",
        last(when(col("kind") === 0,
          struct(col("ts").as("cts"), col("event_id").as("click_id"))),
          ignoreNulls = true).over(w))
      .filter(col("kind") === 1 && col("lc").isNotNull)
      .select(col("event_id").as("purchase_id"), col("lc.click_id").as("click_id"),
        (unix_micros(col("ts")) - unix_micros(col("lc.cts"))).as("gap_us"))
      .orderBy(col("purchase_id"))
  }

  /** The as-of join as a FIRST-CLASS operator ([[graft.plans.AsOfJoin]]:
    * custom LogicalPlan + Strategy + SparkPlan): both sides co-partition
    * on user and sort by (user, time), then one forward merge pass per
    * partition keeps a single retained row of state — O(|L|+|R|), no pair
    * expansion (q17), no union+window buffer (q58). Same output, same
    * oracle; SURVEY §6.2 measures the three composable forms this
    * operator subsumes. */
  def asofJoinNative(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("pts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("cts"))
    graft.plans.AsOf.join(purchases, clicks,
        "p_user", "user_id", "pts", "cts", "click_id")
      .select(col("purchase_id"), col("click_id"),
        (unix_micros(col("pts")) - unix_micros(col("cts"))).as("gap_us"))
      .orderBy(col("purchase_id"))
  }

  /** FULL OUTER join — both unmatched sides survive with nulls. The one
    * outer-join flavor rounds 1-4 lacked. Physically an SMJ (full outer
    * can't broadcast: BOTH sides must emit unmatched rows); null-key
    * coalescing happens after the join. */
  def fullOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
      .filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"), col("c_name"))
    val o = Tables(spark, dir, "orders")
      .filter(col("o_totalprice") > 150000)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_name"), col("n_orders"))
      .orderBy(col("custkey"))
  }

  /** The SQL entry point, exercised end to end: a correlated-EXISTS query
    * (TPC-H Q4's shape, adapted to the synthetic schema) through
    * `spark.sql` over registered temp views. Catalyst rewrites the
    * correlated EXISTS into a left-semi join — same physical shape as q13,
    * arrived at from SQL instead of the DataFrame API; the filter still
    * pushes to the orders scan. */
  def sqlCorrelatedExists(spark: SparkSession, dir: String): DataFrame = {
    // View names are dir-scoped: bare "orders"/"lineitem" would be
    // session-GLOBAL state mutated at query-build time — two builds over
    // different sf dirs in one session would silently resolve against
    // whichever registered last (the conf-mutation hazard class the events
    // loader's scaladoc rejects). Dir-hashed names are deterministic and
    // idempotent per dir, so concurrent builds never collide.
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val (ov, lv) = (s"orders_q81_$tag", s"lineitem_q81_$tag")
    Tables(spark, dir, "orders").createOrReplaceTempView(ov)
    Tables(spark, dir, "lineitem").createOrReplaceTempView(lv)
    spark.sql(
      s"""SELECT o_orderpriority, count(*) AS order_count
         |FROM $ov
         |WHERE o_totalprice > 100000
         |  AND EXISTS (SELECT 1 FROM $lv
         |              WHERE l_orderkey = o_orderkey
         |                AND l_shipdate > o_orderdate + INTERVAL 60 DAYS)
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  /** LATERAL join (SQL surface): per-customer top-2 orders via a
    * correlated lateral subquery with ORDER BY + LIMIT — the "for each
    * outer row, run this parameterized subquery" operator. Catalyst plans
    * it as a ranked join (same physics as q25's window top-k), so the
    * per-row subquery never executes row-at-a-time. */
  def sqlLateralJoin(spark: SparkSession, dir: String): DataFrame = {
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val (cv, ov) = (s"customer_q86_$tag", s"orders_q86_$tag")
    Tables(spark, dir, "customer").createOrReplaceTempView(cv)
    Tables(spark, dir, "orders").createOrReplaceTempView(ov)
    spark.sql(
      s"""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
         |FROM (SELECT c_custkey FROM $cv WHERE c_custkey < 50) c,
         |LATERAL (SELECT o_orderkey, o_totalprice FROM $ov
         |         WHERE o_custkey = c.c_custkey
         |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
         |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin)
  }

  /** q160 — the executive revenue report: quarterly revenue per
    * (region, nation) off the full star join, with QoQ growth and
    * nation-within-region share — the BI composite that exercises the
    * engine's bread and butter in one statement: a big-big fact⋈customer
    * shuffle join, two broadcast dimension hops, exact integer-cents
    * aggregation, and lag/share windows on the ≤|nations|×|quarters|
    * aggregate. Revenue sums in BIGINT cents so cross-engine totals are
    * exact; growth/share are single divisions of those integers.
    */
  def revenueReport(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
      .select(col("o_custkey"),
        to_date(date_trunc("quarter", col("o_orderdate"))).as("quarter"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    val cust = Tables(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val nat = Tables(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val reg = Tables(spark, dir, "region").select(col("r_regionkey"), col("r_name"))
    val agg = orders
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"), col("quarter"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("rev_cents"))
    val byQ = Window.partitionBy(col("region"), col("nation")).orderBy(col("quarter"))
    val inRq = Window.partitionBy(col("region"), col("quarter"))
    agg
      .withColumn("prev", lag(col("rev_cents"), 1).over(byQ))
      .withColumn("region_cents", sum(col("rev_cents")).over(inRq))
      .select(col("region"), col("nation"), col("quarter"), col("n_orders"),
        round(col("rev_cents").cast("double") / 100, 2).as("revenue"),
        (when(col("prev").isNotNull,
          round((col("rev_cents") - col("prev")).cast("double") / col("prev"), 6)
            + lit(0.0))).as("qoq_growth"),
        (round(col("rev_cents").cast("double") / col("region_cents"), 6) + lit(0.0))
          .as("region_share"))
      .orderBy(col("region"), col("nation"), col("quarter"))
  }

  /** q164 — statically SALTED shuffle join, the query-rewrite dual of the
    * AQE skew split (`SkewJoinAqeSpec`) and of q54's salted aggregation:
    * when the fact side has hot keys and the dim side is too big to
    * broadcast, a plain shuffle join puts every hot-key row in ONE reducer.
    * The rewrite spreads each fact row across `salts` shuffle partitions
    * with a DETERMINISTIC per-row salt (md5 of the row id — never rand(),
    * which would break retry-idempotence AND the oracle), and replicates
    * the dim side once per salt value, joining on (key, salt). Result is
    * row-identical to the unsalted join — the oracle IS the plain join.
    * The shuffle_hash hint pins the salted join to a real shuffle (at
    * sf0.1 the replicated dim would otherwise auto-broadcast and the demo
    * would silently degenerate); at 100 TB the hint is unnecessary — the
    * dim being over the broadcast threshold is the operator's premise.
    * Dim-side replication cost is |dim|×salts rows — choose salts ≈
    * hot-key-rows / healthy-partition-rows, not "big". */
  def joinSaltedSkew(spark: SparkSession, dir: String, salts: Int = 8): DataFrame = {
    val fact = Tables(spark, dir, "events").select(
      col("user_id"), col("value"),
      pmod(graft.functions.TextExpressions.md5Hash60Col(
        concat(col("event_id").cast("string"), lit(":skewsalt"))), lit(salts.toLong))
        .as("salt"))
    val dim = Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
      .withColumn("salt", explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    fact.join(dim.hint("shuffle_hash"),
        fact("user_id") === dim("c_custkey") && fact("salt") === dim("salt"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(round(value * 100) as bigint)")).as("value_cents"))
      .orderBy(col("c_mktsegment"))
  }

  /** q173 — POINT-IN-TIME feature-frame assembly, the feature-store /
    * training-set operator: for every label event (purchase), attach
    * features computed ONLY from data at-or-before the label's timestamp
    * — the leakage rule every offline training join must enforce. Two
    * feature families at different shapes: (1) last click value at-or-
    * before the label — the NATIVE as-of operator (q63's plan: one
    * shuffle per side, merge pass, zero pair expansion), re-attached
    * LEFT-outer so label rows without history keep a null (the honest
    * encoding — a fabricated default would leak "no history" into the
    * feature scale); (2) 7-day trailing view count — a user-keyed range
    * join (the q16 shape: per-user expansion bounded by per-user
    * activity, never a global product) reduced before re-attachment.
    * Both features key back on the label id — broadcast-sized relative
    * to the fact stream after their reductions at any scale where labels
    * ≪ events. Micros arithmetic end-to-end; outputs are raw values and
    * integer counts — nothing for an engine hash to wobble on. */
  def pitFeatureJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val labels = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("label_id"), col("ts").as("lts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("cts"), col("value").as("click_value"))
    val f1 = graft.plans.AsOf.join(
        labels.select(col("user_id").as("l_user"), col("label_id"), col("lts")),
        clicks, "l_user", "user_id", "lts", "cts", "click_id")
      .select(col("label_id"), col("click_value").as("last_click_value"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), unix_micros(col("ts")).as("vus"))
    val f2 = labels
      .join(views,
        views("user_id") === labels("user_id") &&
          col("vus") >= unix_micros(col("lts")) - lit(604800000000L) &&
          col("vus") < unix_micros(col("lts")))
      .groupBy(col("label_id")).agg(count(lit(1)).as("views_7d"))
    labels
      .join(f1, Seq("label_id"), "left")
      .join(f2, Seq("label_id"), "left")
      .select(col("label_id"), col("user_id"), col("lts").as("label_ts"),
        col("last_click_value"),
        coalesce(col("views_7d"), lit(0L)).as("views_7d"))
      .orderBy(col("label_id"))
  }

  val queries: Map[String, QueryFn] = Map(
    "q173_pit_features" -> pitFeatureJoin _,
    "q164_join_salted_skew" -> ((s, d) => joinSaltedSkew(s, d)),
    "q160_revenue_report" -> revenueReport _,
    "q80_join_full_outer" -> fullOuterJoin _,
    "q81_sql_correlated_exists" -> sqlCorrelatedExists _,
    "q86_sql_lateral_join" -> sqlLateralJoin _,
    "q63_join_asof_native" -> asofJoinNative _,
    "q10_join_broadcast" -> broadcastJoin _,
    "q11_join_shuffle" -> shuffleJoin _,
    "q12_join_left_outer" -> leftOuterJoin _,
    "q13_join_semi" -> semiJoin _,
    "q14_join_anti" -> antiJoin _,
    "q15_join_cross" -> crossJoin _,
    "q16_join_range" -> rangeJoin _,
    "q91_join_range_bucketed" -> rangeJoinBucketed _,
    "q17_join_asof" -> asofJoin _,
    "q57_join_asof_bucketed" -> asofJoinBucketed _,
    "q58_join_asof_sorted" -> asofJoinSorted _
  )

  /** q17/q57/q58 are three physical strategies for the same logical as-of
    * join; all three hash-check against the identical oracle. */
  private val asofOracle =
    """WITH pc AS (
      |  SELECT p.event_id AS purchase_id, c.event_id AS click_id,
      |         epoch_us(p.ts) - epoch_us(c.ts) AS gap_us,
      |         row_number() OVER (PARTITION BY p.event_id
      |                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
      |  FROM events p JOIN events c
      |    ON c.user_id = p.user_id AND c.ts <= p.ts
      |   AND p.event_type = 'purchase' AND c.event_type = 'click')
      |SELECT purchase_id, click_id, gap_us FROM pc WHERE rn = 1
      |ORDER BY purchase_id""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // leakage rule spelled relationally: rank-1 at-or-before click,
    // 7-day trailing count, both left-joined back to every label
    "q173_pit_features" ->
      """WITH l AS (
        |  SELECT user_id, event_id AS label_id, ts AS lts
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, ts AS cts, event_id, value
        |  FROM events WHERE event_type = 'click'),
        |f1 AS (
        |  SELECT label_id, value AS last_click_value FROM (
        |    SELECT l.label_id, c.value,
        |           row_number() OVER (PARTITION BY l.label_id
        |             ORDER BY c.cts DESC, c.event_id DESC) AS rn
        |    FROM l JOIN c ON c.user_id = l.user_id AND c.cts <= l.lts)
        |  WHERE rn = 1),
        |f2 AS (
        |  SELECT l.label_id, count(*) AS views_7d
        |  FROM l JOIN events v ON v.user_id = l.user_id
        |    AND v.event_type = 'view'
        |    AND epoch_us(v.ts) >= epoch_us(l.lts) - 604800000000
        |    AND epoch_us(v.ts) < epoch_us(l.lts)
        |  GROUP BY 1)
        |SELECT l.label_id, l.user_id, l.lts AS label_ts,
        |       f1.last_click_value,
        |       coalesce(f2.views_7d, 0) AS views_7d
        |FROM l LEFT JOIN f1 USING (label_id) LEFT JOIN f2 USING (label_id)
        |ORDER BY l.label_id""".stripMargin,
    // the oracle is the UNSALTED join — salting must be result-invisible
    "q164_join_salted_skew" ->
      """SELECT c.c_mktsegment, count(*) AS n_events,
        |       CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
        |         AS value_cents
        |FROM events e JOIN customer c ON c.c_custkey = e.user_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q160_revenue_report" ->
      """WITH o AS (
        |  SELECT o_custkey, CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |agg AS (
        |  SELECT r.r_name AS region, n.n_name AS nation, o.quarter,
        |         count(*) AS n_orders, CAST(sum(o.cents) AS BIGINT) AS rev_cents
        |  FROM o JOIN customer c ON o.o_custkey = c.c_custkey
        |         JOIN nation n ON c.c_nationkey = n.n_nationkey
        |         JOIN region r ON n.n_regionkey = r.r_regionkey
        |  GROUP BY 1, 2, 3),
        |w AS (
        |  SELECT *,
        |         lag(rev_cents) OVER (PARTITION BY region, nation
        |           ORDER BY quarter) AS prev,
        |         sum(rev_cents) OVER (PARTITION BY region, quarter) AS region_cents
        |  FROM agg)
        |SELECT region, nation, quarter, n_orders,
        |       round(CAST(rev_cents AS DOUBLE) / 100, 2) AS revenue,
        |       CASE WHEN prev IS NOT NULL THEN
        |         round(CAST(rev_cents - prev AS DOUBLE) / prev, 6) + 0.0 END
        |         AS qoq_growth,
        |       round(CAST(rev_cents AS DOUBLE) / region_cents, 6) + 0.0
        |         AS region_share
        |FROM w ORDER BY region, nation, quarter""".stripMargin,
    "q80_join_full_outer" ->
      """WITH o AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
        |           FROM orders WHERE o_totalprice > 150000 GROUP BY 1)
        |SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey, c.c_name, o.n_orders
        |FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 7 = 0) c
        |FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
        |ORDER BY custkey""".stripMargin,
    "q81_sql_correlated_exists" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_totalprice > 100000
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q86_sql_lateral_join" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM (SELECT c_custkey FROM customer WHERE c_custkey < 50) c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |         WHERE o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin,
    "q10_join_broadcast" ->
      """SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q11_join_shuffle" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q12_join_left_outer" ->
      """SELECT nationkey, count(*) AS n_customers,
        |       CAST(sum(CASE WHEN n_orders = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_without_orders
        |FROM (SELECT c.c_custkey, c.c_nationkey AS nationkey,
        |             count(o.o_orderkey) AS n_orders
        |      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |      GROUP BY 1, 2)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_join_semi" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q14_join_anti" ->
      """SELECT p_brand, count(*) AS n_parts
        |FROM part
        |WHERE p_partkey NOT IN
        |  (SELECT l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-09-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q15_join_cross" ->
      """SELECT r_name, o_orderstatus
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
        |ORDER BY 1, 2""".stripMargin,
    "q16_join_range" ->
      """SELECT c.user_id, count(*) AS n_pairs
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND c.ts < p.ts AND c.ts >= p.ts - INTERVAL 24 HOUR
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q91 ≡ q16: the bucketed form must hash-match the same oracle
    "q91_join_range_bucketed" ->
      """SELECT c.user_id, count(*) AS n_pairs
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND c.ts < p.ts AND c.ts >= p.ts - INTERVAL 24 HOUR
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q17_join_asof" -> asofOracle,
    "q57_join_asof_bucketed" -> asofOracle,
    "q58_join_asof_sorted" -> asofOracle,
    "q63_join_asof_native" -> asofOracle
  )
}
