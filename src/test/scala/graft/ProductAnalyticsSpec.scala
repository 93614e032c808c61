package graft

import org.scalatest.funsuite.AnyFunSuite

/** Known-answer tests for the product-analytics operators (q121–q123) on
  * planted event timelines — the semantics the oracle hash can't pin down:
  * funnel steps are ORDERED (a click before the first view doesn't count),
  * the 7-day completion window binds, pre-signup activity never appears in
  * a retention cell, and a gap of exactly 30 minutes starts a NEW session
  * (mirroring q32's session_window boundary).
  */
class ProductAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ns(sec: Long) = sec * 1000000000L
  private def day(d: Long, sec: Long = 0) = ns(d * 86400 + sec)

  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double, String)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-pa").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("q121: funnel steps are ordered and bounded by the 7-day window") {
    // u1 completes in order; u2's click precedes its first view (no step 2);
    // u3's purchase lands day 8 (outside t1+7d); u4 never views;
    // u5 completes with a later second click that must not matter.
    val dir = writeEvents(Seq(
      (1L, ns(0), 1L, "view", 1.0, "{}"),
      (2L, ns(10), 1L, "click", 1.0, "{}"),
      (3L, ns(20), 1L, "purchase", 1.0, "{}"),
      (4L, ns(0), 2L, "click", 1.0, "{}"),
      (5L, ns(10), 2L, "view", 1.0, "{}"),
      (6L, ns(20), 2L, "purchase", 1.0, "{}"),
      (7L, day(0), 3L, "view", 1.0, "{}"),
      (8L, day(0, 10), 3L, "click", 1.0, "{}"),
      (9L, day(8), 3L, "purchase", 1.0, "{}"),
      (10L, ns(0), 4L, "purchase", 1.0, "{}"),
      (11L, ns(0), 5L, "view", 1.0, "{}"),
      (12L, ns(5), 5L, "click", 1.0, "{}"),
      (13L, ns(6), 5L, "purchase", 1.0, "{}"),
      (14L, ns(7), 5L, "click", 1.0, "{}")))
    val r = operators.ProductAnalytics.funnel(spark, dir).collect()
      .map(x => x.getInt(0) -> (x.getString(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r(1) == (("view", 4L, 1.0)))     // u1,u2,u3,u5
    assert(r(2) == (("click", 3L, 0.75)))   // u1,u3,u5 — u2's early click ignored
    assert(r(3) == (("purchase", 2L, 0.5))) // u1,u5 — u3 outside the 7-day window
  }

  test("q121: purchase must follow the click, not merely the view") {
    // view@0, purchase@5, click@10: purchase precedes step 2 → funnel stops at 2
    val dir = writeEvents(Seq(
      (1L, ns(0), 1L, "view", 1.0, "{}"),
      (2L, ns(5), 1L, "purchase", 1.0, "{}"),
      (3L, ns(10), 1L, "click", 1.0, "{}")))
    val r = operators.ProductAnalytics.funnel(spark, dir).collect()
      .map(x => x.getInt(0) -> x.getLong(2)).toMap
    assert(r(1) == 1L && r(2) == 1L && r(3) == 0L)
  }

  test("q122: cohort = first-signup day; pre-signup activity is excluded") {
    val dir = writeEvents(Seq(
      (1L, day(0), 1L, "signup", 1.0, "{}"),
      (2L, day(1), 1L, "click", 1.0, "{}"),
      (3L, day(3), 1L, "view", 1.0, "{}"),
      (4L, day(0, 60), 2L, "signup", 1.0, "{}"),
      (5L, day(0), 3L, "click", 1.0, "{}"),     // pre-signup: must not count
      (6L, day(1), 3L, "signup", 1.0, "{}"),
      (7L, day(3), 3L, "purchase", 1.0, "{}"),
      (8L, day(2), 4L, "click", 1.0, "{}")))    // never signs up: no cohort
    val r = operators.ProductAnalytics.retention(spark, dir).collect()
      .map(x => (x.getDate(0).toString, x.getLong(1)) ->
        (x.getLong(2), x.getLong(3), x.getDouble(4))).toMap
    assert(r(("1970-01-01", 0L)) == ((2L, 2L, 1.0)))
    assert(r(("1970-01-01", 1L)) == ((1L, 2L, 0.5)))
    assert(r(("1970-01-01", 3L)) == ((1L, 2L, 0.5)))
    assert(r(("1970-01-02", 0L)) == ((1L, 1L, 1.0)))
    assert(r(("1970-01-02", 2L)) == ((1L, 1L, 1.0)))
    assert(r.size == 5) // u3's day-0 click produced no (cohort, -1) cell
  }

  test("q126: last touch wins, same-instant touch never credits itself, 1-day lookback binds") {
    val dir = writeEvents(Seq(
      (1L, ns(0), 1L, "view", 0.0, "{}"),
      (2L, ns(100), 1L, "click", 0.0, "{}"),
      (3L, ns(200), 1L, "purchase", 10.0, "{}"),   // click@100 is last → click, lag 100
      (4L, ns(0), 2L, "click", 0.0, "{}"),
      (5L, ns(50), 2L, "view", 0.0, "{}"),
      (6L, ns(60), 2L, "purchase", 20.0, "{}"),    // view@50 beats click@0 → view, lag 10
      (7L, ns(0), 3L, "view", 0.0, "{}"),
      (8L, day(2), 3L, "purchase", 40.0, "{}"),    // view outside 1-day lookback → direct
      (9L, ns(500), 4L, "click", 0.0, "{}"),
      (10L, ns(500), 4L, "purchase", 80.0, "{}"))) // same-instant click: not strictly before → direct
    val r = operators.ProductAnalytics.attribution(spark, dir).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r("click") == ((1L, 10.0)))
    assert(r("view") == ((1L, 20.0)))
    assert(r("direct") == ((2L, 120.0)))
    val lag = operators.ProductAnalytics.attribution(spark, dir).collect()
      .map(x => x.getString(0) -> x.get(3)).toMap
    assert(lag("click") == 100.0 && lag("view") == 10.0 && lag("direct") == null)
  }

  test("q127: Welch statistics recover hand-computed moments on planted arms") {
    // user_id hash parity decides the arm; find two users in opposite arms
    // and plant exact 2-dp purchase values: arm X = {10.00, 12.00},
    // arm Y = {20.00} is too small for variance — use 3 values.
    def armOf(u: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$u:ab".getBytes("UTF-8")).map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(h.substring(0, 15), 16) % 2 == 0) "A" else "B"
    }
    val uA = (1L to 50L).filter(armOf(_) == "A").take(1).head
    val uB = (1L to 50L).filter(armOf(_) == "B").take(1).head
    val dir = writeEvents(Seq(
      (1L, ns(0), uA, "purchase", 10.0, "{}"),
      (2L, ns(1), uA, "purchase", 12.0, "{}"),
      (3L, ns(2), uA, "purchase", 14.0, "{}"),
      (4L, ns(3), uB, "purchase", 20.0, "{}"),
      (5L, ns(4), uB, "purchase", 26.0, "{}")))
    val x = operators.ProductAnalytics.abWelch(spark, dir).collect().head
    assert(x.getLong(0) == 3L && x.getDouble(1) == 12.0 && x.getDouble(2) == 4.0)
    assert(x.getLong(3) == 2L && x.getDouble(4) == 23.0 && x.getDouble(5) == 18.0)
    // t = (12-23)/sqrt(4/3 + 18/2) = -11/sqrt(10.3333...)
    val t = -11.0 / math.sqrt(4.0 / 3 + 9.0)
    assert(math.abs(x.getDouble(6) - t) < 1e-6)
  }

  test("q130: five users spread across all quintiles get hand-computed scores and segments") {
    // u1 best on all axes … u5 worst on all; 5 rows → ntile(5) is a
    // permutation, so every score is forced.
    val purchases = Seq(
      (1L, Seq(25L, 26L, 27L, 28L, 29L), 1.0),
      (2L, Seq(20L, 24L, 26L, 28L), 1.0),
      (3L, Seq(10L, 15L, 20L), 1.0),
      (4L, Seq(5L, 10L), 1.0),
      (5L, Seq(0L), 1.0))
    var eid = 0L
    val rows = purchases.flatMap { case (u, days, v) =>
      days.map { d => eid += 1; (eid, day(d), u, "purchase", v * u, "{}") }
    }
    val dir = writeEvents(rows)
    val r = operators.ProductAnalytics.rfmSegments(spark, dir).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2),
        x.getInt(4), x.getInt(5), x.getInt(6), x.getString(7))).toMap
    // monetary totals: u1 $5.00, u2 $8.00, u3 $9.00, u4 $8.00, u5 $5.00 —
    // asc with user_id tiebreak: u1,u5,u2,u4,u3 → m_scores 1,2,3,4,5
    assert(r(1L) == ((0L, 5L, 5, 5, 1, "champion")))
    assert(r(2L) == ((1L, 4L, 4, 4, 3, "champion")))
    assert(r(3L) == ((9L, 3L, 3, 3, 5, "big_spender")))
    assert(r(4L) == ((19L, 2L, 2, 2, 4, "regular")))
    assert(r(5L) == ((29L, 1L, 1, 1, 2, "lost")))
  }

  test("q131: a spiked day is flagged by the modified z-score; zero-MAD falls back") {
    // type 'a': daily counts 8,9,10,11,12,13,50 → med 11, MAD 2, z(50)=13.15
    // type 'b': counts 10,10,10,10,10,10,100 → MAD 0 → fallback flags c≠med
    var eid = 0L
    def burst(t: String, d: Long, n: Int) = (1 to n).map { i =>
      eid += 1; (eid, day(d, i), 1L, t, 1.0, "{}")
    }
    val rows = Seq(8, 9, 10, 11, 12, 13, 50).zipWithIndex.flatMap { case (n, d) =>
      burst("a", d.toLong, n)
    } ++ (0 to 6).flatMap { d => burst("b", d.toLong, if (d == 6) 100 else 10) }
    val dir = writeEvents(rows)
    val r = operators.ProductAnalytics.anomalyMad(spark, dir).collect()
      .map(x => (x.getString(0), x.getDate(1).toString) ->
        (x.getLong(2), x.getDouble(3), x.getDouble(4), x.get(5), x.getBoolean(6))).toMap
    val spike = r(("a", "1970-01-07"))
    assert(spike._1 == 50L && spike._2 == 11.0 && spike._3 == 2.0)
    assert(math.abs(spike._4.asInstanceOf[Double] - 13.15275) < 2e-4 && spike._5)
    assert(!r(("a", "1970-01-01"))._5)                 // z(8) ≈ -1.0118, not flagged
    assert(math.abs(r(("a", "1970-01-01"))._4.asInstanceOf[Double] + 1.01175) < 2e-4)
    val b7 = r(("b", "1970-01-07"))
    assert(b7._3 == 0.0 && b7._4 == null && b7._5)     // zero-MAD fallback
    assert(!r(("b", "1970-01-01"))._5)
  }

  test("q134: co-purchased items score cosine 1.0; support below minUsers is cut") {
    // items live in props JSON; users 1-5 share items 1+2 (c_ij=5, cosine
    // 1.0); item pair (3,4) co-occurs for only 4 users → support-filtered
    val rows = (1L to 5L).flatMap { u =>
      Seq((u * 10 + 1, ns(u * 100), u, "view", 1.0, """{"k": 1}"""),
        (u * 10 + 2, ns(u * 100 + 1), u, "view", 1.0, """{"k": 2}"""),
        (u * 10 + 3, ns(u * 100 + 2), u, "view", 1.0, """{"k": 3}""")) ++
        (if (u <= 4) Seq((u * 10 + 4, ns(u * 100 + 3), u, "view", 1.0, """{"k": 4}"""))
         else Nil)
    }
    val dir = writeEvents(rows)
    val r = operators.ProductAnalytics.itemCooccurrence(spark, dir).collect()
      .map(x => (x.getInt(0), x.getInt(1)) -> (x.getLong(2), x.getDouble(5))).toMap
    assert(r((1, 2)) == ((5L, 1.0)) && r((1, 3)) == ((5L, 1.0)) && r((2, 3)) == ((5L, 1.0)))
    assert(!r.keySet.exists(p => p._1 == 4 || p._2 == 4), "support-4 pairs must be cut")
  }

  test("q135: transition probabilities are exact count ratios over the lag order") {
    val dir = writeEvents(Seq(
      (1L, ns(0), 1L, "view", 1.0, "{}"),
      (2L, ns(10), 1L, "click", 1.0, "{}"),
      (3L, ns(20), 1L, "view", 1.0, "{}"),
      (4L, ns(30), 1L, "click", 1.0, "{}"),
      (5L, ns(40), 1L, "purchase", 1.0, "{}"),
      (6L, ns(0), 2L, "view", 1.0, "{}"),
      (7L, ns(10), 2L, "view", 1.0, "{}")))
    val r = operators.ProductAnalytics.eventTransitions(spark, dir).collect()
      .map(x => (x.getString(0), x.getString(1)) -> (x.getLong(2), x.getDouble(4))).toMap
    assert(r(("view", "click")) == ((2L, 0.666667))) // view row: 2 of 3
    assert(r(("view", "view")) == ((1L, 0.333333)))
    assert(r(("click", "view")) == ((1L, 0.5)))
    assert(r(("click", "purchase")) == ((1L, 0.5)))
    assert(r.size == 4)
  }

  test("q136: Kaplan-Meier recovers the hand-computed curve with censoring") {
    // 4 signups at day 0; conversions day 1 (x2) and day 3; one user
    // censored at the day-5 horizon. S: 0.5 → 0.25 → 0.25.
    val dir = writeEvents(Seq(
      (1L, day(0), 1L, "signup", 1.0, "{}"),
      (2L, day(0), 2L, "signup", 1.0, "{}"),
      (3L, day(0), 3L, "signup", 1.0, "{}"),
      (4L, day(0), 4L, "signup", 1.0, "{}"),
      (5L, day(1), 1L, "purchase", 1.0, "{}"),
      (6L, day(1), 2L, "purchase", 1.0, "{}"),
      (7L, day(3), 3L, "purchase", 1.0, "{}"),
      (8L, day(5), 1L, "view", 1.0, "{}")))   // sets the censoring horizon
    val r = operators.ProductAnalytics.survivalKm(spark, dir).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4)))
    assert(r.toSeq == Seq(
      1L -> ((4L, 2L, 0L, 0.5)),
      3L -> ((2L, 1L, 0L, 0.25)),
      5L -> ((1L, 0L, 1L, 0.25))))
  }

  test("q123: a gap of exactly 30 minutes starts a new session") {
    val dir = writeEvents(Seq(
      (1L, ns(0), 1L, "view", 1.0, "{}"),
      (2L, ns(100), 1L, "click", 2.0, "{}"),
      (3L, ns(200), 1L, "view", 3.0, "{}"),
      (4L, ns(3600), 1L, "view", 4.0, "{}"),
      (5L, ns(3650), 1L, "purchase", 5.0, "{}"),
      (6L, ns(0), 2L, "view", 1.0, "{}"),
      (7L, ns(1800), 2L, "view", 1.0, "{}"),    // exactly the gap: new session
      (8L, ns(0), 3L, "view", 7.5, "{}")))      // singleton session, span 0
    val r = operators.ProductAnalytics.sessionStats(spark, dir).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3), x.getLong(4), x.getDouble(5))).toMap
    assert(r(1L) == ((2L, 5L, 2.5, 200L, 15.0)))
    assert(r(2L) == ((2L, 2L, 1.0, 0L, 2.0)))
    assert(r(3L) == ((1L, 1L, 1.0, 0L, 7.5)))
  }

  test("q183: a session occupies every hour it SPANS; the daily peak flags " +
      "exactly the fullest hours") {
    // hour 0: u1 session (0:00–0:10) + u2's first session (0:05) → 2 open;
    // hour 1: u2's second session (1:50 — the 105-min gap split it) → 1;
    // hours 2 AND 3: u3's single session 2:50–3:10 spans the boundary → 1
    // each (the interval semantics a per-event count gets wrong).
    val dir = writeEvents(Seq(
      (1L, day(0, 0), 1L, "view", 1.0, "{}"),
      (2L, day(0, 600), 1L, "view", 1.0, "{}"),
      (3L, day(0, 300), 2L, "view", 1.0, "{}"),
      (4L, day(0, 6600), 2L, "view", 1.0, "{}"),
      (5L, day(0, 10200), 3L, "view", 1.0, "{}"),
      (6L, day(0, 11400), 3L, "view", 1.0, "{}")))
    val r = operators.ProductAnalytics.concurrentSessions(spark, dir).collect()
      .map(x => (x.getLong(0), x.getInt(1)) ->
        ((x.getLong(2), x.getLong(3), x.getBoolean(4)))).toMap
    assert(r == Map(
      (0L, 0) -> ((2L, 2L, true)),
      (0L, 1) -> ((1L, 2L, false)),
      (0L, 2) -> ((1L, 2L, false)),
      (0L, 3) -> ((1L, 2L, false))), s"got: $r")
  }

  test("q184: LTV accumulates in exact cents per cohort offset; pre-signup " +
      "revenue never credits the cohort") {
    // cohort day 0 = {u1, u2}; u1 buys $1.00 at offset 0 and $2.50 at
    // offset 2, u2 buys $0.50 at offset 2. u4 signs up day 1 but bought on
    // day 0 — negative offset, excluded, so cohort day 1 has no curve.
    val dir = writeEvents(Seq(
      (1L, day(0, 10), 1L, "signup", 0.0, "{}"),
      (2L, day(0, 20), 1L, "purchase", 1.00, "{}"),
      (3L, day(2, 30), 1L, "purchase", 2.50, "{}"),
      (4L, day(0, 40), 2L, "signup", 0.0, "{}"),
      (5L, day(2, 50), 2L, "purchase", 0.50, "{}"),
      (6L, day(0, 60), 4L, "purchase", 9.99, "{}"),
      (7L, day(1, 70), 4L, "signup", 0.0, "{}")))
    val r = operators.ProductAnalytics.cohortLtv(spark, dir).collect()
      .map(x => (x.getDate(0).toString, x.getLong(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5), x.getDouble(6)))).toMap
    assert(r == Map(
      ("1970-01-01", 0L) -> ((1L, 100L, 100L, 2L, 0.5)),
      ("1970-01-01", 2L) -> ((2L, 300L, 400L, 2L, 2.0))), s"got: $r")
  }

  test("q186: the delta sweep agrees with the hour explode ACROSS MIDNIGHT " +
      "(the carry its per-day windows must thread)") {
    // u1's session runs 23:50 day 0 → 00:05 day 1 — it must appear in
    // day 0 hour 23 AND day 1 hour 0, and the sweep's day-1 running sum
    // starts from a +1 carried in from day 0. u2 is a disjoint control.
    // (The events 15 min apart stay one session under the 30-min gap.)
    val dir = writeEvents(Seq(
      (1L, day(0, 86400 - 600), 1L, "view", 1.0, "{}"),
      (2L, day(1, 300), 1L, "view", 1.0, "{}"),
      (3L, day(1, 3 * 3600), 2L, "view", 1.0, "{}")))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(x => (x.getLong(0), x.getInt(1)) ->
        ((x.getLong(2), x.getLong(3), x.getBoolean(4)))).toMap
    val explode = rows(operators.ProductAnalytics.concurrentSessions(spark, dir))
    val sweep = rows(operators.ProductAnalytics.concurrentSessionsSweep(spark, dir))
    assert(explode == sweep, s"paths disagree:\nexplode $explode\nsweep   $sweep")
    assert(explode == Map(
      (0L, 23) -> ((1L, 1L, true)),
      (1L, 0) -> ((1L, 1L, true)),
      (1L, 3) -> ((1L, 1L, true))), s"got: $explode")
  }

  test("q191: streaks split on gaps, count islands, and dedup within-day noise") {
    // u1 active days 1,2,3 | 5,6 | 10 (three events on day 1 must dedup);
    // u2 a single day
    val dir = writeEvents(Seq(
      (1L, day(1), 1L, "view", 1.0, "{}"),
      (2L, day(1, 100), 1L, "click", 1.0, "{}"),
      (3L, day(1, 200), 1L, "view", 1.0, "{}"),
      (4L, day(2), 1L, "view", 1.0, "{}"),
      (5L, day(3), 1L, "view", 1.0, "{}"),
      (6L, day(5), 1L, "view", 1.0, "{}"),
      (7L, day(6), 1L, "view", 1.0, "{}"),
      (8L, day(10), 1L, "view", 1.0, "{}"),
      (9L, day(4), 2L, "view", 1.0, "{}")))
    val r = operators.ProductAnalytics.activityStreaks(spark, dir).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) == ((6L, 3L, 3L)), s"u1: ${r(1L)}")
    assert(r(2L) == ((1L, 1L, 1L)), s"u2: ${r(2L)}")
  }

  test("q192: growth accounting classifies new/retained/resurrected and " +
      "derives churn when the lapse window expires observably") {
    // u1: day 0 (new), day 1 (retained), day 10 (resurrected, gap 9 > 7)
    //     → churn at 1+7=8 (mid-gap) and at 10+7=17 (horizon-observable
    //       because u2 extends the horizon to day 17)
    // u2: day 17 (new), last-day churn at 24 NOT observable (beyond horizon)
    val dir = writeEvents(Seq(
      (1L, day(0), 1L, "view", 1.0, "{}"),
      (2L, day(1), 1L, "view", 1.0, "{}"),
      (3L, day(10), 1L, "view", 1.0, "{}"),
      (4L, day(17), 2L, "view", 1.0, "{}")))
    val r = operators.ProductAnalytics.growthAccounting(spark, dir).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))).toMap
    assert(r(0L) == ((1L, 0L, 0L, 0L, 1L)), s"day 0: ${r(0L)}")   // u1 new
    assert(r(1L) == ((0L, 1L, 0L, 0L, 0L)), s"day 1: ${r(1L)}")   // u1 retained
    assert(r(8L) == ((0L, 0L, 0L, 1L, -1L)), s"day 8: ${r(8L)}")  // u1 lapses
    assert(r(10L) == ((0L, 0L, 1L, 0L, 1L)), s"day 10: ${r(10L)}") // u1 back
    assert(r(17L) == ((1L, 0L, 0L, 1L, 0L)), s"day 17: ${r(17L)}") // u2 new, u1 out
    assert(!r.contains(24L), "u2's churn is beyond the horizon — not emitted")
    assert(r.keySet == Set(0L, 1L, 8L, 10L, 17L), s"days: ${r.keySet}")
  }
}
