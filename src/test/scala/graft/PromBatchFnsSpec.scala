package graft

import org.scalatest.funsuite.AnyFunSuite

/** Known-answer tests for the PromQL instant-vector and predict_linear
  * batch operators (q96/q97) on planted series — the invariants the oracle
  * hash can't express: irate reads ONLY the last two samples, the reset
  * rule applies to the final delta, and the regression recovers an exact
  * planted line.
  */
class PromBatchFnsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** events fixture in Tables' on-disk shape (ts = LongType nanos).
    *   ("ctr", 1): counter 10, 20, 5 (reset), 8 at t = 0/10/20/30 s
    *   ("lin", 2): exact line value = 2 + 0.5·x at the same instants
    */
  private lazy val dir: String = {
    import spark.implicits._
    def ns(sec: Long) = sec * 1000000000L
    val rows = Seq(
      (1L, ns(0), 1L, "ctr", 10.0, "{}"),
      (2L, ns(10), 1L, "ctr", 20.0, "{}"),
      (3L, ns(20), 1L, "ctr", 5.0, "{}"),
      (4L, ns(30), 1L, "ctr", 8.0, "{}"),
      (5L, ns(0), 2L, "lin", 2.0, "{}"),
      (6L, ns(10), 2L, "lin", 7.0, "{}"),
      (7L, ns(20), 2L, "lin", 12.0, "{}"),
      (8L, ns(30), 2L, "lin", 17.0, "{}"))
    val d = java.nio.file.Files.createTempDirectory("graft-prom").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("q96: irate/idelta come from the last two samples; delta is last-first") {
    val r = operators.EventAnalytics.promInstant(spark, dir).collect()
      .map(x => (x.getString(0), x.getLong(1)) ->
        (x.get(2), x.getDouble(3), x.getDouble(4), x.getLong(5))).toMap
    // ctr: final delta 8-5 = +3 over 10 s → irate 0.3 (the earlier +10 and
    // the reset must NOT contribute); delta_over_time = 8-10 (gauge, no
    // reset correction — Prometheus delta() semantics)
    assert(r(("ctr", 1L)) == ((0.3, 3.0, -2.0, 4L)))
    // lin: final delta +5 over 10 s
    assert(r(("lin", 2L)) == ((0.5, 5.0, 15.0, 4L)))
  }

  test("q96: a reset AT the last sample restarts irate from the post-reset value") {
    import spark.implicits._
    def ns(sec: Long) = sec * 1000000000L
    val d = java.nio.file.Files.createTempDirectory("graft-prom2").toString
    Seq((1L, ns(0), 1L, "c", 100.0, "{}"), (2L, ns(10), 1L, "c", 4.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val row = operators.EventAnalytics.promInstant(spark, d).collect().head
    assert(row.getDouble(2) == 0.4) // counter restarted: increase = 4, not -96
    assert(row.getDouble(3) == -96.0) // idelta is the raw instant delta
  }

  test("q97: regression recovers the planted line exactly; p90 interpolates") {
    val r = operators.EventAnalytics.promPredictLinear(spark, dir).collect()
      .map(x => (x.getString(0), x.getLong(1)) ->
        (x.getLong(2), x.getDouble(3), x.getDouble(4), x.getDouble(5), x.getDouble(6))).toMap
    // value = 2 + 0.5·x sampled at x = 0..30 → slope 0.5, intercept 2,
    // prediction at x_end + 300 s = 2 + 0.5·330 = 167
    assert(r(("lin", 2L)) == ((4L, 0.5, 2.0, 167.0, 15.5)))
    // p90 of [2,7,12,17]: rank 0.9·3 = 2.7 → 12 + 0.7·5 = 15.5 (checked
    // above); the ctr series regresses through the reset — only sanity-
    // check its sample count here
    assert(r(("ctr", 1L))._1 == 4L)
  }

  test("q97: a tiny negative slope rounds to bit-exact +0.0, never -0.0") {
    import spark.implicits._
    def ns(sec: Long) = sec * 1000000000L
    val d = java.nio.file.Files.createTempDirectory("graft-prom0").toString
    // slope = -1e-9/s: value drops by 1e-7 over 100 s. round(−1e-9, 6) is
    // the signed-zero trap — DuckDB keeps the IEEE sign (−0.0), Spark
    // doesn't, and the driver hashes bits. The +0.0 normalization must make
    // the output bit-identical to +0.0.
    Seq((1L, ns(0), 1L, "z", 1.0, "{}"), (2L, ns(100), 1L, "z", 1.0 - 1e-7, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val row = operators.EventAnalytics.promPredictLinear(spark, d).collect().head
    val slope = row.getDouble(3)
    assert(slope == 0.0)
    assert(java.lang.Double.doubleToRawLongBits(slope) == 0L,
      s"slope must be +0.0, got bits ${java.lang.Double.doubleToRawLongBits(slope)}")
  }

  test("q98: histogram quantile interpolates inside the target bucket") {
    import spark.implicits._
    def ns(sec: Long) = sec * 1000000000L
    val d = java.nio.file.Files.createTempDirectory("graft-prom3").toString
    // values 1..20 in one hour → buckets le=1:1, 2:1, 5:3, 10:5, 25:10
    // (cum 1,2,5,10,20); 0.95·20 = 19 lands in le=25: lo=10, cumlo=10,
    // cnt=10 → p95 = 10 + 15·(19−10)/10 = 23.5
    (1 to 20).map(i => (i.toLong, ns(i), 1L, "lat", i.toDouble, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val row = operators.EventAnalytics.promHistogramQuantile(spark, d).collect().head
    assert(row.getLong(2) == 20L)
    assert(math.abs(row.getDouble(3) - 23.5) < 1e-9)
  }

  test("q98: empty intermediate buckets do not widen the interpolation span") {
    import spark.implicits._
    def ns(sec: Long) = sec * 1000000000L
    val d = java.nio.file.Files.createTempDirectory("graft-prom4").toString
    // values 1 and 30: buckets le=1 (cnt 1) and le=50 (cnt 1), everything
    // between empty. 0.95·2 = 1.9 lands in le=50; promql interpolates from
    // the previous LADDER bound 25 (not from the previous non-empty bucket
    // 1): p95 = 25 + 25·(1.9−1)/1 = 47.5
    Seq((1L, ns(1), 1L, "g", 1.0, "{}"), (2L, ns(2), 1L, "g", 30.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val row = operators.EventAnalytics.promHistogramQuantile(spark, d).collect().head
    assert(math.abs(row.getDouble(3) - 47.5) < 1e-9)
  }

  test("q99: vector matching keeps only users present on both sides") {
    import spark.implicits._
    def ns(sec: Long) = sec * 1000000000L
    val d = java.nio.file.Files.createTempDirectory("graft-prom5").toString
    // user 1: error rate 2/s (0->20 over 10 s), click rate 4/s → ratio 0.5
    // user 2: errors only; user 3: clicks only — both must DROP (inner
    // join, promql's default binary-op matching)
    Seq(
      (1L, ns(0), 1L, "error", 0.0, "{}"), (2L, ns(10), 1L, "error", 20.0, "{}"),
      (3L, ns(0), 1L, "click", 0.0, "{}"), (4L, ns(10), 1L, "click", 40.0, "{}"),
      (5L, ns(0), 2L, "error", 0.0, "{}"), (6L, ns(10), 2L, "error", 5.0, "{}"),
      (7L, ns(0), 3L, "click", 0.0, "{}"), (8L, ns(10), 3L, "click", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = operators.EventAnalytics.promVectorRatio(spark, d).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(0) == 1L)
    assert(rows.head.getDouble(1) == 2.0 && rows.head.getDouble(2) == 4.0)
    assert(rows.head.getDouble(3) == 0.5)
  }

  test("q101: group_left copies the one side's label; unmatched rows drop both ways") {
    import spark.implicits._
    def ns(sec: Long) = sec * 1000000000L
    val d = java.nio.file.Files.createTempDirectory("graft-prom7").toString
    // user 1: rate 2/s, has an info row (GOLD, quota 4.0) → kept, segment
    // copied, rate/quota = 0.5. user 3: rate but NO info row → drops
    // (many side unmatched). customer 2: info but no series → drops
    // (one side unmatched) — promql CardManyToOne inner semantics.
    Seq((1L, ns(0), 1L, "m", 0.0, "{}"), (2L, ns(10), 1L, "m", 20.0, "{}"),
      (3L, ns(0), 3L, "m", 0.0, "{}"), (4L, ns(10), 3L, "m", 20.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    Seq((1L, "u1", 0, 3.0, "GOLD"), (2L, "u2", 0, 7.0, "SILVER"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    val rows = operators.EventAnalytics.promGroupLeft(spark, d).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getString(0), r.getLong(1), r.getString(2), r.getDouble(3),
      r.getDouble(4)) == (("m", 1L, "GOLD", 2.0, 0.5)))
  }

  test("q102: offset picks the newest sample at or before eval-offset; absent fires per catalog") {
    import spark.implicits._
    def ns(sec: Long) = sec * 1000000000L
    val d = java.nio.file.Files.createTempDirectory("graft-prom8").toString
    // click: 1.0@0, 3.0@50, then DUPLICATE timestamp 200 with 6.0 and 7.0
    //   (tiebreak: larger value wins, the family rule) → v_now 7.0;
    //   offset 100 s from eval_ts 200 → cutoff 100 → v_prev 3.0, diff 4.0.
    // error: only a sample AFTER the cutoff → present (not absent) but
    //   drops from the diff rows (binary-op inner semantics).
    // The other 5 catalog metrics never report → absent rows, first.
    Seq((1L, ns(0), 1L, "click", 1.0, "{}"), (2L, ns(50), 1L, "click", 3.0, "{}"),
      (3L, ns(200), 1L, "click", 6.0, "{}"), (4L, ns(200), 1L, "click", 7.0, "{}"),
      (5L, ns(150), 1L, "error", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = operators.EventAnalytics.promOffsetAbsent(spark, d, offsetSec = 100L)
      .collect()
    val (absent, diffs) = rows.partition(_.getLong(5) == 1L)
    assert(absent.map(_.getString(0)).toSeq ==
      Seq("gc_seconds", "latency_p99", "purchase", "signup", "view"))
    assert(absent.forall(r => r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(4)))
    assert(diffs.map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4))).toSeq == Seq(("click", 1L, 7.0, 3.0, 4.0)))
  }

  test("hour buckets floor toward -inf: pre-1970 samples match the oracle's // semantics") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-prom9").toString
    // ts = -30 min: truncating division buckets it at hour 0 (1970-01-01
    // 00:00), floor division at hour -1 (1969-12-31 23:00) — DuckDB's //
    // floors, so the Spark side must too (ADVICE r09).
    Seq((1L, -1800L * 1000000000L, 1L, "g", 2.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val row = operators.EventAnalytics.promOverTime(spark, d).collect().head
    assert(row.getTimestamp(1).getTime == -3600L * 1000L,
      s"expected 1969-12-31 23:00 UTC, got ${row.getTimestamp(1)}")
  }

  test("q103: subquery evaluates the inner grid then folds it per series") {
    import spark.implicits._
    def ns(sec: Long) = sec * 1000000000L
    val d = java.nio.file.Files.createTempDirectory("graft-prom10").toString
    // the q100 planted grid (one increase of 10, visible from 5 aligned
    // steps) folded by the outer max/avg: every step's micro-rate is
    // round(10e6/86400) = 116 ppm, so max = 0.000116 and avg rounds to
    // 0.0001 — the nested eval must see 5 grid points, not 1 sample
    Seq((1L, ns(0), 1L, "c", 0.0, "{}"), (2L, ns(21600), 1L, "c", 10.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = operators.EventAnalytics.promSubquery(spark, d).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(2) == 5L, "n_steps")
    assert(r.getDouble(3) == 0.000116, "max_rate")
    assert(r.getDouble(4) == 0.0001, "avg_rate")
  }

  test("q104: label_replace derives tier, label_join builds series, clamp bounds the rate") {
    val r = operators.EventAnalytics.promLabelOps(spark, dir).collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getString(2), x.getString(3), x.getDouble(4), x.getInt(5))).toMap
    // ctr rate = (10+5+3)/30 = 0.6, lin = 15/30 = 0.5: both clamp to the
    // 3e-4 ceiling; tier is the user label's leading digit, series the
    // ':'-joined identity, and each metric's single series ranks rn=1
    assert(r("ctr") == ((1L, "t1", "ctr:t1", 0.0003, 1)))
    assert(r("lin") == ((2L, "t2", "lin:t2", 0.0003, 1)))
  }

  test("q105: changes counts non-zero deltas only; resets counts negative ones") {
    import spark.implicits._
    def ns(sec: Long) = sec * 1000000000L
    val d = java.nio.file.Files.createTempDirectory("graft-prom11").toString
    // planted flat stretch: 1,1,2 → ONE change (the repeated sample is not
    // a change — prometheus funcChanges counts v_i != v_{i-1})
    Seq((1L, ns(0), 1L, "g", 1.0, "{}"), (2L, ns(10), 1L, "g", 1.0, "{}"),
        (3L, ns(20), 1L, "g", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val flat = operators.EventAnalytics.promChangesResets(spark, d).collect().head
    assert((flat.getLong(2), flat.getLong(3), flat.getLong(4)) == ((3L, 1L, 0L)))
    val r = operators.EventAnalytics.promChangesResets(spark, dir).collect()
      .map(x => x.getString(0) ->
        (x.getLong(3), x.getLong(4), x.getDouble(5), x.getDouble(6))).toMap
    // ctr deltas +10/-15/+3: 3 changes, 1 reset; stddev_pop([10,20,5,8]) =
    // sqrt(31.6875); last_over_time is the newest sample
    assert(r("ctr") == ((3L, 1L, 5.6292, 8.0)))
    assert(r("lin") == ((3L, 0L, 5.5902, 17.0)))
  }

  test("q106: holt_winters folds the prometheus recurrence; an exact line smooths to itself") {
    val r = operators.EventAnalytics.promHoltWinters(spark, dir).collect()
      .map(x => x.getString(0) -> (x.getLong(2), x.getDouble(3), x.getDouble(4))).toMap
    // hand-computed fold (sf=0.3, tf=0.1) over ctr=[10,20,5,8]:
    //   s1=10, b=10 → s=20 → s=22.5 → s=24.625, b=9.25
    assert(r("ctr") == ((4L, 24.625, 9.25)))
    // lin is the exact line 2+0.5x: level tracks it perfectly and the
    // trend locks to the true +5/sample slope — the smoothing fixed point
    assert(r("lin") == ((4L, 17.0, 5.0)))
  }

  test("q107: aggregation operators fold the cross-series rate vector per metric") {
    import spark.implicits._
    def ns(sec: Long) = sec * 1000000000L
    val d = java.nio.file.Files.createTempDirectory("graft-prom12").toString
    // three counters of metric "m": increases 3/30s, 6/30s, 9/30s →
    // rates 0.1/0.2/0.3 = 100000/200000/300000 ppm
    val rows = for ((u, inc) <- Seq((1L, 1.0), (2L, 2.0), (3L, 3.0));
                    i <- 0 to 3)
      yield (u * 10 + i, ns(10L * i), u, "m", inc * i, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = operators.EventAnalytics.promAggAcross(spark, d).collect().head
    assert(r.getString(0) == "m" && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 200000.0, "avg")
    // stddev_pop([1e5,2e5,3e5]) = sqrt(2/3)·1e5; stdvar its square
    assert(r.getDouble(3) == 81649.6581, "stddev")
    assert(r.getDouble(4) == 6666666666.6667, "stdvar")
    assert(r.getDouble(5) == 200000.0, "p50")
    assert(r.getDouble(6) == 280000.0, "p90 interpolates: 2e5 + 0.8·1e5")
    assert(r.getLong(7) == 1L, "group")
  }

  test("q108: count_values fingerprints series stuck at identical rates") {
    import spark.implicits._
    def ns(sec: Long) = sec * 1000000000L
    val d = java.nio.file.Files.createTempDirectory("graft-prom13").toString
    // two series at the same 0.1/s rate, one at 0.3/s
    val rows = for ((u, inc) <- Seq((1L, 1.0), (2L, 1.0), (3L, 3.0));
                    i <- 0 to 3)
      yield (u * 10 + i, ns(10L * i), u, "m", inc * i, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = operators.EventAnalytics.promCountValues(spark, d).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(r == Map(("m", "100000") -> 2L, ("m", "300000") -> 1L))
  }

  test("q109: gaps-and-islands finds the longest absence, leading gaps included") {
    import spark.implicits._
    def hr(h: Long) = h * 3600L * 1000000000L
    val d = java.nio.file.Files.createTempDirectory("graft-prom14").toString
    // corpus spans hours 0..5: click present {0,1,5} → inner gap 3;
    // error present {5} only → LEADING gap 5; the other 5 catalog
    // metrics never report → absent the whole 6-hour spine
    Seq((1L, hr(0), 1L, "click", 1.0, "{}"), (2L, hr(1), 1L, "click", 2.0, "{}"),
        (3L, hr(5), 1L, "click", 3.0, "{}"), (4L, hr(5), 2L, "error", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = operators.EventAnalytics.promAbsentOverTime(spark, d).collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r("click") == ((6L, 3L, 3L, 3L)))
    assert(r("error") == ((6L, 1L, 5L, 5L)))
    assert(r("gc_seconds") == ((6L, 0L, 6L, 6L)))
    assert(r.size == 7)
  }

  test("q100: one increase lands in exactly the steps whose 24h window holds it") {
    import spark.implicits._
    def ns(sec: Long) = sec * 1000000000L
    val d = java.nio.file.Files.createTempDirectory("graft-prom6").toString
    // counter 0 -> 10 with the delta at t = 21600 s: visible from every
    // aligned 6h step s with s-86400 <= 21600 <= s → s = 21600..108000,
    // exactly 5 grid points, each reporting increase 10
    Seq((1L, ns(0), 1L, "c", 0.0, "{}"), (2L, ns(21600), 1L, "c", 10.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = operators.EventAnalytics.promRangeEval(spark, d).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq(21600L, 43200L, 64800L, 86400L, 108000L))
    assert(rows.forall(r => r._2 == 1L && r._3 == 1L && r._4 == 10.0))
  }

  test("q111: dow/hour are promql UTC integers — epoch day 0 is Thursday, Sunday is 0") {
    import spark.implicits._
    def ns(sec: Long) = sec * 1000000000L
    val d = java.nio.file.Files.createTempDirectory("graft-prom7").toString
    // 1970-01-01 (a Thursday → dow 4) 00:30 and 1970-01-04 (the first
    // Sunday → dow 0) 05:xx from two distinct series
    Seq((1L, ns(1800), 1L, "m", 1.0, "{}"),
        (2L, ns(3 * 86400 + 5 * 3600 + 60), 1L, "m", 3.0, "{}"),
        (3L, ns(3 * 86400 + 5 * 3600 + 120), 2L, "m", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = operators.EventAnalytics.promTimeFns(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rows == Map(
      (4L, 0L) -> ((1L, 1L, 1.0)),   // Thursday hour 0: one event, one series
      (0L, 5L) -> ((2L, 2L, 4.0))))  // Sunday hour 5: two series, mean 4.0
  }

  test("q115: deriv recovers the planted slope; math fns and sort_desc hold") {
    // The shared fixture: ("lin", 2) is the exact line 2 + 0.5·x (deriv
    // 0.5, avg 9.5); ("ctr", 1) regresses 10/20/5/8 on x = 0/10/20/30 to
    // slope −105/500 = −0.21. sort_desc puts lin first.
    val rows = operators.EventAnalytics.promDerivMath(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(3), r.getDouble(4), r.getInt(5), r.getDouble(6),
          r.getDouble(7), r.getLong(8), r.getLong(9)))).toMap
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    assert(rows(("lin", 2L)) == ((0.5, 9.5, 1, r6(math.sqrt(9.5)),
      r6(math.log(10.5) / math.log(2.0)), 10L, 9L)))
    assert(rows(("ctr", 1L)) == ((-0.21, 10.75, -1, r6(math.sqrt(10.75)),
      r6(math.log(11.75) / math.log(2.0)), 11L, 10L)))
    val order = operators.EventAnalytics.promDerivMath(spark, dir).collect()
      .map(_.getString(0))
    assert(order.toSeq == Seq("lin", "ctr")) // sort_desc by deriv
  }

  test("q171: grid points interpolate linearly between brackets; on-sample points are exact") {
    import spark.implicits._
    def ns(sec: Long) = sec * 1000000000L
    // 'ramp': value = t/60 at t = 30 m and 150 m → hourly grid at 60 m and
    // 120 m must lerp to 60 and 120; 'flat': samples AT grid instants
    val rows = Seq(
      (1L, ns(1800), 1L, "ramp", 30.0, "{}"),
      (2L, ns(9000), 1L, "ramp", 150.0, "{}"),
      (3L, ns(3600), 2L, "flat", 7.0, "{}"),
      (4L, ns(7200), 2L, "flat", 9.0, "{}"))
    val d = java.nio.file.Files.createTempDirectory("graft-gap").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = operators.EventAnalytics.gapFill(spark, d).collect()
      .map(x => (x.getString(0), x.getTimestamp(1).getTime / 1000) -> x.getDouble(2))
      .toMap
    assert(r == Map(
      ("ramp", 3600L) -> 60.0, ("ramp", 7200L) -> 120.0,
      ("flat", 3600L) -> 7.0, ("flat", 7200L) -> 9.0), s"unexpected fill: $r")
  }
}
