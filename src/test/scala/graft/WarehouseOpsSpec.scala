package graft

import org.scalatest.funsuite.AnyFunSuite

/** Known-answer tests for the warehouse/ELT family (q139–q147) on planted
  * event timelines — the semantics the oracle hash can't pin down: the
  * compaction tie-break, SCD2 interval chaining, the 28-day MAU horizon,
  * PSI bin edges, the mean-shift alarm, sample determinism under
  * repartitioning, and exactly-once triangle counting.
  */
class WarehouseOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ns(sec: Long) = sec * 1000000000L
  private def day(d: Long, sec: Long = 0) = ns(d * 86400 + sec)

  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double, String)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-wh").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("q139: latest state wins by (ts, event_id); every version counts") {
    // u1: two versions, same-ts tie broken by event_id; u2: single row
    val dir = writeEvents(Seq(
      (1L, ns(10), 1L, "view", 1.0, "{}"),
      (3L, ns(20), 1L, "click", 2.0, "{}"),
      (2L, ns(20), 1L, "purchase", 3.0, "{}"), // same ts as event 3, lower id
      (4L, ns(5), 2L, "signup", 9.0, "{}")))
    val r = operators.WarehouseOps.changelogCompact(spark, dir).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getString(2), x.getLong(5)))).toMap
    assert(r(1L) == ((3L, "click", 3L))) // event 3 beats event 2 at the tie
    assert(r(2L) == ((4L, "signup", 1L)))
  }

  test("q140: SCD2 opens a version only on change; intervals chain gaplessly") {
    val dir = writeEvents(Seq(
      (1L, ns(0), 1L, "view", 1.0, """{"k": 7}"""),
      (2L, ns(10), 1L, "view", 1.0, """{"k": 7}"""),  // unchanged — no new version
      (3L, ns(20), 1L, "view", 1.0, """{"k": 9}"""),  // change
      (4L, ns(30), 1L, "view", 1.0, """{"k": 7}"""),  // change back — THIRD version
      (5L, ns(0), 2L, "view", 1.0, "{}")))            // no attribute → absent
    val r = operators.WarehouseOps.scd2History(spark, dir).collect()
      .map(x => (x.getLong(0), x.getInt(1)) ->
        ((x.getInt(2), x.getLong(3), Option(x.get(4)).map(_.asInstanceOf[Long]), x.getBoolean(5))))
      .toMap
    assert(r.size == 3 && !r.keys.exists(_._1 == 2L))
    assert(r((1L, 1)) == ((7, 0L, Some(20000000L), false)))
    assert(r((1L, 2)) == ((9, 20000000L, Some(30000000L), false)))
    assert(r((1L, 3)) == ((7, 30000000L, None, true)))
  }

  test("q141: MAU carries a user for 28 days; DAU only the active day") {
    // u1 active day 0 only; u2 active day 10; grid days are 0, 10, 27, 28
    val dir = writeEvents(Seq(
      (1L, day(0), 1L, "view", 1.0, "{}"),
      (2L, day(10), 2L, "view", 1.0, "{}"),
      (3L, day(27), 3L, "view", 1.0, "{}"),
      (4L, day(28), 4L, "view", 1.0, "{}")))
    val r = operators.WarehouseOps.stickiness(spark, dir).collect()
      .map(x => x.getDate(0).toString -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r("1970-01-01") == ((1L, 1L, 1L)))
    assert(r("1970-01-11") == ((1L, 1L, 2L)))  // u1 still inside the 28-day horizon
    assert(r("1970-01-28") == ((1L, 1L, 3L)))  // day 27: u1 at offset 27 still counts
    assert(r("1970-01-29") == ((1L, 2L, 3L)))  // day 28: u1 aged out; u3 (off 1) in WAU
  }

  test("q143: bin edges — min lands in bin 0, max in bin 9, halves split by date") {
    // period A: days 0..5 (boundary = d0 + (d1-d0)/2); period B: days 6..10
    val dir = writeEvents(Seq(
      (1L, day(0), 1L, "purchase", 0.00, "{}"),   // cmin → bin 0, period A
      (2L, day(5), 1L, "purchase", 100.00, "{}"), // cmax → bin 9, period A
      (3L, day(6), 1L, "purchase", 100.00, "{}"), // cmax → bin 9, period B
      (4L, day(10), 1L, "purchase", 50.00, "{}"))) // mid → bin 4, period B
    val r = operators.WarehouseOps.psiDrift(spark, dir).collect()
      .map(x => x.getInt(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r.size == 10)
    assert(r(0) == ((1L, 0L)) && r(9) == ((1L, 1L)) && r(4) == ((0L, 1L)))
    assert((0 to 9).map(b => r(b)._1 + r(b)._2).sum == 4L)
  }

  test("q144: a sustained level shift alarms; flat series stays quiet") {
    // 'shift': 21 days at 2/day then 7 days at 30/day. (A 50/50 split would
    // NOT alarm: the shift itself inflates the full-series sd so z tops out
    // at ~1.96 for any magnitude — the detector is tuned for shifts shorter
    // than half the history, which is what a changepoint is.) 'flat':
    // constant 5/day — zero variance, excluded by the sd > 0 guard.
    val rows = (0 until 28).flatMap { d =>
      val n = if (d < 21) 2 else 30
      (0 until n).map(i => (d.toLong * 1000 + i, day(d, i * 60), 1L, "shift", 1.0, "{}"))
    } ++ (0 until 28).flatMap { d =>
      (0 until 5).map(i => (100000L + d * 1000 + i, day(d, i * 60), 2L, "flat", 1.0, "{}"))
    }
    val dir = writeEvents(rows.map(r => (r._1, r._2, r._3, r._4, r._5, r._6)))
    val r = operators.WarehouseOps.changepointMeanShift(spark, dir).collect()
    val shifts = r.filter(x => x.getString(0) == "shift" && x.getBoolean(6))
    assert(shifts.nonEmpty, "planted level shift not flagged")
    assert(!r.exists(_.getString(0) == "flat"), "flat series should be sd-filtered")
    // the strongest alarm is where the trailing window is all-after and
    // the preceding window all-before: day 20 (rows 15..21 vs 8..14)
    val strongest = r.filter(_.getString(0) == "shift").maxBy(x => math.abs(x.getDouble(5)))
    assert(strongest.getLong(3) == 7L * 30 && strongest.getLong(4) == 7L * 2)
  }

  test("q145: hour cells aggregate by (dow, hod) with exact mean; dow matches Thursday epoch") {
    // two Thursdays (day 0 and day 7) at hour 3 with 2 and 4 events → mean 3
    val rows = (0 until 2).map(i => (1L + i, day(0, 3 * 3600 + i), 1L, "view", 1.0, "{}")) ++
      (0 until 4).map(i => (10L + i, day(7, 3 * 3600 + i), 1L, "view", 1.0, "{}"))
    val dir = writeEvents(rows)
    val r = operators.WarehouseOps.seasonalBaseline(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 4L && row.getLong(2) == 3L) // dow=4 (Thu), hod=3
    assert(row.getLong(3) == 2L && row.getDouble(4) == 3.0)
  }

  test("q146: sample is identical under different input partitioning") {
    val rows = (1L to 500L).map(i =>
      (i, ns(i), i % 50, if (i % 3 == 0) "view" else "click", 1.0, "{}"))
    val dir = writeEvents(rows)
    val a = operators.WarehouseOps.reservoirSample(spark, dir).collect().toSeq
    val b = {
      // same data, different physical layout: 7-way repartition rewrite
      import spark.implicits._
      val d2 = java.nio.file.Files.createTempDirectory("graft-wh2").toString
      spark.read.parquet(s"$dir/events.parquet").repartition(7)
        .write.mode("overwrite").parquet(s"$d2/events.parquet")
      operators.WarehouseOps.reservoirSample(spark, d2).collect().toSeq
    }
    assert(a == b, "reservoir sample depends on physical layout")
    assert(a.count(_.getString(0) == "view") == 10 &&
      a.count(_.getString(0) == "click") == 10)
  }

  test("q148: BFS distances from the hub; hop bound excludes the far tail") {
    // path graph 1—2—3—4—5—6—7 plus extra edges at node 2 making it the
    // hub (degree 3): 2—8. Seed = 2; dist(7) = 5 > 4 hops → absent.
    def touch(u: Long, items: Seq[Int], base: Long) =
      items.zipWithIndex.map { case (k, i) =>
        (base + i, ns(base + i), u, "view", 1.0, s"""{"k": $k}""")
      }
    val pathEdges = Seq(Seq(1, 2), Seq(2, 3), Seq(3, 4), Seq(4, 5), Seq(5, 6),
      Seq(6, 7), Seq(2, 8))
    val rows = pathEdges.zipWithIndex.flatMap { case (pair, ei) =>
      (1 to 5).flatMap(u => touch(ei * 10L + u, pair, (ei * 10L + u) * 1000))
    }
    val dir = writeEvents(rows)
    val r = operators.WarehouseOps.graphKhop(spark, dir).collect()
      .map(x => x.getInt(0) -> x.getInt(1)).toMap
    assert(r == Map(2 -> 0, 1 -> 1, 3 -> 1, 8 -> 1, 4 -> 2, 5 -> 3, 6 -> 4),
      s"unexpected BFS frontier: $r")
  }

  test("q149: perfect weekly seasonality scores wmape 0; a broken week scores > 0") {
    // 'steady': identical counts every same-weekday → wmape 0.
    // 'spiky': week 2 doubles → wmape > 0.
    val rows = (0 until 21).flatMap { d =>
      (0 until 3).map(i => (d.toLong * 100 + i, day(d, i * 60), 1L, "steady", 1.0, "{}"))
    } ++ (0 until 21).flatMap { d =>
      val n = if (d < 7) 2 else if (d < 14) 4 else 2
      (0 until n).map(i => (10000L + d * 100 + i, day(d, i * 60), 2L, "spiky", 1.0, "{}"))
    }
    val dir = writeEvents(rows)
    val r = operators.WarehouseOps.forecastBacktest(spark, dir).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(4)))).toMap
    assert(r("steady") == ((14L, 0.0)))
    assert(r("spiky")._1 == 14L && r("spiky")._2 > 0.0)
  }

  test("q150: planted violations fail exactly their checks") {
    import spark.implicits._
    val dir = writeEvents(Seq(
      (1L, ns(0), 1L, "view", 1.0, "{}"),
      (1L, ns(1), 2L, "click", 2.0, "{}"),     // duplicate event_id
      (3L, ns(2), 3L, "teleport", 3.0, "{}"),  // outside the type domain
      (4L, ns(3), 4L, "purchase", -5.0, "{}"))) // negative value
    Seq((1.0, 1L)).toDF("l_quantity", "l_orderkey")
      .union(Seq((99.0, 2L)).toDF("l_quantity", "l_orderkey")) // out of range
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((10L, 100L), (11L, 999L)).toDF("o_orderkey", "o_custkey") // 999 is orphan
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq(Tuple1(100L)).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val r = operators.WarehouseOps.dqChecks(spark, dir).collect()
      .map(x => x.getString(0) -> ((x.getLong(2), x.getBoolean(5)))).toMap
    assert(r("event_id_unique") == ((1L, false)))
    assert(r("user_id_complete") == ((0L, true)))
    assert(r("event_type_domain") == ((1L, false)))
    assert(r("value_non_negative") == ((1L, false)))
    assert(r("quantity_in_1_50") == ((1L, false)))
    assert(r("custkey_refs_customer") == ((1L, false)))
  }

  test("q147: planted triangle counts once per node; dangling edge adds none") {
    // items 1-2-3 pairwise co-touched by ≥5 users (triangle); item 4 shares
    // an edge with 1 only (dangling). Each user u touches a clique subset.
    def touch(u: Long, items: Seq[Int], base: Long): Seq[(Long, Long, Long, String, Double, String)] =
      items.zipWithIndex.map { case (k, i) =>
        (base + i, ns(base + i), u, "view", 1.0, s"""{"k": $k}""")
      }
    val rows = (1 to 6).flatMap(u => touch(u.toLong, Seq(1, 2, 3), u * 100L)) ++
      (7 to 12).flatMap(u => touch(u.toLong, Seq(1, 4), u * 100L))
    val dir = writeEvents(rows)
    val r = operators.WarehouseOps.graphTriangles(spark, dir).collect()
      .map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(r == Map(1 -> 1L, 2 -> 1L, 3 -> 1L), s"unexpected census: $r")
  }

  test("q163: recursive chain walks div-10 parents to the root; depth and cents exact") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-wh").toString
    // org 3: 3 ← 37 ← 371 ← 3712 (depths 0..3); org 5: singleton
    Seq(
      (3L, "a", 1, 10.00, "M"), (37L, "b", 1, 0.25, "M"),
      (371L, "c", 1, -1.50, "M"), (3712L, "d", 1, 2.00, "M"),
      (5L, "e", 1, 100.10, "M"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    val r = operators.WarehouseOps.recursiveHierarchy(spark, d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getInt(2), x.getLong(3)))).toMap
    assert(r == Map(
      3L -> ((4L, 3, 1075L)),   // 1000 + 25 - 150 + 200 cents
      5L -> ((1L, 0, 10010L))), s"unexpected rollup: $r")
  }

  test("q165: z-order tiles bound BOTH dims where a linear sort leaves one at full width") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-wh").toString
    // full 16x16 grid; 64 top-bit tiles => each tile is one 2x2 block
    val grid = for (x <- 0 to 15; y <- 0 to 15) yield (x.toLong, y.toLong, 1)
    grid.toDF("l_orderkey", "l_partkey", "l_linenumber")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val r = operators.WarehouseOps.zorderLayout(spark, d).collect()
    assert(r.length == 64, s"expected 64 tiles, got ${r.length}")
    r.foreach { t =>
      val (n, xs, ys) = (t.getLong(1),
        t.getLong(3) - t.getLong(2), t.getLong(5) - t.getLong(4))
      assert(n == 4L && xs == 1L && ys == 1L,
        s"tile ${t.getLong(0)}: n=$n x-span=$xs y-span=$ys (want 4/1/1)")
    }
    // the layout q165 beats: same 64 files off a linear (x, y) sort leave
    // y at full width — every file spans y 0..15 within a quarter-column
    val linearYSpan = 15L
    assert(r.map(t => t.getLong(5) - t.getLong(4)).max < linearYSpan)
  }

  test("q173: features never read past the label; missing history is null/0, not fabricated") {
    val sevenDays = 7L * 86400
    val dir = writeEvents(Seq(
      // u1: click before the label (feature), click AFTER (must not leak),
      // one view inside the 7d window, one exactly 7d earlier (excluded:
      // window is half-open [lts-7d, lts))... the boundary view at
      // lts-7d IS included (>=); the view AT lts is excluded (<).
      (1L, day(0), 1L, "view", 1.0, "{}"),                 // lts-7d exactly → in
      (2L, day(5), 1L, "click", 42.0, "{}"),               // before label → feature
      (3L, day(7), 1L, "view", 1.0, "{}"),                 // at lts → out
      (4L, day(7), 1L, "purchase", 9.0, "{}"),             // the label
      (5L, day(8), 1L, "click", 99.0, "{}"),               // AFTER label → leak if seen
      // u2: label with no clicks and no views at all
      (6L, day(3), 2L, "purchase", 5.0, "{}")))
    val r = operators.Joins.pitFeatureJoin(spark, dir).collect()
      .map(x => x.getLong(0) ->
        ((Option(x.get(3)).map(_.asInstanceOf[Double]), x.getLong(4)))).toMap
    assert(r == Map(
      4L -> ((Some(42.0), 1L)),   // last click 42, one in-window view
      6L -> ((None, 0L))), s"feature frame leaked or fabricated: $r")
    assert(sevenDays == 604800L) // the micros constant in the query, in seconds
  }

  test("q169: base partials + delta merge to exactly the full recompute") {
    // three days, last day is the delta; u2's day-2 rows exist ONLY in the
    // delta, u1 spans both sides — the merge must stitch them seamlessly
    val dir = writeEvents(Seq(
      (1L, day(0), 1L, "view", 1.00, "{}"),
      (2L, day(1), 1L, "view", 2.00, "{}"),
      (3L, day(2, 10), 1L, "view", 4.00, "{}"),
      (4L, day(2, 20), 1L, "view", 5.00, "{}"),
      (5L, day(2, 30), 2L, "click", 0.10, "{}")))
    val r = operators.WarehouseOps.incrementalAgg(spark, dir).collect()
      .map(x => (x.getString(0), x.getDate(1).toString) ->
        ((x.getLong(2), x.getLong(3), x.getDouble(4)))).toMap
    assert(r == Map(
      ("view", "1970-01-01") -> ((1L, 100L, 1.0)),
      ("view", "1970-01-02") -> ((1L, 200L, 2.0)),
      ("view", "1970-01-03") -> ((2L, 900L, 4.5)),   // merged delta day
      ("click", "1970-01-03") -> ((1L, 10L, 0.1))), s"bad merge: $r")
  }

  test("q178: a planted linear series recovers its exact slope/intercept/R²; " +
      "a flat series gets slope 0 and NULL R²") {
    // 'lin': y = 10 + 2d on days 0..4 (perfect fit); 'flat': y = 5 every day.
    val rows = (0 to 4).flatMap { d =>
      val linN = 10 + 2 * d
      (0 until linN).map(i => (d * 100L + i, day(d.toLong, i), 1L, "lin", 1.0, "{}")) ++
        (0 until 5).map(i => (d * 100L + 50 + i, day(d.toLong, 50 + i), 2L, "flat", 1.0, "{}"))
    }
    val dir = writeEvents(rows.map { case (id, ts, u, t, v, p) => (id, ts, u, t, v, p) })
    val r = operators.WarehouseOps.olsTrend(spark, dir).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2),
        x.getDouble(3), Option(x.get(4)).map(_.asInstanceOf[Double]),
        x.getDouble(5)))).toMap
    assert(r("lin") == ((5L, 2.0, 10.0, Some(1.0), 20.0)), s"lin: ${r("lin")}")
    assert(r("flat") == ((5L, 0.0, 5.0, None, 5.0)), s"flat: ${r("flat")}")
  }

  test("q179: snapshot diff classifies added/changed/unchanged with exact column lists") {
    // horizon day 10 → cutoff day 3. u1 all-pre (unchanged); u2 changes
    // count, last type AND money; u4 changes count only (zero-value event,
    // same type); u3 appears only after the cutoff (added).
    val dir = writeEvents(Seq(
      (1L, day(0), 1L, "view", 1.00, "{}"),
      (2L, day(1), 1L, "click", 2.00, "{}"),
      (3L, day(0), 2L, "view", 1.00, "{}"),
      (4L, day(10), 2L, "click", 2.00, "{}"),
      (5L, day(9), 3L, "signup", 0.50, "{}"),
      (6L, day(0), 4L, "view", 1.00, "{}"),
      (7L, day(10), 4L, "view", 0.00, "{}")))
    val r = operators.WarehouseOps.snapshotDiff(spark, dir).collect()
      .map(x => x.getLong(0) -> ((x.getString(1), x.getString(2),
        x.getLong(3), x.getLong(4), Option(x.getString(5)), x.getString(6),
        x.getLong(7), x.getLong(8)))).toMap
    assert(r(1L) == (("unchanged", "", 2L, 2L, Some("click"), "click", 300L, 300L)))
    assert(r(2L) == (("changed", "n_events,last_type,sum_cents",
      1L, 2L, Some("view"), "click", 100L, 300L)))
    assert(r(3L) == (("added", "", 0L, 1L, None, "signup", 0L, 50L)))
    assert(r(4L) == (("changed", "n_events", 1L, 2L, Some("view"), "view", 100L, 100L)))
  }

  test("q181: skew profile reports exact count percentiles and the ⌈max/mean⌉ salt") {
    import spark.implicits._
    // events: u1×6, u2×3, u3..u5×1 → n_keys 5, n_rows 12, max 6,
    // hist {1:3, 3:1, 6:1} → p50 = 1 (cum 3 ≥ ⌈2.5⌉), p90 = p99 = 6,
    // top10 covers everything (share 1.0), salt = ⌈6·5/12⌉ = 3.
    val rows = (1 to 6).map(i => (i.toLong, ns(i), 1L, "view", 1.0, "{}")) ++
      (7 to 9).map(i => (i.toLong, ns(i), 2L, "view", 1.0, "{}")) ++
      Seq((10L, ns(10), 3L, "view", 1.0, "{}"), (11L, ns(11), 4L, "view", 1.0, "{}"),
        (12L, ns(12), 5L, "view", 1.0, "{}"))
    val dir = writeEvents(rows)
    // lineitem: two suppliers × 4 rows → uniform: salt must stay 1
    Seq.tabulate(8)(i => (i.toLong, (i % 2 + 1).toLong))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = operators.WarehouseOps.keySkewProfile(spark, dir).collect()
      .map(x => x.getString(0) -> ((x.getLong(2), x.getLong(3), x.getLong(4),
        x.getLong(5), x.getLong(6), x.getLong(7), x.getDouble(8), x.getLong(9)))).toMap
    assert(r("events") == ((12L, 5L, 6L, 1L, 6L, 6L, 1.0, 3L)), s"events: ${r("events")}")
    assert(r("lineitem") == ((8L, 2L, 4L, 4L, 4L, 4L, 1.0, 1L)), s"lineitem: ${r("lineitem")}")
  }

  test("q182: k-core peels the pendant chain by CASCADE and keeps the K4 intact") {
    // Co-occurrence graph: K4 on items 1-4 (degree 3 each — the 3-core),
    // a pendant 5 hanging off 1, and 9 hanging off 5. Round 1 peels 9
    // (deg 1); that DROPS 5 to degree 1, so round 2 peels 5 — the cascade
    // a single degree filter misses. Each edge gets 5 dedicated users
    // (the support threshold), each holding exactly that edge's two items.
    val edges = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5), (5, 9))
    val rows = edges.zipWithIndex.flatMap { case ((a, b), ei) =>
      (0 until 5).flatMap { u =>
        val uid = 100L + ei * 10 + u
        Seq((uid * 10, ns(uid * 2), uid, "view", 1.0, s"""{"k": $a}"""),
          (uid * 10 + 1, ns(uid * 2 + 1), uid, "view", 1.0, s"""{"k": $b}"""))
      }
    }
    val dir = writeEvents(rows)
    val rows182 = operators.WarehouseOps.graphKcore(spark, dir).collect()
    val r = rows182.map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(r == Map(1 -> 3L, 2 -> 3L, 3 -> 3L, 4 -> 3L), s"core: $r")
    // convergence witness under k=3: round 1 peels BOTH 9 (deg 1) and 5
    // (deg 2 < 3), round 2 removes nothing — 1 effective round
    assert(rows182.map(_.getInt(2)).toSet == Set(1), s"witness: ${rows182.toSeq}")
  }

  test("q182: the peel runs to FIXPOINT — a deep pendant chain where 6 fixed " +
      "rounds would NOT converge peels completely, with the round count witnessed") {
    import spark.implicits._
    // K4 on items 1-4 (the 2-core that must survive) with a 15-node chain
    // 4—101—102—…—115 hanging off item 4. Under k=2 the chain peels ONE
    // node per round from the free end (only the current endpoint has
    // degree 1), so convergence takes 15 rounds: the r13 fixed-6 loop
    // would return nine chain nodes as spurious "core" members.
    val chain = (Seq(4) ++ (101 to 115)).sliding(2).map(p => (p(0), p(1))).toSeq
    val edges = (Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)) ++ chain)
      .toDF("a", "b")
    val r = operators.WarehouseOps.graphKcoreEdges(edges, k = 2).collect()
    val core = r.map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(core == Map(1 -> 3L, 2 -> 3L, 3 -> 3L, 4 -> 3L),
      s"fixpoint core must be exactly the K4: $core")
    assert(r.map(_.getInt(2)).toSet == Set(15), s"witness: ${r.toSeq}")
  }

  test("q190: Benford audit counts first digits exactly, zero-fills the grid, " +
      "and the chi-square decision follows the computed total") {
    // purchases 1.00, 19.99, 2.50, 0.30, 9.00 → cents 100/1999/250/30/900
    // → digits 1,1,2,3,9; a refund (-5) and a zero must be excluded
    val dir = writeEvents(Seq(
      (1L, ns(1), 1L, "purchase", 1.00, "{}"),
      (2L, ns(2), 1L, "purchase", 19.99, "{}"),
      (3L, ns(3), 2L, "purchase", 2.50, "{}"),
      (4L, ns(4), 2L, "purchase", 0.30, "{}"),
      (5L, ns(5), 3L, "purchase", 9.00, "{}"),
      (6L, ns(6), 3L, "purchase", 0.00, "{}"),
      (7L, ns(7), 3L, "view", 5.00, "{}")))
    val r = operators.WarehouseOps.benfordAudit(spark, dir).collect()
    assert(r.length == 9, "one row per digit 1..9, absent digits zero-filled")
    val byDigit = r.map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(byDigit == Map(1 -> 2L, 2 -> 1L, 3 -> 1L, 4 -> 0L, 5 -> 0L,
      6 -> 0L, 7 -> 0L, 8 -> 0L, 9 -> 1L), s"digit counts: $byDigit")
    // chi2 must match the hand formula, and the flag must follow the total
    val chi2 = (1 to 9).map { d =>
      val p = math.log(1.0 + 1.0 / d) / math.log(10.0)
      val e = 5 * p
      (byDigit(d) - e) * (byDigit(d) - e) / e
    }.sum
    val lastCum = r.last.getDouble(5)
    assert(math.abs(lastCum - chi2) < 1e-6, s"chi2 $lastCum vs $chi2")
    assert(r.forall(_.getBoolean(6) == (chi2 > 15.507)))
    val shares = r.map(_.getDouble(3)).sum
    assert(math.abs(shares - 1.0) < 1e-5, "Benford shares sum to 1")
  }

  private def writeOrders(rows: Seq[(Long, Double)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-wh").toString
    rows.zipWithIndex.map { case ((c, p), i) => (i.toLong, c, p) }
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    d
  }

  test("q193: Gini is 0 for equal revenues and (n-1)/n for total concentration") {
    val equal = operators.WarehouseOps.giniRevenue(spark,
      writeOrders(Seq((1L, 100.0), (2L, 100.0), (3L, 100.0), (4L, 100.0)))).collect()(0)
    assert((equal.getLong(0), equal.getLong(1)) == ((4L, 40000L)))
    assert(equal.getDouble(2) == 0.0, s"equal split must score 0: $equal")
    assert(equal.getDouble(3) == 0.0, "n=4 has an empty top decile (4 div 10 = 0)")

    val skew = operators.WarehouseOps.giniRevenue(spark,
      writeOrders(Seq((1L, 0.0), (2L, 0.0), (3L, 0.0), (4L, 100.0)))).collect()(0)
    assert(skew.getDouble(2) == 0.75, s"one-holder Gini must be (n-1)/n: $skew")

    // multiple orders per customer aggregate before ranking
    val multi = operators.WarehouseOps.giniRevenue(spark,
      writeOrders(Seq((1L, 60.0), (1L, 40.0), (2L, 100.0)))).collect()(0)
    assert(multi.getDouble(2) == 0.0, "per-customer totals equal → 0")
  }

  test("q194: Lorenz points hit the exact decile cutoffs per segment; " +
      "small segments back-fill share 0 below their first rank") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-wh").toString
    // segment A: 10 customers with revenue 1..10 dollars — decile d cuts
    // at rank d, bottom_share(d) = (Σ1..d)/55, Gini = 0.3 exactly;
    // segment B: 4 equal customers — deciles 1-2 cut at rank 0 (share 0),
    // Gini 0
    val aCust = (1 to 10).map(i => (i.toLong, "A"))
    val bCust = (11 to 14).map(i => (i.toLong, "B"))
    (aCust ++ bCust).toDF("c_custkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    val aOrders = (1 to 10).map(i => (i.toLong, i.toLong, i.toDouble))
    val bOrders = (11 to 14).map(i => (i.toLong, i.toLong, 5.0))
    (aOrders ++ bOrders).toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val r = operators.WarehouseOps.lorenzSegment(spark, d).collect()
      .map(x => (x.getString(0), x.getInt(1)) ->
        ((x.getLong(2), x.getDouble(3), x.getDouble(4)))).toMap
    assert(r.size == 20, s"10 deciles × 2 segments: ${r.size}")
    def sh(dd: Int) = BigDecimal((1 to dd).sum / 55.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (1 to 10).foreach { dd =>
      assert(r(("A", dd)) == ((dd.toLong, sh(dd), 0.3)), s"A/$dd: ${r(("A", dd))}")
    }
    assert(r(("B", 1)) == ((0L, 0.0, 0.0)), s"B/1: ${r(("B", 1))}")
    assert(r(("B", 2)) == ((0L, 0.0, 0.0)), s"B/2: ${r(("B", 2))}")
    assert(r(("B", 5)) == ((2L, 0.5, 0.0)), s"B/5: ${r(("B", 5))}")
    assert(r(("B", 10)) == ((4L, 1.0, 0.0)), s"B/10: ${r(("B", 10))}")
  }

  test("q195: Theil-Sen recovers a planted line EXACTLY through a corrupted " +
      "day that drags OLS off it — the breakdown-point contrast, measured") {
    // type "view": daily counts on y = 10 + 2d for days 0..8, except the
    // LAST day carries a 1000-event spike — maximum OLS leverage (a spike
    // at the center day x̄ would not move the OLS slope at all). Pairwise
    // slopes not involving day 8 are exactly 2; day-8 pairs are 8 of
    // C(9,2) = 36 — far below half, so the median slope is exactly 2.0
    // and the median residual exactly 10.0.
    val rows = (0 to 8).flatMap { d =>
      val n = if (d == 8) 1000 else 10 + 2 * d
      (0 until n).map(i => ((d * 1000 + i).toLong, day(d.toLong, i.toLong),
        1L, "view", 1.0, "{}"))
    }
    val dir = writeEvents(rows)
    val r = operators.WarehouseOps.theilSenTrend(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert((row.getString(0), row.getLong(1), row.getLong(2)) == (("view", 9L, 36L)))
    assert(row.getDouble(3) == 2.0, s"sen slope must ignore the spike: $row")
    assert(row.getDouble(4) == 10.0, s"sen intercept: $row")
    // the contrast that justifies the operator: OLS on the same series is
    // dragged far off the true slope by the single corrupted day
    val ols = operators.WarehouseOps.olsTrend(spark, dir).collect()
      .filter(_.getString(0) == "view")
    assert(ols.length == 1 && math.abs(ols.head.getDouble(2) - 2.0) > 10,
      s"fixture too tame: OLS slope ${ols.headOption.map(_.getDouble(2))}")
  }

  test("q187: KS statistic is the exact integer-ratio sup, attained at the " +
      "smallest tied value; the 5% decision follows the classic critical value") {
    // A (days 0-1) = {1.00, 2.00, 3.00}, B (days 2-3) = {3.00, 4.00, 5.00}:
    // |cumA·3 − cumB·3| over the grid = 3,6,6,3,0 → sup 6 at cents 200
    // (200 < 300 on the tie), D = 6/9 = 0.666667 < 1.358·√(6/9) → keep H0.
    val dir = writeEvents(Seq(
      (1L, day(0), 1L, "purchase", 1.00, "{}"),
      (2L, day(0, 10), 1L, "purchase", 2.00, "{}"),
      (3L, day(1), 1L, "purchase", 3.00, "{}"),
      (4L, day(2), 1L, "purchase", 3.00, "{}"),
      (5L, day(3), 1L, "purchase", 4.00, "{}"),
      (6L, day(3, 10), 1L, "purchase", 5.00, "{}")))
    val r = operators.WarehouseOps.ksDrift(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    val crit = BigDecimal(1.358 * math.sqrt(6.0 / 9))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3),
      row.getDouble(4), row.getBoolean(5)) == ((3L, 3L, 200L, 0.666667, crit, false)),
      s"got: $row")
  }
}
