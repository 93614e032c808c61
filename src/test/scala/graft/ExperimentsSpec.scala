package graft

import org.scalatest.funsuite.AnyFunSuite

/** Known-answer tests for the experimentation family (q151–q154) plus the
  * q152/q153 graph-rule queries: bootstrap determinism and CI coverage,
  * rule metrics, label-propagation convergence, and the position-based
  * credit split.
  */
class ExperimentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ns(sec: Long) = sec * 1000000000L
  private def day(d: Long, sec: Long = 0) = ns(d * 86400 + sec)

  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double, String)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-ex").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("q151: bootstrap is deterministic across runs and physical layouts") {
    val rows = (1L to 400L).map(i =>
      (i, ns(i), i, "purchase", (i % 37).toDouble + 0.25, "{}"))
    val dir = writeEvents(rows)
    val a = operators.Experiments.abBootstrap(spark, dir).collect().toSeq
    val dir2 = {
      import spark.implicits._
      val d2 = java.nio.file.Files.createTempDirectory("graft-ex2").toString
      spark.read.parquet(s"$dir/events.parquet").repartition(7)
        .write.mode("overwrite").parquet(s"$d2/events.parquet")
      d2
    }
    val b = operators.Experiments.abBootstrap(spark, dir2).collect().toSeq
    assert(a == b, "bootstrap depends on physical layout")
    assert(a.head.getLong(0) == 100L)
  }

  test("q151: CI brackets the observed diff for an A/A-style null effect") {
    // same value distribution in both arms (value independent of user):
    // the CI must contain 0 and significance must be false
    val rows = (1L to 600L).map(i =>
      (i, ns(i), i, "purchase", 10.0 + (i % 5), "{}"))
    val dir = writeEvents(rows)
    val r = operators.Experiments.abBootstrap(spark, dir).collect().head
    val (lo, hi, sig) = (r.getDouble(2), r.getDouble(3), r.getBoolean(4))
    assert(lo <= hi)
    assert(lo < 0 && hi > 0, s"null-effect CI should straddle 0: [$lo, $hi]")
    assert(!sig)
  }

  test("q152: confidence is directional and lift is symmetric") {
    // items 1 and 2 co-touched by 5 users; item 1 also touched alone by 5
    // more → conf(1→2) = 0.5, conf(2→1) = 1.0, same lift both ways
    def touch(u: Long, items: Seq[Int]) =
      items.zipWithIndex.map { case (k, i) =>
        (u * 100 + i, ns(u * 100 + i), u, "view", 1.0, s"""{"k": $k}""")
      }
    val rows = (1 to 5).flatMap(u => touch(u.toLong, Seq(1, 2))) ++
      (6 to 10).flatMap(u => touch(u.toLong, Seq(1)))
    val dir = writeEvents(rows)
    val r = operators.Experiments // placeholder to keep import shape
    val rules = operators.WarehouseOps.assocRules(spark, dir).collect()
      .map(x => (x.getInt(0), x.getInt(1)) ->
        ((x.getLong(2), x.getDouble(5), x.getDouble(6), x.getDouble(7)))).toMap
    // N=10 users, c_1=10, c_2=5, c_12=5
    assert(rules((1, 2)) == ((5L, 0.5, 0.5, 1.0)))
    assert(rules((2, 1)) == ((5L, 0.5, 1.0, 1.0)))
  }

  test("q153: two planted cliques joined by one bridge resolve to two communities") {
    // clique A = items 1,2,3; clique B = items 11,12,13; bridge edge 3—11.
    // After 4 sync rounds every member adopts its clique's minimum label.
    def touch(u: Long, items: Seq[Int], base: Long) =
      items.zipWithIndex.map { case (k, i) =>
        (base + i, ns(base + i), u, "view", 1.0, s"""{"k": $k}""")
      }
    val rows =
      (1 to 5).flatMap(u => touch(u.toLong, Seq(1, 2, 3), u * 100L)) ++
      (11 to 15).flatMap(u => touch(u.toLong, Seq(11, 12, 13), u * 100L)) ++
      (21 to 25).flatMap(u => touch(u.toLong, Seq(3, 11), u * 100L))
    val dir = writeEvents(rows)
    val r = operators.WarehouseOps.graphLabelProp(spark, dir).collect()
      .map(x => x.getInt(0) -> ((x.getLong(1), x.getInt(2))))
    val total = r.map(_._2._1).sum
    assert(total == 6L, s"all 6 nodes must be labeled: $r")
    assert(r.length == 2, s"expected exactly two communities: ${r.toSeq}")
    assert(r.map(_._2._1).toSet == Set(3L), s"3+3 split expected: ${r.toSeq}")
  }

  test("q155: step latencies floor to seconds; p50 interpolates between users") {
    // u1: view@0 click@10 purchase@30 → lats 10, 20
    // u2: view@0 click@40 (no purchase) → lat 40
    val dir = writeEvents(Seq(
      (1L, ns(0), 1L, "view", 1.0, "{}"),
      (2L, ns(10), 1L, "click", 1.0, "{}"),
      (3L, ns(30), 1L, "purchase", 1.0, "{}"),
      (4L, ns(0), 2L, "view", 1.0, "{}"),
      (5L, ns(40), 2L, "click", 1.0, "{}")))
    val r = operators.Experiments.funnelLatency(spark, dir).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3), x.getLong(5)))).toMap
    assert(r("1_view_to_click") == ((2L, 10L, 25.0, 40L))) // p50 of {10,40}
    assert(r("2_click_to_purchase") == ((1L, 20L, 20.0, 20L)))
  }

  test("q156: clickers retain, non-clickers churn — the click row shows the signal") {
    // 4 signup users: u1,u2 click in week 1 AND come back day 20;
    // u3,u4 don't click and never return. Everyone views on day 0.
    val rows = (1L to 4L).flatMap { u =>
      Seq((u * 10, day(0, u), u, "signup", 1.0, "{}"),
        (u * 10 + 1, day(0, u + 10), u, "view", 1.0, "{}")) ++
        (if (u <= 2) Seq((u * 10 + 2, day(1, u), u, "click", 1.0, "{}"),
          (u * 10 + 3, day(20, u), u, "view", 1.0, "{}"))
        else Seq.empty)
    }
    val dir = writeEvents(rows)
    val r = operators.Experiments.retentionDrivers(spark, dir).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getDouble(5)))).toMap
    assert(r("click") == ((2L, 0L, 0L, 2L, 25.0))) // (2.5*2.5)/(0.5*0.5)
    assert(r("view")._1 == 2L && r("view")._4 == 0L) // all exposed; 2 retained
    assert(r("purchase")._1 == 0L && r("purchase")._3 == 2L)
  }

  test("q157: hand-computed entropy for a planted journey") {
    // u1: a b a b a c → transitions ab,ba,ab,ba,ac (counts 2,2,1; n=5)
    // entropy = -2*(0.4 ln 0.4) - 0.2 ln 0.2 = 1.054920
    val seq1 = Seq("view", "click", "view", "click", "view", "purchase")
    val rows = seq1.zipWithIndex.map { case (t, i) =>
      ((i + 1).toLong, ns(i * 10), 1L, t, 1.0, "{}")
    } ++ Seq((100L, ns(0), 2L, "view", 1.0, "{}")) // no transitions → absent
    val dir = writeEvents(rows)
    val r = operators.Experiments.pathEntropy(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == 1L && row.getLong(1) == 5L && row.getLong(2) == 3L)
    assert(row.getDouble(3) == 1.05492)
  }

  test("q154: credit splits 100 / 50-50 / 40-40-20 by touch count") {
    // u1: no touches → direct 100% of 10.00
    // u2: one view → view 100% of 20.00
    // u3: view then click → 50/50 of 40.00
    // u4: view, click, view, then purchase → first view 40% + last view 40%
    //     (= 80% of 80.00) + middle (click) 20%
    // u5: touch outside the 1-day lookback → direct
    val rows = Seq(
      (1L, ns(100), 1L, "purchase", 10.0, "{}"),
      (10L, ns(50), 2L, "view", 0.0, "{}"),
      (11L, ns(100), 2L, "purchase", 20.0, "{}"),
      (20L, ns(10), 3L, "view", 0.0, "{}"),
      (21L, ns(20), 3L, "click", 0.0, "{}"),
      (22L, ns(100), 3L, "purchase", 40.0, "{}"),
      (30L, ns(10), 4L, "view", 0.0, "{}"),
      (31L, ns(20), 4L, "click", 0.0, "{}"),
      (32L, ns(30), 4L, "view", 0.0, "{}"),
      (33L, ns(100), 4L, "purchase", 80.0, "{}"),
      (40L, ns(0), 5L, "view", 0.0, "{}"),
      (41L, ns(90000), 5L, "purchase", 50.0, "{}")) // view 25h earlier
    val dir = writeEvents(rows)
    val r = operators.Experiments.attributionPosition(spark, dir).collect()
      .map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(r("direct") == 60.0)                 // u1 10 + u5 50
    assert(r("view") == 20.0 + 20.0 + 64.0)     // u2 100% + u3 first 50% + u4 80%
    assert(r("click") == 20.0)                  // u3 last 50%
    assert(r("middle") == 16.0)                 // u4 20%
  }
}
