package graft

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial boundary fixtures for the range/as-of join family
  * (VERDICT r19 #7: q16/q17 predate the plan-pin discipline and their
  * boundary semantics — strict vs inclusive window edges, same-timestamp
  * tie-breaks, the bucketed variant's residue path — were pinned only by
  * the oracle hash over testdata, which contains no planted edge cases):
  *
  *   - q16/q91 window edges: `cts < pts` is STRICT (a click AT the
  *     purchase instant is not "before" it) and `cts >= pts − 24h` is
  *     INCLUSIVE (a click exactly 24 h earlier counts);
  *   - q17/q57/q58/q63 tie-break: clicks at the purchase's own timestamp
  *     ARE eligible (`cts <= pts`), and among same-timestamp clicks the
  *     LARGEST click_id wins (`ORDER BY cts DESC, click_id DESC`);
  *   - q57's residue phase: a purchase whose nearest click is older than
  *     its own + preceding 7-day bucket must still match (phase 2);
  *   - a purchase with NO prior click emits NO row (inner as-of), in all
  *     four physical forms.
  *
  * The purchase sits EXACTLY on a 24 h bucket boundary — the q91 edge
  * where the exploded (own, preceding) bucket pair is load-bearing. */
class JoinBoundarySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val H = 3600L * 1000000 // one hour in MICROS
  private val D = 24 * H
  private val T0 = 40 * D // exactly on a 24h bucket boundary

  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double, String)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-jb").toString
    // fixture ts column: unannotated INT64 nanos (the loader's fixture leg)
    rows.map { case (id, usec, u, t, v, p) => (id, usec * 1000L, u, t, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private lazy val dir = writeEvents(Seq(
    // user 1: every q16 window edge + the q17 same-timestamp tie
    (100L, T0, 1L, "purchase", 0.0, """{"k": 1}"""),
    (10L, T0, 1L, "click", 0.0, """{"k": 1}"""),          // AT pts: q16 out, q17 in
    (11L, T0, 1L, "click", 0.0, """{"k": 1}"""),          // same ts, larger id: q17's pick
    (12L, T0 - D, 1L, "click", 0.0, """{"k": 1}"""),      // exactly 24h: q16 IN
    (13L, T0 - D - 1, 1L, "click", 0.0, """{"k": 1}"""),  // 24h + 1us: q16 out
    (14L, T0 - H, 1L, "click", 0.0, """{"k": 1}"""),      // mid-window: q16 in
    // user 2: nearest click 20 days back — q57's residue phase
    (200L, T0, 2L, "purchase", 0.0, """{"k": 1}"""),
    (20L, T0 - 20 * D, 2L, "click", 0.0, """{"k": 1}"""),
    // user 3: purchase with no click at all — no as-of row
    (300L, T0, 3L, "purchase", 0.0, """{"k": 1}"""),
    (30L, T0 - H, 3L, "view", 0.0, """{"k": 1}""")))

  test("q16/q91 window edges: strict upper, inclusive 24h lower — and the " +
      "bucketed form agrees with the purchase ON a bucket boundary") {
    // user 1: clicks 12 (exactly 24h) + 14 (mid-window); 10/11 AT pts and
    // 13 one microsecond too old are all out. users 2/3: nothing in range.
    val expect = Seq((1L, 2L))
    for (q <- Seq("q16_join_range", "q91_join_range_bucketed")) {
      val got = SparkEntry.queries(q)(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === expect, q)
    }
  }

  test("as-of tie-break and residue: all four physical forms pick the " +
      "same-timestamp click with the LARGEST id, reach the 20-day-old " +
      "residue click, and emit nothing for a clickless purchase") {
    val expect = Set(
      (100L, 11L, 0L),           // ties at cts = pts: click_id 11 beats 10
      (200L, 20L, 20 * D))       // found despite being 2+ buckets back
    for (q <- Seq("q17_join_asof", "q57_join_asof_bucketed",
        "q58_join_asof_sorted", "q63_join_asof_native")) {
      val got = SparkEntry.queries(q)(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === expect, q)
    }
  }
}
