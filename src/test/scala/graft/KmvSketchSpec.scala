package graft

import org.scalatest.funsuite.AnyFunSuite

/** KMV sketch (q137) and journey trigrams (q138): aggregator algebra,
  * estimator accuracy on planted partial overlap, and the exact path when
  * the sketch covers the whole distinct set. */
class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("KmvAgg: bounded, sorted, distinct; merge is the k-smallest of the union") {
    val agg = new graft.functions.KmvAgg(4)
    var buf = agg.zero
    Seq(50L, 10L, 30L, 10L, 70L, 20L).foreach { h => buf = agg.reduce(buf, h) }
    assert(buf.toSeq == Seq(10L, 20L, 30L, 50L)) // 70 rejected, dup 10 ignored
    val other = Seq(5L, 20L, 60L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(buf, other).toSeq == Seq(5L, 10L, 20L, 30L))
    assert(agg.merge(agg.zero, agg.zero).isEmpty)
    assert(agg.merge(buf, agg.zero).toSeq == buf.toSeq)
  }

  private def ns(sec: Long) = sec * 1000000000L

  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double, String)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-kmv").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("q137: planted 50% overlap — exact columns exact, estimates inside KMV error bounds") {
    var eid = 0L
    val rows = (1L to 200L).map { u => eid += 1; (eid, ns(eid), u, "click", 1.0, "{}") } ++
      (101L to 300L).map { u => eid += 1; (eid, ns(eid), u, "purchase", 1.0, "{}") }
    val dir = writeEvents(rows)
    val x = operators.Aggregates.kmvIntersection(spark, dir).collect().head
    assert(x.getLong(1) == 200L && x.getLong(3) == 200L && x.getLong(5) == 100L)
    val (estA, estB, estI) = (x.getDouble(2), x.getDouble(4), x.getDouble(6))
    // rsd ≈ 1/√(k−1) ≈ 12.6%; allow ~3σ on the memberships, looser on the
    // intersection (Jaccard ratio compounds the error)
    assert(math.abs(estA - 200) / 200.0 < 0.4, s"est_a=$estA")
    assert(math.abs(estB - 200) / 200.0 < 0.4, s"est_b=$estB")
    assert(estI > 25 && estI < 250, s"est_inter=$estI")
  }

  test("q137: a sketch that holds the whole set reports the exact count") {
    val rows = (1L to 10L).map { u => (u, ns(u), u, "click", 1.0, "{}") } ++
      (6L to 15L).map { u => (u + 100, ns(u + 100), u, "purchase", 1.0, "{}") }
    val dir = writeEvents(rows)
    val x = operators.Aggregates.kmvIntersection(spark, dir).collect().head
    assert(x.getDouble(2) == 10.0 && x.getDouble(4) == 10.0)
    assert(x.getLong(5) == 5L)
    assert(x.getDouble(6) == 5.0) // union sketch holds all 15 → est exact
  }

  test("q138: trigram paths count exactly and rank deterministically") {
    val dir = writeEvents(Seq(
      (1L, ns(0), 1L, "view", 1.0, "{}"),
      (2L, ns(1), 1L, "click", 1.0, "{}"),
      (3L, ns(2), 1L, "purchase", 1.0, "{}"),
      (4L, ns(3), 1L, "view", 1.0, "{}"),
      (5L, ns(4), 1L, "click", 1.0, "{}"),
      (6L, ns(0), 2L, "view", 1.0, "{}"),
      (7L, ns(1), 2L, "click", 1.0, "{}"),
      (8L, ns(2), 2L, "purchase", 1.0, "{}")))
    val r = operators.ProductAnalytics.journeyTrigrams(spark, dir).collect()
      .map(x => (x.getInt(0), x.getString(1), x.getLong(2)))
    assert(r.toSeq == Seq(
      (1, "view>click>purchase", 2L),
      (2, "click>purchase>view", 1L),
      (3, "purchase>view>click", 1L)))
  }
}
