package graft

import graft.streaming.{GrowthEvent, GrowthTick, StreamingGrowth}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming growth accounting (q192's continuous twin): activity
  * classifies immediately, churn fires from EVENT-TIME timers when the
  * watermark passes the lapse deadline, revival after churn reads as
  * resurrected, and the event log aggregates to batch q192's table on
  * real testdata (modulo the watermark boundary, asserted exactly). */
class StreamingGrowthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  // fixture days ride at an epoch offset: a ts of exactly 0 ms collides
  // with the stream's INITIAL watermark and is dropped as late
  private val D = 19000L
  private def tick(u: Long, day: Long, sec: Long = 0) =
    GrowthTick(u, new java.sql.Timestamp((D + day) * 86400000L + sec * 1000L))

  private def run(name: String, batches: Seq[Seq[GrowthTick]]): Seq[GrowthEvent] =
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[GrowthTick]
      val q = StreamingGrowth.growthEventsWithWatermark(stream.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).as[GrowthEvent].collect().toSeq
    }

  test("lifecycle: new/retained classify on arrival; churn fires from the " +
      "event-time timer; revival after churn is resurrected") {
    val out = run("gr_life", Seq(
      Seq(tick(1, 0), tick(2, 0)),
      Seq(tick(1, 1), tick(2, 1)),
      Seq(tick(2, 10)),          // u2 revives past the lapse BEFORE its timer
      Seq(tick(3, 20)),          // watermark → day 10: u1's day-9 deadline fires
      Seq(tick(3, 30))))         // watermark → day 20: u2's day-18 deadline fires
    val byUser = out.groupBy(_.user_id).view
      .mapValues(_.sortBy(e => (e.day_no, e.cls)).map(e => (e.day_no, e.cls)).toList).toMap
    assert(byUser(1L) == List((D, "new"), (D + 1, "retained"), (D + 8, "churned")),
      s"u1: ${byUser.get(1L)}")
    // u2's day-10 revival lands while the day-9 deadline is still armed
    // (watermark = day 1): the churn batch q192 derives at day 1+7 must
    // STILL be emitted — inline, before the resurrection (ADVICE r14)
    assert(byUser(2L) == List((D, "new"), (D + 1, "retained"), (D + 8, "churned"),
      (D + 10, "resurrected"), (D + 17, "churned")), s"u2: ${byUser.get(2L)}")
    // u3's day-28 timer deadline sits beyond the final watermark (day 20),
    // but day 30's 10-day gap itself proves the day-27 churn → emitted
    // inline with the resurrection, exactly as batch derives it
    assert(byUser(3L) == List((D + 20, "new"), (D + 27, "churned"),
      (D + 30, "resurrected")), s"u3: ${byUser.get(3L)}")
  }

  test("a > lapse gap packed entirely inside ONE micro-batch still emits " +
      "the churn event (no timer was ever armed for the bridged day)") {
    val out = run("gr_onebatch", Seq(
      Seq(tick(1, 0), tick(1, 12)),  // new + revival in the same batch
      Seq(tick(9, 40)),              // watermark → day 12 …
      Seq(tick(9, 41))))             // … then day 40: u1's day-19 churn fires
    val u1 = out.filter(_.user_id == 1L).sortBy(e => (e.day_no, e.cls))
      .map(e => (e.day_no, e.cls))
    // batch q192 on the same log: new@0, churned@7, resurrected@12, and
    // the day-12+7 churn once the horizon passes — identical here, and
    // INDEPENDENT of micro-batch packing
    assert(u1 == List((D, "new"), (D + 7, "churned"),
      (D + 12, "resurrected"), (D + 19, "churned")), s"u1: $u1")
    // replaying the same log split across batches yields the identical
    // event log (the scaladoc's replay-determinism claim, now fixture-free)
    val out2 = run("gr_onebatch2", Seq(
      Seq(tick(1, 0)), Seq(tick(1, 12)), Seq(tick(9, 40)), Seq(tick(9, 41))))
    val u1b = out2.filter(_.user_id == 1L).sortBy(e => (e.day_no, e.cls))
      .map(e => (e.day_no, e.cls))
    assert(u1b == u1, s"packing-dependent event log: $u1b vs $u1")
  }

  test("a same-day replay after churn does NOT duplicate the churn event") {
    val out = run("gr_dup", Seq(
      Seq(tick(1, 0), tick(9, 0)),
      Seq(tick(9, 20)),            // watermark → day 0 … then
      Seq(tick(9, 21)),            // watermark → day 20: u1 churns at day 7
      Seq(tick(1, 0, 30)),         // LATE replay of u1's day 0 (behind watermark)
      Seq(tick(9, 22))))           // advance again: a re-armed stale deadline would re-fire
    val u1 = out.filter(_.user_id == 1L).sortBy(_.day_no).map(e => (e.day_no, e.cls))
    assert(u1 == List((D, "new"), (D + 7, "churned")), s"u1: $u1")
  }

  test("batch parity on sf0.001: the event log aggregates to q192's table " +
      "(churn beyond the watermark is the only permitted gap)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val rows = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
      .as[GrowthTick].collect().sortBy(_.ts.getTime).toSeq
    assert(rows.nonEmpty)
    val maxDay = rows.map(_.ts.getTime / 86400000L).max
    val (a, b) = rows.splitAt(rows.length / 2)
    // sentinel user advances the watermark to the horizon (RAW epoch days —
    // the fixture offset D must not apply, or every beyond-horizon deadline
    // would fire and emit churn batch never derived); excluded from compare
    def raw(sec: Long) =
      GrowthTick(-1L, new java.sql.Timestamp(maxDay * 86400000L + sec * 1000L))
    val streamed = run("gr_parity", Seq(a, b, Seq(raw(1)), Seq(raw(2))))
      .filter(_.user_id >= 0)
      .groupBy(e => (e.day_no, e.cls)).view.mapValues(_.size.toLong).toMap
    val batch = operators.ProductAnalytics.growthAccounting(spark, dir).collect()
      .flatMap { r =>
        Seq(("new", r.getLong(1)), ("retained", r.getLong(2)),
          ("resurrected", r.getLong(3)), ("churned", r.getLong(4)))
          .filter(_._2 > 0).map { case (cls, n) => (r.getLong(0), cls) -> n }
      }.toMap
    assert(batch.nonEmpty && streamed.nonEmpty)
    // activity classes must match EXACTLY; churn may differ only at the
    // watermark boundary: batch claims day_no == maxDay churns by seeing
    // the whole horizon, the stream's watermark stops inside that day
    batch.foreach { case (k @ (day, cls), n) =>
      if (cls == "churned" && day == maxDay)
        assert(!streamed.contains(k) || streamed(k) <= n,
          s"boundary churn overshoot at $k")
      else assert(streamed.get(k).contains(n), s"$k: batch $n vs ${streamed.get(k)}")
    }
    streamed.keys.foreach { k =>
      assert(batch.contains(k), s"stream emitted $k that batch never derived")
    }
  }
}
