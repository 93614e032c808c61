package graft

import graft.streaming.{JourneyEvent, StreamingTransitions, TransitionDelta}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming transition counting (q135's continuous twin): cross-batch
  * continuity, exact batch parity on real testdata, late-row drop. */
class StreamingTransitionsSpec extends AnyFunSuite {
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

  private def run(name: String, batches: Seq[Seq[JourneyEvent]]): Map[(String, String), Long] =
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[JourneyEvent]
      val q = StreamingTransitions.transitionDeltas(stream.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).as[TransitionDelta].collect().toSeq
        .groupBy(d => (d.cur, d.nxt)).map { case (k, ds) => k -> ds.map(_.n).sum }
    }

  private def us(sec: Long) = sec * 1000000L

  test("transitions bridge micro-batch boundaries through the cursor state") {
    val counts = run("tr_bridge", Seq(
      Seq(JourneyEvent(1, "view", us(0)), JourneyEvent(1, "click", us(1))),
      Seq(JourneyEvent(1, "purchase", us(2)))))  // click→purchase spans batches
    assert(counts == Map(("view", "click") -> 1L, ("click", "purchase") -> 1L))
  }

  test("batch parity: summed deltas equal q135 counts on sf0.001 fed in order") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, unix_micros}
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val ordered = events.select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tsUs")).as[JourneyEvent]
      .collect().sortBy(e => (e.tsUs, e.event_type)).toSeq
    val (a, b) = ordered.splitAt(ordered.length / 2)
    val streamed = run("tr_parity", Seq(a, b))
    val truth = operators.ProductAnalytics.eventTransitions(spark, "/root/testdata/sf0.001")
      .select(col("cur"), col("nxt"), col("n")).as[(String, String, Long)]
      .collect().map { case (c, x, n) => (c, x) -> n }.toMap
    assert(truth.nonEmpty)
    assert(streamed == truth)
  }

  test("a row behind the high-water mark emits no transition") {
    val counts = run("tr_late", Seq(
      Seq(JourneyEvent(1, "view", us(100))),
      Seq(JourneyEvent(1, "click", us(50)))))   // late: dropped, no view→click
    assert(counts.isEmpty)
  }
}
