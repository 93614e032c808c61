package graft

import java.time.Duration

import graft.streaming.{CounterSample, RangeRate, StreamingRangeRate}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** PromQL range-window rate in ListState: the window slides with the
  * newest sample, old samples evict, and increase/span are computed over
  * in-window samples ONLY (PromQL ignores samples before the range
  * start). */
class StreamingRangeRateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def us(sec: Long) = sec * 1000000L

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

  test("the window slides: snapshots see only the trailing range") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[CounterSample]
      val q = StreamingRangeRate.rangeRate(stream.toDS(), Duration.ofMillis(2500))
        .writeStream.format("memory").queryName("rrate")
        .outputMode("update").start()
      try {
        stream.addData(
          CounterSample("m", 1L, us(1), 10.0), CounterSample("m", 1L, us(2), 12.0),
          CounterSample("m", 1L, us(3), 15.0))
        q.processAllAvailable()
        stream.addData(
          CounterSample("m", 1L, us(4), 3.0), // reset inside the window
          CounterSample("m", 1L, us(5), 8.0))
        q.processAllAvailable()
      } finally q.stop()

      val rows = spark.table("rrate").as[RangeRate].collect().toSeq.sortBy(_.window_end_us)
      assert(rows === Seq(
        // batch 1: window (0.5s, 3s] holds all three samples
        RangeRate("m", 1L, us(3), 3L, 5.0, Some(2.5)),
        // batch 2: window (2.5s, 5s] holds ts3..ts5; ts1/ts2 evicted and
        // contribute NOTHING (PromQL ignores pre-window samples).
        // Increase = reset to 3 (+3) + 5 (3→8) = 8 over the 2s in-window span
        RangeRate("m", 1L, us(5), 3L, 8.0, Some(4.0))))
    }
  }

  test("one in-window sample yields no rate even when older samples exist") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[CounterSample]
      val q = StreamingRangeRate.rangeRate(stream.toDS(), Duration.ofSeconds(1))
        .writeStream.format("memory").queryName("rrate_lone")
        .outputMode("update").start()
      try {
        stream.addData(CounterSample("l", 1L, us(1), 10.0))
        q.processAllAvailable()
        // 9s later: the window (9s, 10s] holds ONLY the new sample — the
        // old one is no rate anchor (PromQL: fewer than two in-window
        // samples ⇒ no rate), and the pre-window delta is not attributed
        stream.addData(CounterSample("l", 1L, us(10), 20.0))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("rrate_lone").as[RangeRate].collect().toSeq
        .sortBy(_.window_end_us)
      assert(rows === Seq(
        RangeRate("l", 1L, us(1), 1L, 0.0, None),
        RangeRate("l", 1L, us(10), 1L, 0.0, None)))
    }
  }

  test("a single-sample window reports no rate; stale rows are ignored") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[CounterSample]
      val q = StreamingRangeRate.rangeRate(stream.toDS(), Duration.ofSeconds(10))
        .writeStream.format("memory").queryName("rrate_one")
        .outputMode("update").start()
      try {
        stream.addData(CounterSample("s", 2L, us(5), 42.0))
        q.processAllAvailable()
        stream.addData(CounterSample("s", 2L, us(3), 1.0)) // behind the buffer hwm
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("rrate_one").as[RangeRate].collect().toSeq
      // the stale row produces NO second snapshot and corrupts nothing
      assert(rows === Seq(RangeRate("s", 2L, us(5), 1L, 0.0, None)))
    }
  }
}
