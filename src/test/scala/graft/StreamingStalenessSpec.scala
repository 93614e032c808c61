package graft

import java.time.Duration

import graft.streaming.{CounterSample, SeriesTransition, StreamingStaleness}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Staleness markers via transformWithState processing-time timers: a
  * silent series turns stale with no further input (the timer fires on an
  * empty micro-batch), and revives on its next sample. Timer firings are
  * wall-clock driven, so these tests poll the sink rather than wait for
  * quiescence. */
class StreamingStalenessSpec extends AnyFunSuite {
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

  private def rows(table: String): Seq[SeriesTransition] = {
    import spark.implicits._
    spark.table(table).as[SeriesTransition].collect().toSeq
  }

  private def await(cond: => Boolean, what: String): Unit = {
    val deadline = System.nanoTime() + 90L * 1000000000L
    while (!cond) {
      if (System.nanoTime() > deadline) fail(s"timed out waiting for $what")
      Thread.sleep(100)
    }
  }

  test("a silent series goes stale via its timer and revives on the next sample") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[CounterSample]
      val q = StreamingStaleness.transitions(stream.toDS(), Duration.ofMillis(600))
        .writeStream.format("memory").queryName("stale_t")
        .outputMode("update").start()
      try {
        stream.addData(CounterSample("s", 1L, us(1), 10.0))
        // no more input: the timer must fire on an input-less micro-batch
        await(rows("stale_t").contains(SeriesTransition("s", 1L, "stale", us(1))),
          "stale marker")
        // revival: the next sample emits `active` and re-arms
        stream.addData(CounterSample("s", 1L, us(2), 12.0))
        await(rows("stale_t").contains(SeriesTransition("s", 1L, "active", us(2))),
          "active marker")
        // ... and the revived series goes stale AGAIN after renewed silence
        await(rows("stale_t").contains(SeriesTransition("s", 1L, "stale", us(2))),
          "second stale marker")
      } finally q.stop()
      // exactly one transition per liveness change, no duplicate markers
      assert(rows("stale_t").sortBy(_.last_ts_us) === Seq(
        SeriesTransition("s", 1L, "stale", us(1)),
        SeriesTransition("s", 1L, "active", us(2)),
        SeriesTransition("s", 1L, "stale", us(2))))
    }
  }

  test("a steadily reporting series never goes stale (timers re-arm, not stack)") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[CounterSample]
      val q = StreamingStaleness.transitions(stream.toDS(), Duration.ofSeconds(30))
        .writeStream.format("memory").queryName("stale_live")
        .outputMode("update").start()
      try {
        // three samples, each well inside the horizon: every one disarms the
        // previous timer, so no stale marker may ever fire. (No
        // processAllAvailable here: the ProcessingTime time mode batches
        // continuously and never quiesces — pace with wall-clock instead.)
        for (i <- 1 to 3) {
          stream.addData(CounterSample("a", 1L, us(i), i.toDouble))
          Thread.sleep(400)
        }
        Thread.sleep(1500) // give a leaked timer the chance to misfire
      } finally q.stop()
      assert(rows("stale_live").isEmpty,
        "a live series must produce no transitions while inside the horizon")
    }
  }
}
