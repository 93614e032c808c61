package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** `dropDuplicatesWithinWatermark` — the streaming dedup that can actually
  * run forever: plain `dropDuplicates` keeps every key seen, unbounded
  * state; the watermarked form evicts a key once the watermark passes its
  * event time + delay, so state is bounded by the dedup window. The
  * observable semantic difference: a duplicate arriving within the window
  * is suppressed, a re-occurrence after eviction is emitted again. */
class StreamingDedupWatermarkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("dupes suppressed within the watermark window, re-emitted after eviction") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, Timestamp)]
    val q = stream.toDS().toDF("event_id", "ts")
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("dedup_wm_out")
      .outputMode("append").start()
    try {
      stream.addData((1L, ts(1000)), (1L, ts(1000)), (2L, ts(1000)))
      q.processAllAvailable()
      stream.addData((1L, ts(1005))) // within window: suppressed
      q.processAllAvailable()
      stream.addData((3L, ts(1100))) // watermark → 1090: key 1 evicted
      q.processAllAvailable()
      stream.addData((1L, ts(1200))) // after eviction: a new occurrence
      q.processAllAvailable()
      stream.addData((4L, ts(1300))) // flush
      q.processAllAvailable()
    } finally q.stop()

    val perKey = spark.table("dedup_wm_out").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(perKey(2L) == 1 && perKey(3L) == 1)
    assert(perKey(1L) == 2, s"key 1: once per window; got $perKey")
  }
}
