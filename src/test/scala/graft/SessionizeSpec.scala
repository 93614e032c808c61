package graft

import java.sql.Timestamp

import graft.streaming.{Sessionize, SessionEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** flatMapGroupsWithState sessionization: gap-close within the stream and
  * watermark-timeout flush of the final session. */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("sessions close on gap in-stream and flush on watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, Timestamp)]
    val events = stream.toDS().toDF("user_id", "ts")
      .withWatermark("ts", "10 seconds")
      .as[SessionEvent]

    val q = Sessionize.sessions(events, gapMs = 10000).toDF()
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // Base at 1000s: the engine's initial watermark is 0 and rows at or
      // behind the watermark are dropped as late, so t=0 events vanish.
      // user 1: two events 5s apart (one session); user 2: one event
      stream.addData((1L, ts(1000)), (1L, ts(1005)), (2L, ts(1000)))
      q.processAllAvailable()
      // user 1 again far beyond the gap: closes session (1000..1005)
      // in-stream. ts=1100 also advances the watermark to 1090s, expiring
      // user 2's timeout (set at 1000+10s).
      stream.addData((1L, ts(1100)))
      q.processAllAvailable()
      // one more watermark push so timeout processing runs in a batch
      stream.addData((3L, ts(1200)))
      q.processAllAvailable()
      stream.addData((3L, ts(1300)))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("sessions_out").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
        r.getTimestamp(2).getTime / 1000, r.getLong(3)))
    assert(out.contains((1L, 1000L, 1005L, 2L)), s"user 1 first session; got ${out.toSeq}")
    assert(out.contains((2L, 1000L, 1000L, 1L)), s"user 2 timeout flush; got ${out.toSeq}")
    // user 1's second session (1100s) flushes once the watermark passes 1110s
    assert(out.contains((1L, 1100L, 1100L, 1L)), s"user 1 second session; got ${out.toSeq}")
  }
}
