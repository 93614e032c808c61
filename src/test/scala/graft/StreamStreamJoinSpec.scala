package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.expr
import org.scalatest.funsuite.AnyFunSuite

/** Watermarked stream-stream interval join (SURVEY Structured-Streaming
  * surface): clicks ⋈ purchases per user within a time bound — the
  * streaming form of the q16 range join. Both sides carry watermarks, so
  * the join state is BOUNDED: a buffered click is dropped once the
  * purchase-side watermark passes click time + the interval, which is what
  * makes the operator runnable forever at scale.
  */
class StreamStreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("interval join matches within the bound, across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[(Long, Long, Timestamp)]    // (click_id, user, cts)
    val purchases = MemoryStream[(Long, Long, Timestamp)] // (purchase_id, user, pts)

    val joined = clicks.toDS().toDF("click_id", "user_id", "cts")
      .withWatermark("cts", "10 seconds")
      .join(
        purchases.toDS().toDF("purchase_id", "p_user", "pts")
          .withWatermark("pts", "10 seconds"),
        expr("""user_id = p_user AND cts <= pts
               |AND cts >= pts - INTERVAL 60 SECONDS""".stripMargin))
      .select("click_id", "purchase_id")

    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      // batch 1: clicks only — buffered in join state
      clicks.addData((1L, 100L, ts(1000)), (2L, 100L, ts(1030)), (3L, 200L, ts(1000)))
      q.processAllAvailable()
      // batch 2: purchases arrive later — cross-batch matches via state.
      // user 100 buys at 1040: clicks 1 (40s before) and 2 (10s) match.
      // user 200 buys at 1090: click 3 is 90s before — outside the bound.
      purchases.addData((10L, 100L, ts(1040)), (11L, 200L, ts(1090)))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("ssj_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 10L)), s"got $got")
  }
}
