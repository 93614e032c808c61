package graft

import java.sql.Timestamp

import graft.streaming.StreamingAsOf
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.streaming.StreamingAsOf]] — the stream-stream as-of join: latest
  * right at-or-before each left per key, bounded state, append output.
  * Deterministic watermark control: MemoryStream watermark = max event time
  * seen in batch N minus delay, effective in batch N+1, so each addData +
  * processAllAvailable advances the clock one step. */
class StreamingAsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  private def stateRows(q: StreamingQuery): Long =
    Option(q.lastProgress).map(_.stateOperators.asInstanceOf[Array[_]]
      .map(_.asInstanceOf[org.apache.spark.sql.streaming.StateOperatorProgress]
        .numRowsTotal).sum).getOrElse(-1L)

  test("as-of matches across micro-batches; idle keys evict") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val quotes = MemoryStream[(Long, Timestamp, Double)] // (user, qts, price)
    val orders = MemoryStream[(Long, Timestamp, Long)]   // (user, ots, order_id)

    val joined = StreamingAsOf.join(
      orders.toDS().toDF("user_id", "ots", "order_id"),
      quotes.toDS().toDF("q_user", "qts", "price"),
      leftKey = "user_id", leftTs = "ots", leftId = "order_id",
      rightKey = "q_user", rightTs = "qts", rightVal = "price",
      delay = "5 seconds", idleTtlMs = 10000L)

    val q = joined.writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    def got = spark.table("asof_out").collect()
      .map(r => r.getLong(1) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    try {
      // stage 1: two quotes + one order for user 1, an order for user 2 with
      // no quotes ever. The data batch runs at wm=epoch; the trailing
      // no-data batch then sees wm = 250-5 = 245 -> order 10 (t=150) is
      // final: latest quote <= 150 is the one at t=100. Order 20 (t=250)
      // stays pending (250 > 245).
      quotes.addData((1L, ts(100), 1.0), (1L, ts(200), 2.0))
      orders.addData((1L, ts(150), 10L), (2L, ts(250), 20L))
      q.processAllAvailable()
      assert(got === Map(10L -> Some(1.0)))

      // stage 2: wm advances to 350-5 = 345 -> order 20 final (user 2 has
      // no quotes: None). Order 30 (t=350) buffers across batches.
      quotes.addData((1L, ts(300), 3.0))
      orders.addData((1L, ts(350), 30L))
      q.processAllAvailable()
      assert(got === Map(10L -> Some(1.0), 20L -> None))

      // stage 3: flush on an unrelated key -> wm = 395 -> order 30 final:
      // latest quote <= 350 is t=300, which by now is the sub-watermark
      // COLLAPSED right (quotes t=100/200 were folded away) — the match
      // survives both the batch boundary and the collapse.
      quotes.addData((3L, ts(400), 0.0))
      q.processAllAvailable()
      assert(got === Map(10L -> Some(1.0), 20L -> None, 30L -> Some(3.0)))

      // idle TTL: wm moves past last-activity + 10s for users 1 and 2 ->
      // their collapsed sub-watermark rights evict on event-time timeout
      // (user 2's empty state dropped immediately after its emit). Three
      // keys have held state; only the still-active key 3 remains.
      quotes.addData((3L, ts(600), 0.0))
      q.processAllAvailable()
      quotes.addData((3L, ts(700), 0.0))
      q.processAllAvailable()
      assert(stateRows(q) == 1L, s"expected only the live key's state, got ${stateRows(q)}")
      assert(got.size == 3) // eviction emitted nothing new
    } finally q.stop()
  }
}
