package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Genuinely-streaming semantics that the batch-verified queries
  * (`StreamingBatch`) can't exercise: watermark state eviction dropping a
  * late row between micro-batches, and streaming `dropDuplicates` state.
  *
  * The batch/stream unification is the point of Structured Streaming — the
  * same `window()`/`dropDuplicates` plans run in both modes; these tests pin
  * the streaming-only state behavior.
  */
class StreamingSemanticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minutes: Int): Timestamp =
    new Timestamp(minutes * 60000L)

  test("watermark drops a row arriving after state eviction") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Timestamp, Double)]

    val agg = stream.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))

    val q = agg.writeStream.format("memory").queryName("wm_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // Batch 1: rows at t=1m and t=30m. Watermark after batch = 30m-10m = 20m
      // → the 0-5m window closes and is emitted; its state is evicted.
      stream.addData((ts(1), 1.0), (ts(30), 1.0))
      q.processAllAvailable()
      // Batch 2: a LATE row at t=2m (before the 20m watermark) must be
      // dropped, plus an on-time row at t=31m.
      stream.addData((ts(2), 9.0), (ts(31), 1.0))
      q.processAllAvailable()
      // Batch 3: push the watermark past 31m so the 30-35m window emits.
      stream.addData((ts(60), 1.0))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("wm_test")
      .select(col("ws").cast("long").as("ws_s"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows(0L) == 1L, "0-5m window must contain ONLY the on-time row " +
      "(late t=2m row dropped by the watermark)")
    assert(rows(30 * 60L) == 2L, "30-35m window has the two on-time rows")
  }

  test("streaming dropDuplicates suppresses re-sends across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, String)]

    val dedup = stream.toDF().toDF("id", "kind").dropDuplicates(Seq("id"))

    val q = dedup.writeStream.format("memory").queryName("dd_test")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      stream.addData((1L, "a_resent"), (3L, "c")) // id=1 already seen
      q.processAllAvailable()
    } finally q.stop()

    val ids = spark.table("dd_test").select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L), "each id exactly once across batches")
  }
}
