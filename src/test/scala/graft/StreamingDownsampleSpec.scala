package graft

import graft.streaming.{BucketSample, OhlcUpdate, StreamingDownsample}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming OHLC downsampling (q170's continuous twin): open/close decided
  * by the (ts, event_id) total order across micro-batches regardless of
  * arrival order, and exact batch parity on real testdata. */
class StreamingDownsampleSpec extends AnyFunSuite {
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

  private def run(name: String,
                  batches: Seq[Seq[BucketSample]]): Map[(String, Long), OhlcUpdate] =
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[BucketSample]
      val q = StreamingDownsample.downsample(stream.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).as[OhlcUpdate].collect().toSeq
        .zipWithIndex.groupBy(u => (u._1.event_type, u._1.bucket_us))
        .map { case (k, us) => k -> us.maxBy(_._2)._1 }
    }

  private def us(sec: Long) = sec * 1000000L

  test("open/close follow event time across out-of-order micro-batches") {
    val r = run("ds_ooo", Seq(
      Seq(BucketSample("view", 0L, 5, us(50), 3.0)),
      // earlier sample arrives later: must become the OPEN, not the close
      Seq(BucketSample("view", 0L, 2, us(10), 7.0),
        BucketSample("view", 0L, 9, us(80), 1.0))))
    assert(r(("view", 0L)) == OhlcUpdate("view", 0L, 7.0, 7.0, 1.0, 1.0, 3))
  }

  test("same-ts ties: open takes the LOWER event_id, close the HIGHER") {
    val r = run("ds_tie", Seq(
      Seq(BucketSample("view", 0L, 4, us(10), 2.0)),
      Seq(BucketSample("view", 0L, 3, us(10), 5.0),   // lower id, same ts → open
        BucketSample("view", 0L, 6, us(10), 8.0)))) // higher id, same ts → close
    assert(r(("view", 0L)) == OhlcUpdate("view", 0L, 5.0, 8.0, 2.0, 8.0, 3))
  }

  test("batch parity: final updates equal q170 on sf0.001 fed out of order") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr, unix_micros}
    val rows = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"),
        expr("(unix_micros(ts) div 21600000000L) * 21600000000L").as("bucketUs"),
        col("event_id"), unix_micros(col("ts")).as("tsUs"), col("value"))
      .as[BucketSample]
      .collect().sortBy(_.event_id).toSeq // deliberately NOT time order
    val (a, b) = rows.splitAt(rows.length / 2)
    val streamed = run("ds_parity", Seq(a, b))
    val truth = operators.StreamingBatch.downsampleOhlc(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), unix_micros(col("bucket_start")).as("bucket_us"),
        col("open"), col("high"), col("low"), col("close"), col("n"))
      .as[OhlcUpdate].collect()
      .map(u => (u.event_type, u.bucket_us) -> u).toMap
    assert(truth.nonEmpty)
    assert(streamed == truth)
  }
}
