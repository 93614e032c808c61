package graft

import graft.streaming.{CounterSample, HwUpdate, StreamingHoltWinters}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming holt_winters — q106's continuous twin. The fold's accumulator
  * is its complete state, so parity with the batch operator is asserted
  * EXACTLY (same IEEE op sequence), not within an epsilon: planted
  * hand-computed fold, cross-batch continuity under a checkpointed
  * restart, the order-sensitive late rule, and row-exact real-testdata
  * parity with the oracle-checked batch q106. */
class StreamingHoltWintersSpec extends AnyFunSuite {
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

  private def latest(table: String): Map[(String, Long), HwUpdate] = {
    import spark.implicits._
    spark.table(table).as[HwUpdate].collect()
      .groupBy(r => (r.name, r.user_id))
      .map { case (k, rs) => k -> rs.maxBy(r => (r.n_samples, r.n_late)) }
  }

  test("hand-computed fold across micro-batches; exact line smooths to itself") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[CounterSample]
      val q = StreamingHoltWinters.smoothedUpdates(stream.toDS())
        .writeStream.format("memory").queryName("hw_line")
        .outputMode("update").start()
      try {
        // the q106 planted fixture split mid-series: ctr=[10,20 | 5,8],
        // lin=[2,7 | 12,17] — continuity must reproduce the batch fold
        stream.addData(
          CounterSample("ctr", 1L, us(0), 10.0), CounterSample("ctr", 1L, us(10), 20.0),
          CounterSample("lin", 2L, us(0), 2.0), CounterSample("lin", 2L, us(10), 7.0))
        q.processAllAvailable()
        stream.addData(
          CounterSample("ctr", 1L, us(20), 5.0), CounterSample("ctr", 1L, us(30), 8.0),
          CounterSample("lin", 2L, us(20), 12.0), CounterSample("lin", 2L, us(30), 17.0))
        q.processAllAvailable()
      } finally q.stop()
      val got = latest("hw_line")
      // hand fold (sf=.3, tf=.1): s1=10,b=10 → 20 → 22.5 → 24.625, b=9.25
      assert(got(("ctr", 1L)) === HwUpdate("ctr", 1L, 4L, 0L, Some(24.625), Some(9.25)))
      // the exact line is the smoothing fixed point: level 17, trend 5
      assert(got(("lin", 2L)) === HwUpdate("lin", 2L, 4L, 0L, Some(17.0), Some(5.0)))
    }
  }

  test("order-sensitive late rule: a row behind the high-water mark is dropped, counted") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[CounterSample]
      val q = StreamingHoltWinters.smoothedUpdates(stream.toDS())
        .writeStream.format("memory").queryName("hw_late")
        .outputMode("update").start()
      try {
        stream.addData(
          CounterSample("g", 1L, us(0), 10.0), CounterSample("g", 1L, us(10), 20.0))
        q.processAllAvailable()
        // t=5 is behind the consumed fold — cannot be spliced in
        stream.addData(CounterSample("g", 1L, us(5), 15.0))
        q.processAllAvailable()
      } finally q.stop()
      val got = latest("hw_late")(("g", 1L))
      assert(got.n_samples == 2L && got.n_late == 1L)
      assert(got.smoothed === Some(20.0)) // the late row changed nothing
    }
  }

  test("fold state survives a checkpointed restart") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val ckpt = java.nio.file.Files.createTempDirectory("hw_ckpt").toString
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[HwUpdate]()
      val stream = MemoryStream[CounterSample]
      def start() = StreamingHoltWinters.smoothedUpdates(stream.toDS())
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[HwUpdate], _: Long) =>
          batch.collect().foreach(seen.add)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()

      val q1 = start()
      try {
        stream.addData(CounterSample("ctr", 1L, us(0), 10.0),
          CounterSample("ctr", 1L, us(10), 20.0))
        q1.processAllAvailable()
      } finally q1.stop()

      val q2 = start() // same checkpoint: HwState must reload
      try {
        stream.addData(CounterSample("ctr", 1L, us(20), 5.0),
          CounterSample("ctr", 1L, us(30), 8.0))
        q2.processAllAvailable()
      } finally q2.stop()

      // state loss would re-seed the fold at v=5 and answer 8/3; continuity
      // reproduces the all-in-one-run hand-computed fold
      import scala.jdk.CollectionConverters._
      val last = seen.asScala.toSeq.maxBy(_.n_samples)
      assert(last === HwUpdate("ctr", 1L, 4L, 0L, Some(24.625), Some(9.25)))
    }
  }

  test("exact parity with the oracle-checked batch q106 on real testdata") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val dir = "/root/testdata/sf0.001"
      import org.apache.spark.sql.functions.{col, unix_micros}
      val samples = graft.Tables(spark, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("event_type").as("name"), col("user_id"),
          unix_micros(col("ts")).as("tsUs"), col("value"))
        .as[CounterSample].collect().toSeq

      val stream = MemoryStream[CounterSample]
      val q = StreamingHoltWinters.smoothedUpdates(stream.toDS())
        .writeStream.format("memory").queryName("hw_parity")
        .outputMode("update").start()
      try {
        // time-respecting split: sorted(a) ++ sorted(b) is the globally
        // sorted sequence, so the stream folds in the batch array's order
        val cut = samples.map(_.tsUs).sorted.apply(samples.size / 2)
        val (a, b) = samples.partition(_.tsUs <= cut)
        stream.addData(a); q.processAllAvailable()
        stream.addData(b); q.processAllAvailable()
      } finally q.stop()

      val streaming = latest("hw_parity")
      val batch = operators.EventAnalytics.promHoltWinters(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
      assert(batch.nonEmpty && batch.keySet.subsetOf(streaming.keySet))
      batch.foreach { case (k, (n, smoothed, trend)) =>
        val s = streaming(k)
        assert(s.n_samples == n && s.n_late == 0L, s"$k counts")
        // identical IEEE op sequence + identical HALF_UP rounding: EXACT
        assert(s.smoothed.get == smoothed, s"$k smoothed")
        assert(s.trend.get == trend, s"$k trend")
      }
    }
  }
}
