package graft

import graft.streaming.{CounterSample, HistQuantile, StreamingHistogramQuantile}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming histogram_quantile — q98's continuous twin: cumulative
  * le-bucket counts per (metric, hour) in ValueState, quantile re-emitted
  * per touched micro-batch. Counts commute, so arrival order is
  * irrelevant and there is no late-row rule to test — the invariants are
  * cross-batch accumulation and exact batch parity. */
class StreamingHistogramQuantileSpec extends AnyFunSuite {
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

  private def latest(table: String): Map[(String, Long), HistQuantile] = {
    import spark.implicits._
    spark.table(table).as[HistQuantile].collect()
      .groupBy(r => (r.name, r.hour_us))
      .map { case (k, rs) => k -> rs.maxBy(_.n_samples) }
  }

  test("bucket counts accumulate across micro-batches; negatives dropped") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[CounterSample]
      val q = StreamingHistogramQuantile.quantiles(stream.toDS())
        .writeStream.format("memory").queryName("hq_accum")
        .outputMode("update").start()
      try {
        // first half of 1..20 (plus a negative that must not count)
        stream.addData((1 to 10).map(i => CounterSample("lat", 1L, us(i), i.toDouble))
          :+ CounterSample("lat", 1L, us(99), -5.0): _*)
        q.processAllAvailable()
        stream.addData((11 to 20).map(i => CounterSample("lat", 1L, us(i), i.toDouble)): _*)
        q.processAllAvailable()
      } finally q.stop()
      val got = latest("hq_accum")(("lat", 0L))
      // identical to the batch planted case: p95 of 1..20 = 23.5
      assert(got.n_samples == 20L)
      assert(math.abs(got.p95 - 23.5) < 1e-9)
    }
  }

  test("empty intermediate buckets interpolate from the ladder bound (promql rule)") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[CounterSample]
      val q = StreamingHistogramQuantile.quantiles(stream.toDS())
        .writeStream.format("memory").queryName("hq_ladder")
        .outputMode("update").start()
      try {
        stream.addData(CounterSample("g", 1L, us(1), 1.0), CounterSample("g", 1L, us(2), 30.0))
        q.processAllAvailable()
      } finally q.stop()
      assert(latest("hq_ladder")(("g", 0L)).p95 == 47.5)
    }
  }

  test("hours are independent state keys") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val hour = 3600L
      val stream = MemoryStream[CounterSample]
      val q = StreamingHistogramQuantile.quantiles(stream.toDS())
        .writeStream.format("memory").queryName("hq_hours")
        .outputMode("update").start()
      try {
        stream.addData(
          CounterSample("m", 1L, us(10), 4.0),
          CounterSample("m", 1L, us(hour + 10), 80.0))
        q.processAllAvailable()
      } finally q.stop()
      val got = latest("hq_hours")
      assert(got(("m", 0L)).n_samples == 1L)
      assert(got(("m", us(hour))).n_samples == 1L)
      assert(got(("m", 0L)).p95 != got(("m", us(hour))).p95)
    }
  }

  test("bucket counts survive a checkpointed restart") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val ckpt = java.nio.file.Files.createTempDirectory("hq_ckpt").toString
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[HistQuantile]()
      val stream = MemoryStream[CounterSample]
      def start() = StreamingHistogramQuantile.quantiles(stream.toDS())
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[HistQuantile], _: Long) =>
          batch.collect().foreach(seen.add)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()

      val q1 = start()
      try {
        stream.addData((1 to 10).map(i => CounterSample("lat", 1L, us(i), i.toDouble)): _*)
        q1.processAllAvailable()
      } finally q1.stop()

      val q2 = start() // same checkpoint: HistCounts must reload
      try {
        stream.addData((11 to 20).map(i => CounterSample("lat", 1L, us(i), i.toDouble)): _*)
        q2.processAllAvailable()
      } finally q2.stop()

      // a state loss would quantile only 11..20; continuity reproduces the
      // full 1..20 planted answer
      import scala.jdk.CollectionConverters._
      val last = seen.asScala.toSeq.maxBy(_.n_samples)
      assert(last.n_samples == 20L)
      assert(math.abs(last.p95 - 23.5) < 1e-9)
    }
  }

  test("parity with the oracle-checked batch q98 on real testdata") {
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
      val q = StreamingHistogramQuantile.quantiles(stream.toDS())
        .writeStream.format("memory").queryName("hq_parity")
        .outputMode("update").start()
      try {
        val cut = samples.map(_.tsUs).sorted.apply(samples.size / 2)
        val (a, b) = samples.partition(_.tsUs <= cut)
        stream.addData(a); q.processAllAvailable()
        stream.addData(b); q.processAllAvailable()
      } finally q.stop()

      val streaming = latest("hq_parity")
        .map { case (k, r) => k -> (r.n_samples, r.p95) }
      val batch = operators.EventAnalytics.promHistogramQuantile(spark, dir).collect()
        .map { r =>
          val hourUs = r.getTimestamp(1).toInstant.toEpochMilli * 1000L
          (r.getString(0), hourUs) -> (r.getLong(2), r.getDouble(3))
        }.toMap
      // batch q98 is a LIMIT 200 ordered prefix; every batch row must have
      // an identical streaming twin (the streaming side covers all hours)
      assert(batch.nonEmpty && batch.keySet.subsetOf(streaming.keySet))
      batch.foreach { case (k, (n, p)) =>
        val (sn, sp) = streaming(k)
        assert(sn == n, s"$k sample count: streaming $sn != batch $n")
        assert(math.abs(sp - p) < 1e-9, s"$k: streaming $sp != batch $p")
      }
    }
  }
}
