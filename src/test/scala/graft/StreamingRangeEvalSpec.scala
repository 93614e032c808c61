package graft

import graft.streaming.{CounterSample, RangeGridPoint, StreamingRangeEval}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming range-query grid — q100's continuous twin: each
  * reset-corrected increase lands in exactly the aligned steps whose
  * trailing window holds it, grid cells accumulate across micro-batches
  * and restarts, and the whole grid matches the oracle-checked batch
  * q100 on real testdata. */
class StreamingRangeEvalSpec extends AnyFunSuite {
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

  /** Update-mode read: newest row per (name, step) — rows with more
    * samples supersede; equal-sample rows are re-emissions, identical. */
  private def latest(table: String): Map[(String, Long), RangeGridPoint] = {
    import spark.implicits._
    spark.table(table).as[RangeGridPoint].collect()
      .groupBy(r => (r.name, r.step_sec))
      .map { case (k, rs) => k -> rs.maxBy(_.n_samples) }
  }

  test("an increase lands in exactly the steps whose window holds it; late rows drop") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[CounterSample]
      val q = StreamingRangeEval.gridUpdates(stream.toDS())
        .writeStream.format("memory").queryName("re_grid")
        .outputMode("update").start()
      try {
        // the q100 planted case, split across batches: counter 0 → 10 with
        // the delta at t = 21600 s → steps 21600..108000, 5 points, each 10
        stream.addData(CounterSample("c", 1L, us(0), 0.0))
        q.processAllAvailable()
        stream.addData(CounterSample("c", 1L, us(21600), 10.0))
        q.processAllAvailable()
        // late row behind the series hwm: must not perturb any cell
        stream.addData(CounterSample("c", 1L, us(10000), 99.0))
        q.processAllAvailable()
      } finally q.stop()
      val got = latest("re_grid")
      assert(got.keySet.map(_._2) ==
        Set(21600L, 43200L, 64800L, 86400L, 108000L))
      got.values.foreach { p =>
        assert(p.n_series == 1L && p.n_samples == 1L)
        assert(p.total_increase == 10.0)
        assert(p.rate_per_sec == Rounding6(10.0 / 86400))
      }
    }
  }

  private def Rounding6(v: Double) =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("a counter reset inside the window contributes the post-reset value") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[CounterSample]
      val q = StreamingRangeEval.gridUpdates(stream.toDS(),
          step = java.time.Duration.ofSeconds(100),
          window = java.time.Duration.ofSeconds(100))
        .writeStream.format("memory").queryName("re_reset")
        .outputMode("update").start()
      try {
        // 50 → 5 at t=60: reset, inc = 5; then 5 → 8 at t=80: inc = 3.
        // step 100 window 100: both land in step 100 (and t=60 in 100 only
        // — ceil(60/100)=100, floor((60+100)/100)*100=100)
        stream.addData(CounterSample("c", 1L, us(10), 50.0),
          CounterSample("c", 1L, us(60), 5.0), CounterSample("c", 1L, us(80), 8.0))
        q.processAllAvailable()
      } finally q.stop()
      val p = latest("re_reset")(("c", 100L))
      assert(p.n_samples == 2L && p.total_increase == 8.0)
    }
  }

  test("grid cells survive a checkpointed restart") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val ckpt = java.nio.file.Files.createTempDirectory("re_ckpt").toString
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[RangeGridPoint]()
      val stream = MemoryStream[CounterSample]
      def start() = StreamingRangeEval.gridUpdates(stream.toDS())
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[RangeGridPoint], _: Long) =>
          batch.collect().foreach(seen.add)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()

      val q1 = start()
      try {
        stream.addData(CounterSample("c", 1L, us(0), 0.0),
          CounterSample("c", 1L, us(21600), 10.0))
        q1.processAllAvailable()
      } finally q1.stop()

      val q2 = start() // same checkpoint: series hwm AND grid cells reload
      try {
        stream.addData(CounterSample("c", 1L, us(43200), 25.0))
        q2.processAllAvailable()
      } finally q2.stop()

      // state loss would drop the first attempt's +10 from re-touched
      // steps; continuity accumulates 10 + 15 where both windows overlap
      import scala.jdk.CollectionConverters._
      val last = seen.asScala.toSeq.groupBy(_.step_sec)
        .map { case (s, rs) => s -> rs.maxBy(_.n_samples) }
      assert(last(43200L).n_samples == 2L && last(43200L).total_increase == 25.0)
      assert(last(108000L).n_samples == 2L && last(108000L).total_increase == 25.0)
      // steps only the second increase reaches
      assert(last(129600L).n_samples == 1L && last(129600L).total_increase == 15.0)
    }
  }

  test("parity with the oracle-checked batch q100 on real testdata") {
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
      val q = StreamingRangeEval.gridUpdates(stream.toDS())
        .writeStream.format("memory").queryName("re_parity")
        .outputMode("update").start()
      try {
        // time-respecting split so no row is late at the seam
        val cut = samples.map(_.tsUs).sorted.apply(samples.size / 2)
        val (a, b) = samples.partition(_.tsUs <= cut)
        stream.addData(a); q.processAllAvailable()
        stream.addData(b); q.processAllAvailable()
      } finally q.stop()

      val streaming = latest("re_parity")
      val batch = operators.EventAnalytics.promRangeEval(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
      assert(batch.nonEmpty && batch.keySet.subsetOf(streaming.keySet),
        s"batch grid points missing from the stream: ${batch.keySet -- streaming.keySet}")
      batch.foreach { case (k, (nSeries, nSamples, total, rate)) =>
        val s = streaming(k)
        assert(s.n_series == nSeries, s"$k series count")
        assert(s.n_samples == nSamples, s"$k sample count")
        // both sides round the float sum HALF_UP at 2 dp; allow one ulp of
        // the rounding grid for summation-order divergence
        assert(math.abs(s.total_increase - total) <= 1.000001e-2, s"$k total")
        assert(math.abs(s.rate_per_sec - rate) <= 1.000001e-6, s"$k rate")
      }
    }
  }
}
