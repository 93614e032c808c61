package graft

import java.time.Duration

import graft.streaming.{CounterSample, RateBaseline, RateTotals, StreamingRate}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming counter rate on `transformWithState` (Spark 4 arbitrary-state
  * API): cross-batch continuity, counter resets, in-batch ordering, late
  * rejection, and TTL dead-series eviction. transformWithState requires the
  * RocksDB state store provider, so every test here also exercises the
  * production state backend. */
class StreamingRateSpec extends AnyFunSuite {
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

  /** Latest cumulative snapshot per series from the memory sink. */
  private def latest(table: String): Map[(String, Long), RateTotals] = {
    import spark.implicits._
    spark.table(table).as[RateTotals].collect()
      .groupBy(r => (r.name, r.user_id))
      .map { case (k, rs) =>
        k -> rs.maxBy(r => (r.n_samples, r.n_late, r.n_resets))
      }
  }

  test("cumulative increase with a counter reset carries across micro-batches") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[CounterSample]
      val q = StreamingRate.rateUpdates(stream.toDS())
        .writeStream.format("memory").queryName("rate_basic")
        .outputMode("update").start()
      try {
        stream.addData(
          CounterSample("m", 1L, us(1), 10.0), CounterSample("m", 1L, us(2), 12.0),
          CounterSample("m", 2L, us(1), 7.0))
        q.processAllAvailable()
        stream.addData(
          CounterSample("m", 1L, us(3), 15.0),
          CounterSample("m", 1L, us(4), 3.0)) // reset: 15 -> 3 contributes +3
        q.processAllAvailable()
        stream.addData(CounterSample("m", 1L, us(5), 8.0))
        q.processAllAvailable()
      } finally q.stop()

      val got = latest("rate_basic")
      // series (m,1): +2 +3 reset(+3) +5 = 13 over 4s
      assert(got(("m", 1L)) ===
        RateTotals("m", 1L, 5L, 1L, 0L, 13.0, Some(3.25), Some(5.0)))
      // single-sample series: no interval yet, rate undefined (sum(dt)=0 guard)
      assert(got(("m", 2L)) === RateTotals("m", 2L, 1L, 0L, 0L, 0.0, None, None))
    }
  }

  test("rows inside one batch are consumed in event-time order") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[CounterSample]
      val q = StreamingRate.rateUpdates(stream.toDS())
        .writeStream.format("memory").queryName("rate_order")
        .outputMode("update").start()
      try {
        // arrival order inverted vs event time: must sort, not count a late row
        stream.addData(CounterSample("c", 1L, us(2), 5.0), CounterSample("c", 1L, us(1), 3.0))
        q.processAllAvailable()
      } finally q.stop()
      assert(latest("rate_order")(("c", 1L)) ===
        RateTotals("c", 1L, 2L, 0L, 0L, 2.0, Some(2.0), Some(2.0)))
    }
  }

  test("duplicate timestamps: streaming totals equal the batch pipeline's") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      // same-ts samples in one batch, plus a cross-batch row AT the hwm ts
      // with a larger value: both extend the batch window's (ts, value)
      // order, so they must count as increase, not as late rows
      val all = Seq(
        CounterSample("e", 1L, us(1), 10.0), CounterSample("e", 1L, us(1), 11.0),
        CounterSample("e", 1L, us(2), 12.0), CounterSample("e", 1L, us(2), 14.0))
      val base = StreamingRate.batchBaseline(all.toDS()).collect().head
      assert((base.nSamples, base.totalIncrease) === (4L, 4.0))

      val stream = MemoryStream[CounterSample]
      val q = StreamingRate.rateUpdates(stream.toDS())
        .writeStream.format("memory").queryName("rate_dupts")
        .outputMode("update").start()
      try {
        stream.addData(all(0), all(1), all(2))
        q.processAllAvailable()
        stream.addData(all(3)) // ts == hwm, value 14 > lastValue 12: consumed
        q.processAllAvailable()
        // value 13 < lastValue 14 at the hwm ts sorts BEFORE the consumed
        // (2s, 14) in the batch order — unspliceable, counted late
        stream.addData(CounterSample("e", 1L, us(2), 13.0))
        q.processAllAvailable()
      } finally q.stop()
      val got = latest("rate_dupts")(("e", 1L))
      assert(got === RateTotals("e", 1L, base.nSamples, base.nResets, 1L,
        base.totalIncrease, Some(4.0), None)) // last consumed delta spans dt=0
    }
  }

  test("a cross-batch stale row is rejected and counted, not spliced in") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[CounterSample]
      val q = StreamingRate.rateUpdates(stream.toDS())
        .writeStream.format("memory").queryName("rate_late")
        .outputMode("update").start()
      try {
        stream.addData(CounterSample("d", 1L, us(5), 10.0))
        q.processAllAvailable()
        stream.addData(CounterSample("d", 1L, us(3), 4.0)) // behind the hwm
        q.processAllAvailable()
      } finally q.stop()
      assert(latest("rate_late")(("d", 1L)) ===
        RateTotals("d", 1L, 1L, 0L, 1L, 0.0, None, None))
    }
  }

  test("warm start from a batch baseline: the batch/stream seam is invisible") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      // history = the first batch of the all-streaming test, computed in batch
      val hist = Seq(
        CounterSample("w", 1L, us(1), 10.0), CounterSample("w", 1L, us(2), 12.0),
        CounterSample("w", 1L, us(3), 15.0)).toDS()
      val baseline = StreamingRate.batchBaseline(hist)
      assert(baseline.collect().toSeq ===
        Seq(RateBaseline("w", 1L, us(1), us(3), 15.0, 3L, 0L, 5.0, us(1), 3.0)))

      val stream = MemoryStream[CounterSample]
      val q = StreamingRate.rateUpdatesFrom(stream.toDS(), baseline)
        .writeStream.format("memory").queryName("rate_warm")
        .outputMode("update").start()
      try {
        // continues the series PAST the baseline, resetting across the seam
        // (3 < baseline lastValue 15), plus a series the baseline never saw
        stream.addData(CounterSample("w", 1L, us(4), 3.0), CounterSample("w", 2L, us(1), 7.0))
        q.processAllAvailable()
        stream.addData(CounterSample("w", 1L, us(5), 8.0))
        q.processAllAvailable()
      } finally q.stop()

      val got = latest("rate_warm")
      // identical to the all-streaming run of the same 5 samples:
      // +2 +3 reset(+3) +5 = 13 over 4s
      assert(got(("w", 1L)) === RateTotals("w", 1L, 5L, 1L, 0L, 13.0, Some(3.25), Some(5.0)))
      assert(got(("w", 2L)) === RateTotals("w", 2L, 1L, 0L, 0L, 0.0, None, None))
    }
  }

  test("end-to-end: remote-write wire bodies feed the streaming rate") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      import graft.sources.Prompb.{Sample, TimeSeries}
      import graft.sources.{Prompb, RemoteWrite}

      def body(ts: TimeSeries*): Array[Byte] =
        org.xerial.snappy.Snappy.compress(Prompb.encode(ts))

      val bodies = MemoryStream[Array[Byte]]
      val samples = StreamingRate.fromRelay(
        RemoteWrite.fromBodies(bodies.toDS().toDF("body")))
      val q = StreamingRate.rateUpdates(samples)
        .writeStream.format("memory").queryName("rate_wire")
        .outputMode("update").start()
      try {
        // two scrapes in one body, then a reset in a second body — plus an
        // empty series (explode_outer null value) that must be ignored
        bodies.addData(body(
          TimeSeries(Map("__name__" -> "reqs", "user" -> "7"),
            Seq(Sample(10.0, 1000L), Sample(12.0, 2000L))),
          TimeSeries(Map("__name__" -> "empty", "user" -> "1"), Seq.empty),
          // a non-numeric series label must be DROPPED, not merged into
          // user_id 0 (that would cross-contaminate the id-0 deltas)
          TimeSeries(Map("__name__" -> "reqs", "user" -> "canary"),
            Seq(Sample(999.0, 1500L))),
          // missing label: collapses into the documented id-0 bucket
          TimeSeries(Map("__name__" -> "unlabeled"), Seq(Sample(5.0, 1000L)))))
        q.processAllAvailable()
        bodies.addData(body(
          TimeSeries(Map("__name__" -> "reqs", "user" -> "7"), Seq(Sample(3.0, 3000L)))))
        q.processAllAvailable()
      } finally q.stop()

      val got = latest("rate_wire")
      // +2, then reset to 3 (+3) = 5 over 2s
      assert(got(("reqs", 7L)) === RateTotals("reqs", 7L, 3L, 1L, 0L, 5.0, Some(2.5), Some(3.0)))
      assert(!got.contains(("empty", 1L)), "null-value rows must not create series")
      assert(!got.contains(("reqs", 0L)), "non-numeric labels must be dropped, not id-0")
      assert(got(("unlabeled", 0L)).n_samples === 1L)
    }
  }

  test("state survives a query restart from the checkpoint") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val ckpt = java.nio.file.Files.createTempDirectory("rate_ckpt").toString
      // the memory sink refuses checkpoint recovery; collect via foreachBatch
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[RateTotals]()
      val stream = MemoryStream[CounterSample]
      def start() = StreamingRate.rateUpdates(stream.toDS())
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[RateTotals], _: Long) =>
          batch.collect().foreach(seen.add)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()

      val q1 = start()
      try {
        stream.addData(CounterSample("r", 1L, us(1), 10.0), CounterSample("r", 1L, us(2), 12.0))
        q1.processAllAvailable()
      } finally q1.stop()

      val q2 = start() // same checkpoint: RocksDB state must reload
      try {
        stream.addData(CounterSample("r", 1L, us(3), 15.0))
        q2.processAllAvailable()
      } finally q2.stop()

      // continuity across the restart: +2 then +3 on the RELOADED last
      // sample — a state loss would read (n=1, increase=0) after restart
      import scala.jdk.CollectionConverters._
      val last = seen.asScala.toSeq.maxBy(_.n_samples)
      assert(last === RateTotals("r", 1L, 3L, 0L, 0L, 5.0, Some(2.5), Some(3.0)))
    }
  }

  test("irate parity with the oracle-checked batch q96 on real testdata") {
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
      val q = StreamingRate.rateUpdates(stream.toDS())
        .writeStream.format("memory").queryName("rate_q96_parity")
        .outputMode("update").start()
      try {
        // time-respecting two-batch split, as a watermarked ingest delivers
        val cut = samples.map(_.tsUs).sorted.apply(samples.size / 2)
        val (a, b) = samples.partition(_.tsUs <= cut)
        stream.addData(a); q.processAllAvailable()
        stream.addData(b); q.processAllAvailable()
      } finally q.stop()

      val streaming = latest("rate_q96_parity")
        .map { case (k, r) => k -> r.irate_per_sec.getOrElse(Double.NaN) }
      val batch = operators.EventAnalytics.promInstant(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
      assert(streaming.keySet == batch.keySet)
      streaming.foreach { case (k, v) =>
        val b = batch(k)
        assert(v.isNaN == b.isNaN && (v.isNaN || math.abs(v - b) < 1e-9),
          s"series $k: streaming irate $v != batch q96 $b")
      }
    }
  }

  test("micro-batch plan shape: one shuffle, one TransformWithStateExec") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[CounterSample]
      val q = StreamingRate.rateUpdates(stream.toDS())
        .writeStream.format("memory").queryName("rate_plan")
        .outputMode("update").start()
      try {
        stream.addData(CounterSample("p", 1L, us(1), 1.0))
        q.processAllAvailable()
        val plan = q
          .asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
          .streamingQuery.lastExecution.executedPlan
        val shuffles = plan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
        val tws = plan.collect {
          case p if p.nodeName.contains("TransformWithState") => p
        }
        // the ONLY exchange is the hash partitioning onto the state key —
        // an accidental second shuffle (e.g. from an adapter) fails here
        assert(shuffles.size == 1,
          s"expected exactly 1 shuffle, got ${shuffles.size}:\n$plan")
        assert(tws.nonEmpty, s"TransformWithStateExec missing from plan:\n$plan")
      } finally q.stop()
    }
  }

  test("TTL evicts an idle series; a fresh sample restarts from zero") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[CounterSample]
      val q = StreamingRate.rateUpdates(stream.toDS(), ttl = Some(Duration.ofMillis(500)))
        .writeStream.format("memory").queryName("rate_ttl")
        .outputMode("update").start()
      // The ProcessingTime time mode (required by TTL) fires micro-batches
      // continuously, so processAllAvailable never quiesces — poll the sink
      // for the expected snapshot instead.
      def await(pred: Map[(String, Long), RateTotals] => Boolean): Unit = {
        val deadline = System.nanoTime() + 60L * 1000000000L
        while (!pred(latest("rate_ttl"))) {
          if (System.nanoTime() > deadline) fail("timed out waiting for sink state")
          Thread.sleep(100)
        }
      }
      try {
        stream.addData(CounterSample("t", 1L, us(1), 10.0))
        await(_.contains(("t", 1L)))
        Thread.sleep(1200) // past the TTL: the (t,1) baseline sample expires
        stream.addData(CounterSample("t", 1L, us(2), 12.0))
        // evicted state means the second sample is a FIRST sample again:
        // without eviction this would read (n=2, increase=2.0). Late counter
        // 0 proves ts=2 was not judged against the expired hwm either.
        await(m => m(("t", 1L)).n_samples == 1L && m(("t", 1L)).n_late == 0L &&
          spark.table("rate_ttl").count() >= 2)
      } finally q.stop()
      assert(latest("rate_ttl")(("t", 1L)) ===
        RateTotals("t", 1L, 1L, 0L, 0L, 0.0, None, None))
    }
  }
}
