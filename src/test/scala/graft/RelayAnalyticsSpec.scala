package graft

import java.time.Duration

import graft.sources.Prompb.{Sample, TimeSeries}
import graft.sources.{Prompb, RemoteWrite}
import graft.streaming.{HeavyHitter, RangeRate, RelayAnalytics, SeriesTransition,
  StreamingHeavyHitters, StreamingRangeRate, StreamingRate, StreamingStaleness}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, lit, map}
import org.scalatest.funsuite.AnyFunSuite

/** The canonical relay adapter ([[RelayAnalytics]]): series identity = the
  * FULL sorted label set (the reference's own key, `record.go:8-14`), one
  * rule for every streaming operator — each non-rate operator gets its
  * end-to-end from-protobuf case here, like `StreamingRateSpec`'s wire
  * test for rate. */
class RelayAnalyticsSpec extends AnyFunSuite {
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

  private def body(ts: TimeSeries*): Array[Byte] =
    org.xerial.snappy.Snappy.compress(Prompb.encode(ts))

  test("series identity is the full sorted label set, insensitive to map order") {
    val df = spark.range(1).select(
      RelayAnalytics.seriesId(map(lit("job"), lit("api"), lit("az"), lit("1a")))
        .as("fwd"),
      RelayAnalytics.seriesId(map(lit("az"), lit("1a"), lit("job"), lit("api")))
        .as("rev"),
      RelayAnalytics.seriesId(map(lit("job"), lit("api"), lit("az"), lit("1b")))
        .as("other"),
      RelayAnalytics.seriesString(map(lit("job"), lit("api"), lit("az"), lit("1a")))
        .as("str"))
    val r = df.collect().head
    assert(r.getLong(0) === r.getLong(1), "label-map order must not change identity")
    assert(r.getLong(0) !== r.getLong(2), "one differing label value = distinct series")
    assert(r.getString(3) === """{az="1a",job="api"}""")
  }

  test("wire bodies → counterSamples → range rate: full-label identity separates series") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val bodies = MemoryStream[Array[Byte]]
      val samples = RelayAnalytics.counterSamples(
        RemoteWrite.fromBodies(bodies.toDS().toDF("body")))
      val q = StreamingRangeRate.rangeRate(samples, Duration.ofSeconds(10))
        .writeStream.format("memory").queryName("ra_rrate")
        .outputMode("update").start()
      try {
        // same metric name, two label sets: MUST be two series (a
        // single-label adapter keyed on a missing label would merge them)
        bodies.addData(body(
          TimeSeries(Map("__name__" -> "reqs", "job" -> "api"),
            Seq(Sample(10.0, 1000L), Sample(12.0, 2000L))),
          TimeSeries(Map("__name__" -> "reqs", "job" -> "web"),
            Seq(Sample(5.0, 1000L), Sample(6.0, 2000L)))))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("ra_rrate").as[RangeRate].collect().toSeq
      assert(rows.map(_.user_id).distinct.size === 2, "two label sets, two series")
      assert(rows.forall(_.name == "reqs"))
      assert(rows.map(r => (r.n_in_window, r.increase, r.rate_per_sec)).toSet ===
        Set((2L, 2.0, Some(2.0)), (2L, 1.0, Some(1.0))))
    }
  }

  test("wire bodies → tokenEvents → heavy hitters: label-set cardinality monitor") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val bodies = MemoryStream[Array[Byte]]
      val tokens = RelayAnalytics.tokenEvents(
        RemoteWrite.fromBodies(bodies.toDS().toDF("body")))
      val q = StreamingHeavyHitters.topK(tokens, capacity = 10, k = 2)
        .writeStream.format("memory").queryName("ra_hh")
        .outputMode("update").start()
      try {
        bodies.addData(body(
          TimeSeries(Map("__name__" -> "reqs", "job" -> "api"),
            Seq(Sample(1.0, 1000L), Sample(2.0, 2000L), Sample(3.0, 3000L))),
          TimeSeries(Map("__name__" -> "reqs", "job" -> "web"),
            Seq(Sample(1.0, 1000L))),
          // zero-sample series still EXISTS (explode_outer row) and counts
          TimeSeries(Map("__name__" -> "reqs", "job" -> "idle"), Seq.empty)))
        q.processAllAvailable()
      } finally q.stop()
      val top = spark.table("ra_hh").as[HeavyHitter].collect().toSeq.sortBy(_.rank)
      assert(top.head === HeavyHitter("reqs",
        """{__name__="reqs",job="api"}""", 3L, 0L, 1))
      assert(top.tail.map(h => (h.token, h.count)).toSet.subsetOf(Set(
        ("""{__name__="reqs",job="web"}""", 1L),
        ("""{__name__="reqs",job="idle"}""", 1L))))
    }
  }

  test("wire bodies → counterSamples → staleness markers") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val bodies = MemoryStream[Array[Byte]]
      val samples = RelayAnalytics.counterSamples(
        RemoteWrite.fromBodies(bodies.toDS().toDF("body")))
      val q = StreamingStaleness.transitions(samples, Duration.ofMillis(600))
        .writeStream.format("memory").queryName("ra_stale")
        .outputMode("update").start()
      try {
        bodies.addData(body(
          TimeSeries(Map("__name__" -> "up", "host" -> "h1"), Seq(Sample(1.0, 5000L)))))
        val deadline = System.nanoTime() + 90L * 1000000000L
        def stales() = spark.table("ra_stale").as[SeriesTransition].collect().toSeq
        while (stales().isEmpty) {
          if (System.nanoTime() > deadline) fail("timed out waiting for stale marker")
          Thread.sleep(100)
        }
        val t = stales().head
        assert(t.name === "up")
        assert(t.event === "stale")
        assert(t.last_ts_us === 5000000L)
      } finally q.stop()
    }
  }

  test("the adapter adds no shuffle: one exchange end-to-end from bodies") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val bodies = MemoryStream[Array[Byte]]
      val samples = RelayAnalytics.counterSamples(
        RemoteWrite.fromBodies(bodies.toDS().toDF("body")))
      val q = StreamingRate.rateUpdates(samples)
        .writeStream.format("memory").queryName("ra_plan")
        .outputMode("update").start()
      try {
        bodies.addData(body(
          TimeSeries(Map("__name__" -> "m", "job" -> "x"), Seq(Sample(1.0, 1000L)))))
        q.processAllAvailable()
        val plan = q
          .asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
          .streamingQuery.lastExecution.executedPlan
        val shuffles = plan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
        assert(shuffles.size == 1,
          s"adapter must add no exchange beyond the state-key partitioning:\n$plan")
      } finally q.stop()
    }
  }
}
