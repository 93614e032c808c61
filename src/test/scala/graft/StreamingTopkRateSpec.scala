package graft

import graft.streaming.{CounterSample, StreamingTopkRate, TopkRate}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming topk(rate) — q83's continuous twin: per-metric MapState of
  * series rates, top-k re-emitted per touched micro-batch, rankings that
  * REORDER as later samples change the rates. */
class StreamingTopkRateSpec extends AnyFunSuite {
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

  test("rankings match q83 semantics and reorder as rates change") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[CounterSample]
      val q = StreamingTopkRate.topkRate(stream.toDS(), k = 2)
        .writeStream.format("memory").queryName("tkr")
        .outputMode("update").start()
      try {
        // metric m: series 1 rate 2/s, series 2 rate 5/s, series 3 single
        // sample (no interval -> excluded); metric n: series 9 rate 1/s
        stream.addData(
          CounterSample("m", 1L, us(0), 0.0), CounterSample("m", 1L, us(2), 4.0),
          CounterSample("m", 2L, us(0), 0.0), CounterSample("m", 2L, us(2), 10.0),
          CounterSample("m", 3L, us(1), 7.0),
          CounterSample("n", 9L, us(0), 0.0), CounterSample("n", 9L, us(2), 2.0))
        q.processAllAvailable()
        // batch 2 only touches metric m: series 1 accelerates past series 2
        // (total 40 over 4s = 10/s vs series 2's 10 over 2s = 5/s)
        stream.addData(CounterSample("m", 1L, us(4), 40.0))
        q.processAllAvailable()
      } finally q.stop()

      val rows = spark.table("tkr").as[TopkRate].collect().toSet
      // batch-1 snapshot: series 2 leads, series 1 second, series 3 absent
      assert(rows(TopkRate("m", 2L, 5.0, 1)) && rows(TopkRate("m", 1L, 2.0, 2)))
      // batch-2 snapshot: the ranking REORDERED — series 1 leads at 10/s,
      // series 2 demoted to rank 2 at its unchanged rate
      assert(rows(TopkRate("m", 1L, 10.0, 1)) && rows(TopkRate("m", 2L, 5.0, 2)))
      assert(rows.filter(_.name == "n") === Set(TopkRate("n", 9L, 1.0, 1)))
      assert(!rows.exists(_.user_id == 3L), "no-interval series must not rank")
      assert(rows.forall(_.rank <= 2))
    }
  }

  test("parity with the oracle-checked batch q83 on real testdata") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val dir = "/root/testdata/sf0.001"
      // q83's input shape: name = event_type, series = user_id
      import org.apache.spark.sql.functions.{col, unix_micros}
      val samples = graft.Tables(spark, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("event_type").as("name"), col("user_id"),
          unix_micros(col("ts")).as("tsUs"), col("value"))
        .as[CounterSample].collect().toSeq

      val stream = MemoryStream[CounterSample]
      val q = StreamingTopkRate.topkRate(stream.toDS(), k = 3)
        .writeStream.format("memory").queryName("tkr_parity")
        .outputMode("update").start()
      try {
        // split at a global time boundary (streaming consumes series
        // forward in time; a time-respecting cut is what a watermarked
        // ingest delivers, and it must not change the answer)
        val cut = samples.map(_.tsUs).sorted.apply(samples.size / 2)
        val (a, b) = samples.partition(_.tsUs <= cut)
        stream.addData(a); q.processAllAvailable()
        stream.addData(b); q.processAllAvailable()
      } finally q.stop()

      // last emission per metric = rows of the final (k per metric) batch;
      // reconstruct by keeping each (name, rank)'s LAST row in table order
      val emitted = spark.table("tkr_parity").as[TopkRate].collect()
      val streaming = emitted.zipWithIndex
        .groupBy(r => (r._1.name, r._1.rank))
        .map { case (_, rs) => rs.maxBy(_._2)._1 }
        .toSeq.sortBy(r => (r.name, r.rank))

      val batch = operators.EventAnalytics.promTopkRate(spark, dir)
        .collect().map(r => TopkRate(r.getString(0), r.getLong(1),
          r.getDouble(2), r.getInt(3))).toSeq.sortBy(r => (r.name, r.rank))

      assert(streaming === batch,
        "streaming topk(rate) must equal the DuckDB-oracle-checked batch q83")
    }
  }

  test("k bounds the emission; counter resets fold like q82/q83") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[CounterSample]
      val q = StreamingTopkRate.topkRate(stream.toDS(), k = 1)
        .writeStream.format("memory").queryName("tkr_k1")
        .outputMode("update").start()
      try {
        stream.addData(
          // series 5: 0 -> 6 -> reset to 2: increase 6 + 2 = 8 over 4s = 2/s
          CounterSample("r", 5L, us(0), 0.0), CounterSample("r", 5L, us(2), 6.0),
          CounterSample("r", 5L, us(4), 2.0),
          // series 6: steady 1/s
          CounterSample("r", 6L, us(0), 0.0), CounterSample("r", 6L, us(4), 4.0))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("tkr_k1").as[TopkRate].collect().toSeq
      assert(rows === Seq(TopkRate("r", 5L, 2.0, 1)), s"got $rows")
    }
  }
}
