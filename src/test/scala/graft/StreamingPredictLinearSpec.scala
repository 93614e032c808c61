package graft

import graft.streaming.{CounterSample, PredictUpdate, StreamingPredictLinear}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming predict_linear — q97's continuous twin on Welford co-moment
  * state: exact planted-line recovery, cross-batch accumulation, the
  * m2x=0 guard, and row-level parity with the oracle-checked batch q97. */
class StreamingPredictLinearSpec extends AnyFunSuite {
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

  private def latest(table: String): Map[(String, Long), PredictUpdate] = {
    import spark.implicits._
    spark.table(table).as[PredictUpdate].collect()
      .groupBy(r => (r.name, r.user_id))
      .map { case (k, rs) => k -> rs.maxBy(_.n_samples) }
  }

  test("planted line recovered exactly across micro-batches; single-instant guard") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[CounterSample]
      val q = StreamingPredictLinear.predictUpdates(stream.toDS())
        .writeStream.format("memory").queryName("pl_line")
        .outputMode("update").start()
      try {
        // value = 2 + 0.5·x at x = 0,10 then 20,30 (the q97 planted line,
        // split across batches); plus a same-ts pair (m2x = 0 → None)
        stream.addData(
          CounterSample("lin", 2L, us(0), 2.0), CounterSample("lin", 2L, us(10), 7.0),
          CounterSample("flat", 1L, us(5), 1.0), CounterSample("flat", 1L, us(5), 9.0))
        q.processAllAvailable()
        stream.addData(
          CounterSample("lin", 2L, us(20), 12.0), CounterSample("lin", 2L, us(30), 17.0))
        q.processAllAvailable()
      } finally q.stop()
      val got = latest("pl_line")
      assert(got(("lin", 2L)) ===
        PredictUpdate("lin", 2L, 4L, Some(0.5), Some(2.0), Some(167.0)))
      assert(got(("flat", 1L)) === PredictUpdate("flat", 1L, 2L, None, None, None))
    }
  }

  test("sufficient statistics survive a checkpointed restart") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val ckpt = java.nio.file.Files.createTempDirectory("pl_ckpt").toString
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[PredictUpdate]()
      val stream = MemoryStream[CounterSample]
      def start() = StreamingPredictLinear.predictUpdates(stream.toDS())
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[PredictUpdate], _: Long) =>
          batch.collect().foreach(seen.add)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()

      val q1 = start()
      try {
        stream.addData(CounterSample("lin", 2L, us(0), 2.0), CounterSample("lin", 2L, us(10), 7.0))
        q1.processAllAvailable()
      } finally q1.stop()

      val q2 = start() // same checkpoint: RegrState must reload
      try {
        stream.addData(CounterSample("lin", 2L, us(20), 12.0), CounterSample("lin", 2L, us(30), 17.0))
        q2.processAllAvailable()
      } finally q2.stop()

      // state loss would re-anchor t0 at 20 s and fit only the tail two
      // points; continuity reproduces the all-in-one-run planted answer
      import scala.jdk.CollectionConverters._
      val last = seen.asScala.toSeq.maxBy(_.n_samples)
      assert(last === PredictUpdate("lin", 2L, 4L, Some(0.5), Some(2.0), Some(167.0)))
    }
  }

  test("parity with the oracle-checked batch q97 on real testdata") {
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
      val q = StreamingPredictLinear.predictUpdates(stream.toDS())
        .writeStream.format("memory").queryName("pl_parity")
        .outputMode("update").start()
      try {
        // time-respecting split: first-seen = series min, the q97 centering
        val cut = samples.map(_.tsUs).sorted.apply(samples.size / 2)
        val (a, b) = samples.partition(_.tsUs <= cut)
        stream.addData(a); q.processAllAvailable()
        stream.addData(b); q.processAllAvailable()
      } finally q.stop()

      val streaming = latest("pl_parity")
      val batch = operators.EventAnalytics.promPredictLinear(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
      assert(batch.nonEmpty && batch.keySet.subsetOf(streaming.keySet))
      batch.foreach { case (k, (n, slope, icept, pred)) =>
        val s = streaming(k)
        assert(s.n_samples == n, s"$k sample count")
        // both sides round HALF_UP from the same co-moment algorithm; allow
        // one ulp of the rounding grid for last-bit float divergence
        assert(math.abs(s.slope_per_sec.get - slope) <= 1.000001e-6, s"$k slope")
        assert(math.abs(s.intercept.get - icept) <= 1.000001e-4, s"$k intercept")
        assert(math.abs(s.predict_5m.get - pred) <= 1.000001e-4, s"$k predict")
      }
    }
  }
}
