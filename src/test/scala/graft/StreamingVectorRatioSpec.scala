package graft

import graft.streaming.{CounterSample, RatioUpdate, StreamingVectorRatio}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming vector ratio — q99's continuous twin: MapState[metric →
  * side state] per matching key, the streaming form of the batch pivot.
  * Invariants: the inner-join drop holds continuously (None until both
  * sides have a defined rate), sides fold with the family rate rules,
  * and the output matches the oracle-checked batch q99 row for row. */
class StreamingVectorRatioSpec extends AnyFunSuite {
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

  private def latest(table: String): Map[Long, RatioUpdate] = {
    import spark.implicits._
    val rows = spark.table(table).as[RatioUpdate].collect().zipWithIndex
    rows.groupBy(_._1.user_id).map { case (k, rs) => k -> rs.maxBy(_._2)._1 }
  }

  test("ratio appears only once both sides have a rate; planted values exact") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[CounterSample]
      val q = StreamingVectorRatio.ratioUpdates(stream.toDS())
        .writeStream.format("memory").queryName("vr_basic")
        .outputMode("update").start()
      try {
        // batch 1: only errors for user 1 → ratio must be None
        stream.addData(
          CounterSample("error", 1L, us(0), 0.0), CounterSample("error", 1L, us(10), 20.0))
        q.processAllAvailable()
        val mid = latest("vr_basic")(1L)
        assert(mid.error_rate === Some(2.0) && mid.click_rate === None && mid.ratio === None)
        // batch 2: clicks arrive → ratio 2.0 / 4.0 = 0.5 (the q99 planted
        // numbers); user 3 stays click-only → None ratio
        stream.addData(
          CounterSample("click", 1L, us(0), 0.0), CounterSample("click", 1L, us(10), 40.0),
          CounterSample("click", 3L, us(0), 0.0), CounterSample("click", 3L, us(10), 5.0))
        q.processAllAvailable()
      } finally q.stop()
      val got = latest("vr_basic")
      assert(got(1L) === RatioUpdate(1L, Some(2.0), Some(4.0), Some(0.5)))
      assert(got(3L) === RatioUpdate(3L, None, Some(0.5), None))
    }
  }

  test("parity with the oracle-checked batch q99 on real testdata") {
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
      val q = StreamingVectorRatio.ratioUpdates(stream.toDS())
        .writeStream.format("memory").queryName("vr_parity")
        .outputMode("update").start()
      try {
        val cut = samples.map(_.tsUs).sorted.apply(samples.size / 2)
        val (a, b) = samples.partition(_.tsUs <= cut)
        stream.addData(a); q.processAllAvailable()
        stream.addData(b); q.processAllAvailable()
      } finally q.stop()

      val streaming = latest("vr_parity")
      val batch = operators.EventAnalytics.promVectorRatio(spark, dir).collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
      assert(batch.nonEmpty && batch.keySet.subsetOf(streaming.keySet))
      batch.foreach { case (k, (e, c, ratio)) =>
        val s = streaming(k)
        assert(s.error_rate === Some(e), s"user $k error rate")
        assert(s.click_rate === Some(c), s"user $k click rate")
        assert(s.ratio === Some(ratio), s"user $k ratio")
      }
      // and the drop rule: no batch row → at least one side undefined
      streaming.filterNot(kv => batch.contains(kv._1)).values.foreach { s =>
        assert(s.ratio.isEmpty, s"user ${s.user_id} should have dropped")
      }
    }
  }
}
