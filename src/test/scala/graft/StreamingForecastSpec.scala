package graft

import graft.streaming.{ForecastEval, GroupTick, StreamingForecast}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming seasonal-naive forecast scoring (q149's continuous twin):
  * weekday-slot handover, the missing-week inner-join rule, and exact
  * per-day parity with the batch join on real testdata. */
class StreamingForecastSpec extends AnyFunSuite {
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

  private def run(name: String, batches: Seq[Seq[GroupTick]]): Seq[ForecastEval] =
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[GroupTick]
      val q = StreamingForecast.forecastEvals(stream.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).as[ForecastEval].collect().toSeq
    }

  private def dayUs(d: Long, i: Long = 0) = d * 86400000000L + i

  test("a sealed day scores against the same weekday one week back, else silent") {
    // day 0: 2 events; day 7: 5 events (scores 2 when day 8 seals it);
    // day 21: same weekday but day 14 missing → NO emission (inner join)
    val ticks =
      (0 until 2).map(i => GroupTick("g", dayUs(0, i))) ++
      (0 until 5).map(i => GroupTick("g", dayUs(7, i))) ++
      Seq(GroupTick("g", dayUs(8))) ++
      Seq(GroupTick("g", dayUs(21)), GroupTick("g", dayUs(22)))
    val out = run("fc_basic", Seq(ticks))
    assert(out == Seq(ForecastEval("g", 7, 5, 2, 3)))
  }

  test("batch parity: in-order feed reproduces the q149 day pairs on sf0.001") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, unix_micros, expr}
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val rows = events
      .select(col("event_type").as("group"), unix_micros(col("ts")).as("tsUs"))
      .as[GroupTick].collect().sortBy(_.tsUs).toSeq
    val (a, b) = rows.splitAt(rows.length / 2)
    val streamed = run("fc_parity", Seq(a, b))
      .map(e => (e.group, e.day) -> ((e.actual, e.predicted, e.abs_err))).toMap
    // truth: the batch daily join, keyed by epoch day
    val daily = events.groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("c"))
    val truth = daily.as("d").join(daily.as("p"),
        col("d.event_type") === col("p.event_type") &&
          col("d.day") === col("p.day") + 7)
      .select(col("d.event_type"), col("d.day"), col("d.c"), col("p.c").as("pred"))
      .as[(String, Long, Long, Long)].collect()
      .map { case (g, d, c, p) => (g, d) -> ((c, p, math.abs(c - p))) }.toMap
    assert(truth.nonEmpty && streamed.nonEmpty)
    streamed.foreach { case (k, v) =>
      assert(truth(k) == v, s"mismatch at $k: stream $v vs batch ${truth(k)}")
    }
    val lastDayByGroup = events.groupBy(col("event_type"))
      .agg(expr("max(unix_micros(ts) div 86400000000)").as("last"))
      .as[(String, Long)].collect().toMap
    val expected = truth.keys.filterNot { case (g, d) => lastDayByGroup(g) == d }.toSet
    assert(expected.subsetOf(streamed.keySet),
      s"missing scored days: ${expected -- streamed.keySet}")
  }
}
