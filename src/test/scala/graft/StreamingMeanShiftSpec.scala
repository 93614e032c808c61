package graft

import graft.streaming.{GroupTick, ShiftWindow, StreamingMeanShift}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming mean-shift monitoring (q144's continuous twin): day sealing
  * across micro-batches, the 14-closed-day warmup, late-row drop, and
  * exact sum parity with batch q144 on real testdata. */
class StreamingMeanShiftSpec extends AnyFunSuite {
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

  private def run(name: String, batches: Seq[Seq[GroupTick]]): Seq[ShiftWindow] =
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[GroupTick]
      val q = StreamingMeanShift.shiftWindows(stream.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).as[ShiftWindow].collect().toSeq
    }

  private def dayUs(d: Long, i: Long = 0) = d * 86400000000L + i

  test("a day seals when the next day arrives; windows need 14 closed days") {
    // days 0..14 with count d+1 each (1,2,...,15); day 15 opens the seal
    // of day 14. Day 13 seals with only 14 closed days at... build:
    // sealing day 13 → closed = days 0..13 = 14 days → emits; sealing
    // day 14 → emits with window shifted by one.
    val ticks = (0 to 14).flatMap { d =>
      (0 until (d + 1)).map(i => GroupTick("g", dayUs(d, i)))
    } :+ GroupTick("g", dayUs(15))
    val out = run("ms_seal", Seq(ticks))
    assert(out.map(_.day) == Seq(13L, 14L))
    // day 13: after = 7+8+...+13+14? counts are d+1: days 7..13 → 8..14
    assert(out.head == ShiftWindow("g", 13, 14, (8 to 14).sum, (1 to 7).sum))
    assert(out(1) == ShiftWindow("g", 14, 15, (9 to 15).sum, (2 to 8).sum))
  }

  test("sealing bridges micro-batches; late rows behind the open day drop") {
    val a = (0 to 13).flatMap(d => Seq(GroupTick("g", dayUs(d))))
    val out = run("ms_bridge", Seq(a,
      Seq(GroupTick("g", dayUs(5)),   // late: day 5 sealed long ago
        GroupTick("g", dayUs(14)))))  // seals day 13 → first emission
    assert(out == Seq(ShiftWindow("g", 13, 1, 7, 7)))
  }

  test("batch parity: in-order feed reproduces q144's sums on sf0.001") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, unix_micros}
    val rows = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type").as("group"), unix_micros(col("ts")).as("tsUs"))
      .as[GroupTick].collect().sortBy(_.tsUs).toSeq
    val (a, b) = rows.splitAt(rows.length / 2)
    val streamed = run("ms_parity", Seq(a, b))
      .map(w => (w.group, w.day) -> ((w.n_events, w.s_after, w.s_before))).toMap
    val batch = operators.WarehouseOps.changepointMeanShift(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("day").cast("string"), col("n_events"),
        col("s_after"), col("s_before"))
      .as[(String, String, Long, Long, Long)].collect()
      .map { case (g, d, n, sa, sb) =>
        (g, java.time.LocalDate.parse(d).toEpochDay) -> ((n, sa, sb)) }.toMap
    assert(batch.nonEmpty && streamed.nonEmpty)
    // the stream cannot seal each group's final day; everything it DID
    // emit must match the batch row exactly, and it must cover all batch
    // rows except per-group last days
    streamed.foreach { case (k, v) =>
      assert(batch(k) == v, s"mismatch at $k: stream $v vs batch ${batch(k)}")
    }
    val lastDays = batch.keys.groupBy(_._1).map { case (g, ks) => g -> ks.map(_._2).max }
    val expected = batch.keys.filterNot { case (g, d) => lastDays(g) == d }.toSet
    assert(expected.subsetOf(streamed.keySet),
      s"missing sealed days: ${expected -- streamed.keySet}")
  }
}
