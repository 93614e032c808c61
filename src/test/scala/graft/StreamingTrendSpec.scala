package graft

import graft.streaming.{GroupTick, StreamingTrend, TrendUpdate}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming OLS trend (q178's continuous twin): the O(1) moment fold,
  * the degenerate-fit silences, and exact parity with the batch operator
  * over the closed-day prefix of a shared fixture. */
class StreamingTrendSpec extends AnyFunSuite {
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

  private def run(name: String, batches: Seq[Seq[GroupTick]]): Seq[TrendUpdate] =
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[GroupTick]
      val q = StreamingTrend.trendUpdates(stream.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).as[TrendUpdate].collect().toSeq
    }

  private def dayUs(d: Long, i: Long = 0) = d * 86400000000L + i

  /** y = 10 + 2d on days 0..last (one tick per event). */
  private def linTicks(group: String, last: Int): Seq[GroupTick] =
    (0 to last).flatMap { d =>
      (0 until 10 + 2 * d).map(i => GroupTick(group, dayUs(d.toLong, i)))
    }

  test("each day close refreshes the fit; a perfect line stays slope 2, R² 1") {
    // days 0..4 carry y = 10 + 2d; day 5 exists only to seal day 4.
    val out = run("tr_line", Seq(linTicks("g", 4) :+ GroupTick("g", dayUs(5))))
    // first emission after TWO closed days (n=1 is degenerate), then daily
    assert(out.map(_.day) == Seq(1L, 2L, 3L, 4L))
    out.foreach { u =>
      assert(u.slope == 2.0 && u.intercept == 10.0 && u.r2.contains(1.0),
        s"bad fit: $u")
    }
    assert(out.last.n_days == 5 && out.last.forecast_next == 20.0)
  }

  test("a flat series fits slope 0 with NULL R²; one closed day stays silent") {
    val flat = (0 to 2).flatMap(d => (0 until 5).map(i => GroupTick("f", dayUs(d.toLong, i))))
    val out = run("tr_flat", Seq(flat :+ GroupTick("f", dayUs(3))))
    assert(out.map(_.day) == Seq(1L, 2L))
    out.foreach(u => assert(u.slope == 0.0 && u.intercept == 5.0 && u.r2.isEmpty, s"$u"))
    assert(out.last.forecast_next == 5.0)
  }

  test("late ticks for sealed days are dropped AND counted in n_late") {
    // day 0..2 close normally; a tick for already-sealed day 0 arrives in
    // batch 2 — it must not perturb the fit, but the next emission must
    // carry n_late = 1 (the ADVICE r13 monitoring surface).
    val a = linTicks("lt", 2) :+ GroupTick("lt", dayUs(3))
    val b = GroupTick("lt", dayUs(0, 99)) +:
      ((1 to 15).map(i => GroupTick("lt", dayUs(3, i))) :+ GroupTick("lt", dayUs(4)))
    val out = run("tr_late", Seq(a, b))
    assert(out.filter(_.day <= 2).forall(_.n_late == 0L), out.toString)
    assert(out.maxBy(_.day).n_late == 1L, out.toString)
  }

  test("batch parity: the last emission equals q178 on the closed-day prefix, " +
      "and a split feed resumes the moments across batches") {
    import spark.implicits._
    // same fixture as the batch q178 spec: 'lin' y = 10+2d, days 0..4,
    // plus day 5 as the sealer — the closed prefix is days 0..4, exactly
    // what batch olsTrend sees when run on the prefix alone.
    val ticks = linTicks("lin", 4) :+ GroupTick("lin", dayUs(5))
    val (a, b) = ticks.splitAt(ticks.length / 2)
    val streamed = run("tr_parity", Seq(a, b)).maxBy(_.day)
    val dir = java.nio.file.Files.createTempDirectory("graft-trend").toString
    linTicks("lin", 4)
      .zipWithIndex
      .map { case (t, i) => (i.toLong, t.tsUs * 1000L, 1L, t.group, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = operators.WarehouseOps.olsTrend(spark, dir).collect().head
    assert(streamed.n_days == batch.getLong(1))
    assert(streamed.slope == batch.getDouble(2))
    assert(streamed.intercept == batch.getDouble(3))
    assert(streamed.r2 == Option(batch.get(4)).map(_.asInstanceOf[Double]))
    assert(streamed.forecast_next == batch.getDouble(5))
  }
}
