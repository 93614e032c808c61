package graft

import graft.streaming.{GroupTick, StreamingTheilSen, TrendFit}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming Theil–Sen (q195's continuous twin, VERDICT r14 #3): planted
  * exact line recovered, endpoint-spike robustness (the case that moves
  * OLS), ring horizon bounding, late-row surfacing, and EXACT batch
  * parity with q195 on real testdata. */
class StreamingTheilSenSpec extends AnyFunSuite {
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

  private def run(name: String, batches: Seq[Seq[GroupTick]],
                  horizon: Int = 30): Seq[TrendFit] =
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[GroupTick]
      val q = StreamingTheilSen.trendFits(stream.toDS(), horizon)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).as[TrendFit].collect().toSeq
    }

  private def dayUs(d: Long, i: Long = 0) = d * 86400000000L + i

  /** cnt ticks for group g on day d. */
  private def ticksOf(g: String, d: Long, cnt: Long): Seq[GroupTick] =
    (0L until cnt).map(i => GroupTick(g, dayUs(d, i)))

  test("a planted exact line is recovered on every day seal: slope and " +
      "intercept exact, n_pairs = C(n,2)") {
    // cnt = 10 + 2*d on days 0..9; day 10 seals day 9
    val ticks = (0L to 9L).flatMap(d => ticksOf("g", d, 10 + 2 * d)) ++
      Seq(GroupTick("g", dayUs(10)))
    val out = run("ts_line", Seq(ticks))
    // first fit at the seal of day 1 (2 closed days), then every day after
    assert(out.map(_.day) == (1L to 9L))
    out.foreach { f =>
      assert(f.sen_slope == 2.0, s"slope off on day ${f.day}: $f")
      assert(f.sen_intercept == 10.0, s"intercept off on day ${f.day}: $f")
      assert(f.n_pairs == f.n_days * (f.n_days - 1) / 2, s"pairs: $f")
    }
    assert(out.last.n_days == 10)
  }

  test("endpoint-spike robustness: a 50x spike on the newest day leaves " +
      "the Sen slope on the planted line (the case that moves OLS)") {
    // line cnt = 5 + 3*d on days 0..13, then day 14 spikes to 1000;
    // day 15 seals the spike day
    val ticks = (0L to 13L).flatMap(d => ticksOf("g", d, 5 + 3 * d)) ++
      ticksOf("g", 14L, 1000L) :+ GroupTick("g", dayUs(15))
    val out = run("ts_spike", Seq(ticks))
    val atSpike = out.find(_.day == 14L).get
    // 14 of the C(15,2) = 105 pairwise slopes touch the spike — the
    // median does not move off the planted 3.0
    assert(atSpike.n_days == 15 && atSpike.n_pairs == 105, s"$atSpike")
    assert(atSpike.sen_slope == 3.0, s"Sen slope moved by the spike: $atSpike")
    // OLS on the same 15 points, for contrast: slope ≈ 3 + Δ·Σx'/Σx'² with
    // the 905-count residual at x = 14 — far off 3 (sanity of the claim)
    val xs = (0L to 14L).map(_.toDouble)
    val ys = (0L to 13L).map(d => (5 + 3 * d).toDouble) :+ 1000.0
    val xm = xs.sum / 15; val ym = ys.sum / 15
    val ols = xs.zip(ys).map { case (x, y) => (x - xm) * (y - ym) }.sum /
      xs.map(x => (x - xm) * (x - xm)).sum
    assert(math.abs(ols - 3.0) > 5.0, s"spike too weak to distinguish: $ols")
  }

  test("the ring is horizon-bounded: only the last `horizon` closed days " +
      "enter the fit, so an old regime ages out") {
    // days 0..4 flat at 100 (old regime), days 5..12 on the line 2 + 4*d;
    // horizon 8 → at the seal of day 12 the ring is days 5..12 only
    val ticks = (0L to 4L).flatMap(d => ticksOf("g", d, 100)) ++
      (5L to 12L).flatMap(d => ticksOf("g", d, 2 + 4 * d)) :+
      GroupTick("g", dayUs(13))
    val out = run("ts_ring", Seq(ticks), horizon = 8)
    val last = out.find(_.day == 12L).get
    assert(last.n_days == 8 && last.n_pairs == 28, s"$last")
    assert(last.sen_slope == 4.0 && last.sen_intercept == 2.0,
      s"old regime leaked into the ring: $last")
  }

  test("late rows behind the open day drop and surface in n_late; sealing " +
      "bridges micro-batches") {
    val a = Seq(ticksOf("g", 0, 3), ticksOf("g", 1, 5)).flatten
    val out = run("ts_late", Seq(a,
      Seq(GroupTick("g", dayUs(0, 99)),   // late: day 0 sealed in batch 1
        GroupTick("g", dayUs(2)))))       // seals day 1 → first fit
    assert(out.length == 1)
    val f = out.head
    assert(f.day == 1 && f.n_days == 2 && f.n_pairs == 1, s"$f")
    assert(f.sen_slope == 2.0, s"$f") // (5-3)/(1-0)
    assert(f.n_late == 1, s"late row not surfaced: $f")
  }

  test("batch parity: the fit at each group's final day seal reproduces " +
      "q195's row exactly on sf0.001 (same medians, same rounding)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, unix_micros}
    val rows = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type").as("group"), unix_micros(col("ts")).as("tsUs"))
      .as[GroupTick].collect().sortBy(_.tsUs).toSeq
    assert(rows.nonEmpty)
    val maxDay = rows.map(_.tsUs / 86400000000L).max
    val groups = rows.map(_.group).distinct
    // sentinel ticks seal every group's final day (excluded from compare:
    // their own day stays open and never emits)
    val sentinels = groups.map(g => GroupTick(g, dayUs(maxDay + 10)))
    val (a, b) = rows.splitAt(rows.length / 2)
    val streamed = run("ts_parity", Seq(a, b, sentinels), horizon = 3650)
      .groupBy(_.group).map { case (g, fits) => g -> fits.maxBy(_.day) }
    def r6(x: Double): Double =
      BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble + 0.0
    val batch = operators.WarehouseOps.theilSenTrend(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(batch.nonEmpty && streamed.nonEmpty)
    assert(streamed.keySet == batch.keySet,
      s"group sets differ: ${streamed.keySet} vs ${batch.keySet}")
    batch.foreach { case (g, (nDays, nPairs, slope, icept)) =>
      val f = streamed(g)
      assert(f.n_days == nDays && f.n_pairs == nPairs,
        s"$g counts: stream $f vs batch ($nDays, $nPairs)")
      assert(r6(f.sen_slope) == slope,
        s"$g slope: stream ${r6(f.sen_slope)} vs batch $slope")
      assert(r6(f.sen_intercept) == icept,
        s"$g intercept: stream ${r6(f.sen_intercept)} vs batch $icept")
    }
  }
}
