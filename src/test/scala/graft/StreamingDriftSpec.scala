package graft

import graft.streaming.{DriftScore, StreamingDrift, ValueTick}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming distribution drift (q187/q143's continuous sibling): the
  * first sealed day becomes the reference, later days score KS/PSI
  * against it, a planted shift trips the α=0.05 decision, and the binned
  * histograms match an independent batch aggregation on real testdata. */
class StreamingDriftSpec extends AnyFunSuite {
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

  private def run(name: String, batches: Seq[Seq[ValueTick]],
                  lo: Long, hi: Long, nBins: Int = 10,
                  relearnDays: Option[Int] = None): Seq[DriftScore] =
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[ValueTick]
      val q = StreamingDrift.driftScores(stream.toDS(), lo, hi, nBins, relearnDays)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).as[DriftScore].collect().toSeq
    }

  private def dayUs(d: Long, i: Long = 0) = d * 86400000000L + i * 1000000L

  test("planted shift: a same-shape day keeps H0, a shifted day rejects it") {
    // reference (day 0): 100 values spread over the low bins; day 1 draws
    // the same shape (D = 0); day 2 lands entirely in the high bins — a
    // full separation, D = 1 ≫ 1.358·√(200/10000) ≈ 0.192.
    val low = (0 until 100).map(i => (i % 50).toLong)        // bins 0-4
    val high = (0 until 100).map(i => (50 + i % 50).toLong)  // bins 5-9
    val ticks =
      low.zipWithIndex.map { case (v, i) => ValueTick("g", dayUs(0, i), v) } ++
      low.zipWithIndex.map { case (v, i) => ValueTick("g", dayUs(1, i), v) } ++
      high.zipWithIndex.map { case (v, i) => ValueTick("g", dayUs(2, i), v) } ++
      Seq(ValueTick("g", dayUs(3), 0L)) // opens day 3, sealing day 2
    val out = run("drift_shift", Seq(ticks), lo = 0, hi = 99).sortBy(_.day)
    assert(out.map(_.day) == Seq(1L, 2L), s"sealed days: $out")
    val same = out.head
    assert(same.n_ref == 100 && same.n_day == 100)
    assert(same.d_stat == 0.0 && !same.drifted, s"identical day flagged: $same")
    val shifted = out(1)
    assert(shifted.d_stat == 1.0 && shifted.drifted, s"full shift missed: $shifted")
    assert(shifted.psi > same.psi, "PSI must grow with the shift")
  }

  test("reference learning bridges micro-batches; late rows drop; values clamp") {
    // batch 1 holds days 0 (reference) and part of day 1; batch 2 finishes
    // day 1, adds a late day-0 row (dropped), and day 2 seals day 1.
    val b1 = Seq(ValueTick("g", dayUs(0, 0), 5), ValueTick("g", dayUs(0, 1), 15),
      ValueTick("g", dayUs(1, 0), 5))
    val b2 = Seq(ValueTick("g", dayUs(1, 1), 9999), // clamps into the top bin
      ValueTick("g", dayUs(0, 2), 5),               // late: behind open day 1
      ValueTick("g", dayUs(2, 0), 1))
    val out = run("drift_bridge", Seq(b1, b2), lo = 0, hi = 19, nBins = 2)
    assert(out.length == 1 && out.head.day == 1L, s"got $out")
    // ref hist = [1, 1]; day-1 hist = [1, 1] (9999 clamped into bin 1):
    // identical binned shapes → D = 0 despite the wild value
    assert(out.head.n_ref == 2 && out.head.n_day == 2)
    assert(out.head.d_stat == 0.0 && !out.head.drifted)
  }

  test("relearn: a PERMANENT regime change alarms once, then the re-sealed " +
      "reference adopts the new normal; without relearn it alarms forever") {
    // day 0 (reference): low bins; days 1-4: high bins — the regime moved
    // for good. relearnDays = 2: day 1 scores vs day 0 (drifted) but the
    // epoch is not yet 2 days old... day 2 scores vs day 0 (drifted,
    // epoch age 2 → re-seal to day 2's histogram); days 3-4 score vs the
    // NEW reference (identical shape → clean). Control run without
    // relearn stays drifted on every day.
    val low = (0 until 100).map(i => (i % 50).toLong)
    val high = (0 until 100).map(i => (50 + i % 50).toLong)
    def day(d: Long, vs: Seq[Long]) =
      vs.zipWithIndex.map { case (v, i) => ValueTick("g", dayUs(d, i), v) }
    val ticks = day(0, low) ++ day(1, high) ++ day(2, high) ++
      day(3, high) ++ day(4, high) :+ ValueTick("g", dayUs(5), 0L)
    val relearned = run("drift_relearn", Seq(ticks), lo = 0, hi = 99,
      relearnDays = Some(2)).sortBy(_.day)
    assert(relearned.map(d => d.day -> d.drifted) ==
      Seq(1L -> true, 2L -> true, 3L -> false, 4L -> false),
      s"relearn: $relearned")
    val fixed = run("drift_fixed", Seq(ticks), lo = 0, hi = 99).sortBy(_.day)
    assert(fixed.map(d => d.day -> d.drifted) ==
      Seq(1L -> true, 2L -> true, 3L -> true, 4L -> true),
      s"fixed reference: $fixed")
  }

  test("batch parity on sf0.001: streamed KS/PSI equals scores computed from " +
      "an independent batch histogram aggregation") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val (lo, hi, nBins) = (0L, 9999L, 10)
    val purchases = graft.Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(lit("purchase").as("group"), unix_micros(col("ts")).as("tsUs"),
        round(col("value") * 100, 0).cast("long").as("cents"))
    val rows = purchases.as[ValueTick].collect().sortBy(_.tsUs).toSeq
    assert(rows.nonEmpty)
    val (a, b) = rows.splitAt(rows.length / 2)
    val streamed = run("drift_parity", Seq(a, b), lo, hi, nBins)
      .map(s => s.day -> s).toMap

    // independent batch derivation: day × bin histograms via Spark SQL
    val hists: Map[Long, Seq[Long]] = purchases
      .withColumn("day", expr("tsUs div 86400000000"))
      .withColumn("clamped", greatest(lit(lo), least(lit(hi), col("cents"))))
      .withColumn("bin", least(lit(nBins - 1),
        expr(s"(clamped - $lo) * $nBins div ${hi - lo + 1}")).cast("int"))
      .groupBy(col("day"), col("bin")).count()
      .collect().toSeq.groupBy(_.getLong(0))
      .map { case (d, rs) =>
        d -> Seq.tabulate(nBins)(i =>
          rs.find(_.getInt(1) == i).map(_.getLong(2)).getOrElse(0L))
      }
    val days = hists.keys.toSeq.sorted
    val ref = hists(days.head)
    val nRef = ref.sum
    // the stream cannot seal the final day; all days in between must match
    days.drop(1).dropRight(1).foreach { d =>
      val cur = hists(d)
      val nDay = cur.sum
      val cums = ref.scanLeft(0L)(_ + _).drop(1).zip(cur.scanLeft(0L)(_ + _).drop(1))
      val dNum = cums.map { case (cr, cd) => math.abs(cr * nDay - cd * nRef) }.max
      val expectD = dNum.toDouble / (nRef.toDouble * nDay)
      val expectPsi = (0 until nBins).map { i =>
        val p = (ref(i) + 1).toDouble / (nRef + nBins)
        val q = (cur(i) + 1).toDouble / (nDay + nBins)
        (p - q) * math.log(p / q)
      }.sum
      val got = streamed.getOrElse(d, fail(s"day $d missing from stream output"))
      assert(got.n_ref == nRef && got.n_day == nDay, s"day $d counts: $got")
      assert(got.d_stat == expectD, s"day $d KS: $got vs $expectD")
      assert(got.psi == expectPsi, s"day $d PSI: $got vs $expectPsi")
    }
    assert(days.length - 2 > 0, "fixture too small to exercise parity")
  }
}
