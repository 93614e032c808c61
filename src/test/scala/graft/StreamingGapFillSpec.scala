package graft

import graft.streaming.{GridFill, SeriesSample, StreamingGapFill}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming gap-fill (q171's continuous twin): every grid point emitted
  * exactly once, lerped between the same brackets as the batch core, with
  * exact parity on real testdata fed in order. */
class StreamingGapFillSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Hour = 3600000000L

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

  // assertNone: state (de)serialization must stay in codegen — the r16
  // plain-`private` LastSample regression ran every state access interpreted
  private def run(name: String, batches: Seq[Seq[SeriesSample]]): Seq[GridFill] =
    CodegenFallbackGuard.assertNone(withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[SeriesSample]
      val q = StreamingGapFill.fill(stream.toDS(), Hour)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).as[GridFill].collect().toSeq
    })

  private def us(sec: Long) = sec * 1000000L

  test("grid points finalize on the first at-or-after sample; each exactly once") {
    // ramp 30 m → 150 m (t/60 values): hourly points at 60 m / 120 m lerp
    // to 60 and 120, split across batches; the aligned first sample of
    // series 'flat' carries its own point
    val r = run("gf_basic", Seq(
      Seq(SeriesSample("ramp", us(1800), 30.0), SeriesSample("flat", us(3600), 7.0)),
      Seq(SeriesSample("ramp", us(9000), 150.0)),
      Seq(SeriesSample("flat", us(7200), 9.0))))
    assert(r.toSet == Set(
      GridFill("ramp", us(3600), 60.0), GridFill("ramp", us(7200), 120.0),
      GridFill("flat", us(3600), 7.0), GridFill("flat", us(7200), 9.0)))
    assert(r.size == 4) // no duplicates across batches
  }

  test("late rows are dropped, not re-filled (high-water-mark contract)") {
    val r = run("gf_late", Seq(
      Seq(SeriesSample("m", us(1800), 1.0), SeriesSample("m", us(5400), 3.0)),
      Seq(SeriesSample("m", us(3000), 99.0)))) // late: already bracketed past it
    assert(r == Seq(GridFill("m", us(3600), 2.0))) // lerp of 1.0..3.0 midpoint
  }

  test("batch parity: streamed fill equals gapFillCore on collapsed sf0.001") {
    import spark.implicits._
    // collapse same-(name, ts) samples (the documented precondition) and
    // compare against the batch core on the SAME collapsed frame
    val collapsed = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("value").isNotNull)
      .select(col("event_type").as("name"), unix_micros(col("ts")).as("tsUs"),
        col("value"))
      .groupBy(col("name"), col("tsUs")).agg(max(col("value")).as("value"))
    val truth = operators.EventAnalytics
      .gapFillCore(collapsed.withColumnRenamed("tsUs", "tus"), Seq("name"), Hour)
      .select(col("name"), unix_micros(col("grid_ts")).as("grid_us"), col("value"))
      .as[GridFill].collect().toSet
    assert(truth.nonEmpty)

    val rows = collapsed.as[SeriesSample].collect()
      .sortBy(r => (r.tsUs, r.value)).toSeq // in order, as the contract requires
    val (a, b) = rows.splitAt(rows.length / 2)
    val streamed = run("gf_parity", Seq(a, b)).toSet
    assert(streamed == truth,
      s"stream/batch drift: missing=${(truth -- streamed).take(3)} " +
        s"extra=${(streamed -- truth).take(3)}")
  }
}
