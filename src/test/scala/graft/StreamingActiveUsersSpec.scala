package graft

import graft.streaming.{ActivityRow, DaySketch, StreamingActiveUsers}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming DAU/WAU/MAU via per-day KMV panes (q141's continuous twin):
  * batching-invariance of the sketch algebra, exactness below capacity,
  * and exact batch parity against q141 on real testdata. */
class StreamingActiveUsersSpec extends AnyFunSuite {
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

  private def run(name: String, batches: Seq[Seq[ActivityRow]],
                  k: Int = 4096): Seq[DaySketch] =
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[ActivityRow]
      val q = StreamingActiveUsers.daySketches(stream.toDS(), k)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).as[DaySketch].collect().toSeq
    }

  private def dayUs(d: Long) = d * 86400000000L

  test("a day's sketch is independent of batching and arrival order") {
    val rows = Seq(1L, 2L, 3L, 4L, 5L).map(u => ActivityRow(u, dayUs(0) + u))
    val oneShot = run("au_one", Seq(rows))
    val split = run("au_split", Seq(rows.reverse.take(2), rows.reverse.drop(2)))
    assert(oneShot.last.sketch.toSeq == split.last.sketch.toSeq)
    assert(oneShot.last.n_hashes == 5)
  }

  test("windows union panes: DAU is the day, MAU carries 28 days") {
    val panes = run("au_win", Seq(
      Seq(ActivityRow(1, dayUs(0)), ActivityRow(2, dayUs(0)),
        ActivityRow(1, dayUs(10)), ActivityRow(3, dayUs(27)),
        ActivityRow(4, dayUs(28)))))
    val view = StreamingActiveUsers.activeUsers(panes).map(t => t._1 -> t).toMap
    assert(view(0L) == ((0L, 2L, 2L, 2L)))
    assert(view(10L) == ((10L, 1L, 1L, 2L)))   // u1 dedupes across day 0 and 10
    assert(view(27L) == ((27L, 1L, 1L, 3L)))   // day 0 still inside: {u1,u2,u3}
    assert(view(28L) == ((28L, 1L, 2L, 3L)))   // day 0 aged out; WAU = {u3,u4}
  }

  test("batch parity: sketch view equals q141 exactly on sf0.001 (below capacity)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, unix_micros}
    val rows = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), unix_micros(col("ts")).as("tsUs")).as[ActivityRow]
      .collect().toSeq
    val (a, b) = rows.splitAt(rows.length / 2)
    val panes = run("au_parity", Seq(a, b))
    assert(panes.forall(_.n_hashes < 4096), "sf0.001 must stay below capacity")
    val streamed = StreamingActiveUsers.activeUsers(panes)
      .map(t => java.time.LocalDate.ofEpochDay(t._1).toString -> ((t._2, t._3, t._4)))
      .toMap
    val truth = operators.WarehouseOps.stickiness(spark, "/root/testdata/sf0.001")
      .select(col("day").cast("string"), col("dau"), col("wau"), col("mau"))
      .as[(String, Long, Long, Long)].collect()
      .map { case (d, x, y, z) => d -> ((x, y, z)) }.toMap
    assert(truth.nonEmpty)
    assert(streamed == truth)
  }
}
