package graft

import graft.streaming.{ChangeRow, CompactUpdate, StreamingCompact}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming changelog compaction (q139's continuous twin): latest-wins
  * across micro-batches, out-of-order tolerance (max_by is
  * order-insensitive), and exact batch parity on real testdata. */
class StreamingCompactSpec extends AnyFunSuite {
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

  /** Runs the batches and returns the LAST update per key — the stream's
    * materialized view at close, the object batch q139 computes. */
  private def run(name: String, batches: Seq[Seq[ChangeRow]]): Map[Long, CompactUpdate] =
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[ChangeRow]
      val q = StreamingCompact.compact(stream.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).as[CompactUpdate].collect().toSeq
        .zipWithIndex.groupBy(_._1.user_id)
        .map { case (k, us) => k -> us.maxBy(_._2)._1 }
    }

  private def us(sec: Long) = sec * 1000000L

  test("latest state wins across micro-batches; every version counts") {
    val r = run("cp_cross", Seq(
      Seq(ChangeRow(1, 1, "view", 1.0, us(10))),
      Seq(ChangeRow(1, 2, "click", 2.0, us(20)), ChangeRow(2, 3, "signup", 9.0, us(5))),
      Seq(ChangeRow(1, 4, "purchase", 3.0, us(15))))) // older than the click
    assert(r(1L) == CompactUpdate(1, 2, "click", 2.0, us(20), 3))
    assert(r(2L) == CompactUpdate(2, 3, "signup", 9.0, us(5), 1))
  }

  test("same-timestamp tie breaks by event_id, matching the batch aggregate") {
    val r = run("cp_tie", Seq(
      Seq(ChangeRow(1, 3, "click", 2.0, us(20))),
      Seq(ChangeRow(1, 2, "purchase", 3.0, us(20))))) // same ts, lower id: loses
    assert(r(1L) == CompactUpdate(1, 3, "click", 2.0, us(20), 2))
  }

  test("batch parity: final updates equal q139 on sf0.001 fed out of order") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, unix_micros}
    val rows = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("tsUs")).as[ChangeRow]
      .collect().sortBy(_.event_id).toSeq // deliberately NOT time order
    val (a, b) = rows.splitAt(rows.length / 2)
    val streamed = run("cp_parity", Seq(a, b))
    val truth = operators.WarehouseOps.changelogCompact(spark, "/root/testdata/sf0.001")
      .as[CompactUpdate].collect().map(u => u.user_id -> u).toMap
    assert(truth.nonEmpty)
    assert(streamed == truth)
  }
}
