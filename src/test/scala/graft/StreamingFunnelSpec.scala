package graft

import graft.streaming.{FunnelEvent, FunnelProgress, StreamingFunnel}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, unix_micros}
import org.scalatest.funsuite.AnyFunSuite

/** Streaming funnel (q121's continuous twin): planted ordered-step
  * semantics, exact batch parity on real testdata fed in event order, and
  * the late-row contract. */
class StreamingFunnelSpec extends AnyFunSuite {
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

  /** Latest Update-mode row per user: stage and n_late are monotone, and
    * step timestamps are write-once, so the max (stage, n_late) row is the
    * newest batch's. */
  private def lastSnapshot(table: String): Map[Long, FunnelProgress] = {
    import spark.implicits._
    spark.table(table).as[FunnelProgress].collect().toSeq
      .groupBy(_.user_id).map { case (u, rows) =>
        u -> rows.maxBy(r => (r.stage, r.n_late))
      }
  }

  private def run(name: String, batches: Seq[Seq[FunnelEvent]],
                  windowUs: Long = StreamingFunnel.DefaultWindowUs): Map[Long, FunnelProgress] =
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[FunnelEvent]
      val q = StreamingFunnel.progressUpdates(stream.toDS(), windowUs)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      lastSnapshot(name)
    }

  private def us(sec: Long) = sec * 1000000L

  test("ordered steps: early click ignored, window binds, later events can't regress") {
    val snap = run("funnel_sem", Seq(
      Seq(FunnelEvent(1, "view", us(0)), FunnelEvent(1, "click", us(10)),
        FunnelEvent(2, "click", us(0)), FunnelEvent(2, "view", us(10)),
        FunnelEvent(3, "view", us(0)), FunnelEvent(3, "click", us(10))),
      Seq(FunnelEvent(1, "purchase", us(20)),
        FunnelEvent(2, "purchase", us(20)),
        FunnelEvent(3, "purchase", us(8 * 86400)))))
    assert(snap(1L).stage == 3 && snap(1L).t3Us.contains(us(20)))
    assert(snap(2L).stage == 1) // click preceded the first view: no step 2
    assert(snap(3L).stage == 2) // purchase landed outside t1 + 7 days
    assert(snap.values.forall(_.n_late == 0L))
  }

  test("batch parity on sf0.001 events fed in ts order") {
    import spark.implicits._
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val ordered = StreamingFunnel.fromEvents(events)
      .collect().sortBy(e => (e.tsUs, e.event_type)).toSeq
    val (a, b) = ordered.splitAt(ordered.length / 2)
    val snap = run("funnel_parity", Seq(a, b))
    val truth = operators.ProductAnalytics.funnelPerUser(events)
      .select(col("user_id"), unix_micros(col("t1")).as("t1"),
        unix_micros(col("t2")).as("t2"), unix_micros(col("t3")).as("t3"))
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect()
    assert(truth.nonEmpty)
    truth.foreach { case (u, t1, t2, t3) =>
      val s = snap(u)
      assert((s.t1Us, s.t2Us, s.t3Us) == ((t1, t2, t3)), s"user $u")
    }
    assert(snap.values.forall(_.n_late == 0L))
  }

  test("a row behind the high-water mark is counted late, not spliced in") {
    val snap = run("funnel_late", Seq(
      Seq(FunnelEvent(1, "view", us(100))),
      Seq(FunnelEvent(1, "view", us(50)))))
    assert(snap(1L).t1Us.contains(us(100)))
    assert(snap(1L).n_late == 1L)
  }
}
