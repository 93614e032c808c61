package graft

import graft.streaming.{SkewUpdate, StreamingSkewProfile, TokenEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming join-key skew watch (q181's continuous third): exact shares
  * when capacity covers the keys, space-saving bounds when it doesn't,
  * and the ⌈share·P⌉ salt sizing across batches. */
class StreamingSkewProfileSpec extends AnyFunSuite {
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

  private def run(name: String, capacity: Int,
                  batches: Seq[Seq[TokenEvent]]): Seq[SkewUpdate] =
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[TokenEvent]
      val q = StreamingSkewProfile.skewUpdates(stream.toDS(), capacity, partitions = 32)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).as[SkewUpdate].collect().toSeq
    }

  test("a 50% hot key reads share 0.5 and salt 16 of 32 partitions, exactly, " +
      "then dilutes as cold traffic arrives") {
    val hot = Seq.fill(50)(TokenEvent("user_id", "hot"))
    val cold1 = (0 until 50).map(i => TokenEvent("user_id", s"c$i"))
    val cold2 = (50 until 150).map(i => TokenEvent("user_id", s"c$i"))
    val out = run("skew_exact", capacity = 1000, Seq(hot ++ cold1, cold2))
    assert(out.map(_.n_rows).sorted == Seq(100L, 200L))
    val b1 = out.find(_.n_rows == 100L).get
    assert(b1 == SkewUpdate("user_id", 100L, "hot", 50L, 0L, 0.5, 16), s"$b1")
    val b2 = out.find(_.n_rows == 200L).get
    // exact (capacity covers keys): share halves, salt follows ⌈0.25·32⌉
    assert(b2 == SkewUpdate("user_id", 200L, "hot", 50L, 0L, 0.25, 8), s"$b2")
  }

  test("over capacity, the hot key still surfaces with the paper's bounds " +
      "and the salt never understates its true share") {
    // 60 hot + 140 one-off cold keys through capacity 8: hot's true
    // frequency (0.3) ≫ N/capacity (0.125) → guaranteed tracked; the
    // estimate may overshoot by at most its recorded error.
    val rows = Seq.fill(60)(TokenEvent("k", "hot")) ++
      (0 until 140).map(i => TokenEvent("k", s"c$i"))
    // interleave deterministically so eviction pressure is realistic
    val mixed = rows.zipWithIndex.sortBy { case (_, i) => (i * 2654435761L) % 200 }
      .map(_._1)
    val out = run("skew_bounds", capacity = 8, Seq(mixed))
    assert(out.length == 1)
    val u = out.head
    assert(u.n_rows == 200L && u.hot_token == "hot", s"$u")
    assert(u.hot_est >= 60L, s"estimate must not undercount: $u")
    assert(u.hot_est - u.hot_err <= 60L, s"overshoot beyond the bound: $u")
    // share is est/n ≥ true share → the suggested salt never understates
    assert(u.hot_share >= 0.3 && u.suggested_salt >= math.ceil(0.3 * 32).toInt, s"$u")
  }

  test("watched key columns are independent groups") {
    val out = run("skew_groups", capacity = 16, Seq(
      Seq.fill(10)(TokenEvent("user_id", "u1")) ++
        (0 until 10).map(i => TokenEvent("l_suppkey", s"s$i"))))
    val byGroup = out.map(u => u.group -> u).toMap
    assert(byGroup("user_id").hot_token == "u1" && byGroup("user_id").hot_share == 1.0)
    assert(byGroup("l_suppkey").hot_share == 0.1 &&
      byGroup("l_suppkey").suggested_salt == 4) // ⌈0.1·32⌉
  }
}
