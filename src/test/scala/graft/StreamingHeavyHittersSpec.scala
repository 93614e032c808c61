package graft

import graft.streaming.{HeavyHitter, StreamingHeavyHitters, TokenEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Space-saving heavy hitters in MapState: exact when capacity covers the
  * token universe, and the paper's overshoot guarantees when it doesn't. */
class StreamingHeavyHittersSpec extends AnyFunSuite {
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

  /** The latest snapshot per group, reconstructed from the Update-mode
    * sink: the rank-r estimate is non-decreasing across batches (counts
    * only grow; eviction replaces the minimum with minimum+n), so the
    * max-count row at each rank is the most recent batch's. */
  private def lastSnapshot(table: String): Map[String, Seq[HeavyHitter]] = {
    import spark.implicits._
    spark.table(table).as[HeavyHitter].collect().toSeq
      .groupBy(_.group).map { case (g, rows) =>
        g -> rows.groupBy(_.rank).toSeq.sortBy(_._1)
          .map { case (_, atRank) => atRank.maxBy(_.count) }
      }
  }

  test("capacity covering the universe: exact cross-batch counts, zero error") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[TokenEvent]
      val q = StreamingHeavyHitters.topK(stream.toDS(), capacity = 10, k = 3)
        .writeStream.format("memory").queryName("hh_exact")
        .outputMode("update").start()
      try {
        stream.addData(Seq.fill(3)(TokenEvent("g", "a")) ++ Seq.fill(2)(TokenEvent("g", "b")) ++
          Seq(TokenEvent("g", "c")): _*)
        q.processAllAvailable()
        stream.addData(Seq.fill(4)(TokenEvent("g", "b")) ++ Seq.fill(2)(TokenEvent("g", "c")): _*)
        q.processAllAvailable()
      } finally q.stop()
      // final truth: b=6, a=3, c=3 — ties broken by token asc
      assert(lastSnapshot("hh_exact")("g") === Seq(
        HeavyHitter("g", "b", 6L, 0L, 1),
        HeavyHitter("g", "a", 3L, 0L, 2),
        HeavyHitter("g", "c", 3L, 0L, 3)))
    }
  }

  test("over-capacity: eviction inherits the minimum and keeps the paper's bounds") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[TokenEvent]
      val q = StreamingHeavyHitters.topK(stream.toDS(), capacity = 3, k = 2)
        .writeStream.format("memory").queryName("hh_cap")
        .outputMode("update").start()
      try {
        stream.addData(Seq.fill(5)(TokenEvent("g", "a")) ++ Seq.fill(4)(TokenEvent("g", "b")) ++
          Seq.fill(3)(TokenEvent("g", "c")): _*)
        q.processAllAvailable()
        // d is untracked: evicts the minimum (c, 3) and inherits count 3
        stream.addData(Seq.fill(6)(TokenEvent("g", "d")): _*)
        q.processAllAvailable()
      } finally q.stop()
      val snap = lastSnapshot("hh_cap")("g")
      // d: estimate 3+6=9, error 3 → bounds: true 6 ≤ 9 and 9−3 = 6 ≤ 6
      assert(snap === Seq(
        HeavyHitter("g", "d", 9L, 3L, 1),
        HeavyHitter("g", "a", 5L, 0L, 2)))
      val d = snap.head
      assert(d.count >= 6L && d.count - d.error <= 6L, "space-saving overshoot bounds")
    }
  }

  test("MapState reloads across a checkpointed restart") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val ckpt = java.nio.file.Files.createTempDirectory("hh_ckpt").toString
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[HeavyHitter]()
      val stream = MemoryStream[TokenEvent]
      def start() = StreamingHeavyHitters.topK(stream.toDS(), capacity = 10, k = 2)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[HeavyHitter], _: Long) =>
          b.collect().foreach(seen.add)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()

      val q1 = start()
      try {
        stream.addData(TokenEvent("g", "a"), TokenEvent("g", "a"), TokenEvent("g", "b"))
        q1.processAllAvailable()
      } finally q1.stop()

      val q2 = start() // counters must come back from the state store
      try {
        stream.addData(TokenEvent("g", "b"), TokenEvent("g", "b"))
        q2.processAllAvailable()
      } finally q2.stop()

      import scala.jdk.CollectionConverters._
      val last = seen.asScala.toSeq.groupBy(_.rank)
        .map { case (_, rs) => rs.maxBy(_.count) }.toSeq.sortBy(_.rank)
      // a state loss would read b=2 (batch-2 only); continuity reads b=3
      assert(last === Seq(
        HeavyHitter("g", "b", 3L, 0L, 1), HeavyHitter("g", "a", 2L, 0L, 2)))
    }
  }

  test("corpus vocabulary: streamed document tokens match exact batch counts") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, explode, lower, split}
      // real corpus rows: the documents testdata table, tokens keyed by lang
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("lang"), col("text")).limit(200).collect()
        .map(r => (r.getString(0), r.getString(1)))

      val stream = MemoryStream[(String, String)]
      val tokens = stream.toDS().toDF("group", "text")
        .select(col("group"), explode(split(lower(col("text")), "\\s+")).as("token"))
        .filter(col("token") =!= "")
        .as[TokenEvent]
      val q = StreamingHeavyHitters.topK(tokens, capacity = 50000, k = 5)
        .writeStream.format("memory").queryName("hh_vocab")
        .outputMode("update").start()
      try {
        val (half1, half2) = docs.splitAt(docs.length / 2)
        stream.addData(half1.toSeq: _*)
        q.processAllAvailable()
        stream.addData(half2.toSeq: _*)
        q.processAllAvailable()
      } finally q.stop()

      // exact oracle: batch token counts over the same 200 docs
      val exact = docs.toSeq.toDF("group", "text")
        .select(col("group"), explode(split(lower(col("text")), "\\s+")).as("token"))
        .filter(col("token") =!= "")
        .groupBy("group", "token").count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

      val got = lastSnapshot("hh_vocab")
      got.foreach { case (g, snap) =>
        // capacity ≥ vocabulary here, so estimates are EXACT and top-5
        // order must match the true counts (ties token-asc both sides)
        val trueTop = exact.collect { case ((`g`, t), n) => (t, n) }.toSeq
          .sortBy { case (t, n) => (-n, t) }.take(5)
        assert(snap.map(h => (h.token, h.count)) === trueTop, s"group $g")
        assert(snap.forall(_.error == 0L), s"group $g: under capacity, no overshoot")
      }
      assert(got.nonEmpty)
    }
  }

  test("groups are independent: one group's eviction never touches another") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[TokenEvent]
      val q = StreamingHeavyHitters.topK(stream.toDS(), capacity = 2, k = 2)
        .writeStream.format("memory").queryName("hh_groups")
        .outputMode("update").start()
      try {
        stream.addData(
          TokenEvent("x", "a"), TokenEvent("x", "b"),
          TokenEvent("y", "p"), TokenEvent("y", "p"), TokenEvent("y", "q"))
        q.processAllAvailable()
        stream.addData(TokenEvent("x", "zz"), TokenEvent("x", "zz")) // evicts in x only
        q.processAllAvailable()
      } finally q.stop()
      val snaps = lastSnapshot("hh_groups")
      // x: zz evicted min(a,1) → estimate 3, error 1; b stays at 1
      assert(snaps("x") === Seq(
        HeavyHitter("x", "zz", 3L, 1L, 1), HeavyHitter("x", "b", 1L, 0L, 2)))
      // y untouched by x's eviction
      assert(snaps("y") === Seq(
        HeavyHitter("y", "p", 2L, 0L, 1), HeavyHitter("y", "q", 1L, 0L, 2)))
    }
  }
}
