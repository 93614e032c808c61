package graft

import graft.streaming.{StreamingVocabNovelty, VocabArrival, VocabNoveltyRow}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, explode, expr, split}
import org.scalatest.funsuite.AnyFunSuite

/** q200's continuous twin: per-token first-seen state with the capacity
  * discipline — exact batch parity below capacity on the real corpus,
  * honest upper-bound mode above it, state across restarts. */
class StreamingVocabNoveltySpec extends AnyFunSuite {
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

  test("batch parity below capacity: the streamed curve equals q200 on sf0.01") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val dir = "/root/testdata/sf0.01"
      // the exact token stream q200 sees: batch = doc_id div 50, all
      // tokens (the processor dedupes per batch), delivered batch-aligned
      val arrivals = spark.read.parquet(s"$dir/documents.parquet")
        .select(expr("doc_id div 50").as("batch"),
          explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .collect().map(r => VocabArrival("corpus", r.getLong(0), r.getString(1)))
        .groupBy(_.batch).toSeq.sortBy(_._1)

      val stream = MemoryStream[VocabArrival]
      val q = StreamingVocabNovelty.curve(stream.toDS(), capacity = 100000)
        .writeStream.format("memory").queryName("vn_parity")
        .outputMode("update").start()
      try {
        arrivals.foreach { case (_, rows) =>
          stream.addData(rows.toSeq: _*)
          q.processAllAvailable()
        }
      } finally q.stop()

      val got = spark.table("vn_parity").as[VocabNoveltyRow].collect().toSeq
        .sortBy(_.batch).map(r => (r.batch, r.n_types, r.n_new, r.cum_vocab))
      val want = SparkEntry.queries("q200_vocab_novelty")(spark, dir)
        .collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got === want)
      assert(spark.table("vn_parity").as[VocabNoveltyRow].collect()
        .forall(!_.saturated))
    }
  }

  test("capacity bound: saturation flagged, counts become honest upper bounds") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[VocabArrival]
      val q = StreamingVocabNovelty.curve(stream.toDS(), capacity = 3)
        .writeStream.format("memory").queryName("vn_cap")
        .outputMode("update").start()
      try {
        // batch 0 fills capacity exactly; batch 1 in the SAME micro-batch
        // overflows with d (counted once — overlay) and re-sees a (not new)
        stream.addData(
          VocabArrival("g", 0, "a"), VocabArrival("g", 0, "b"), VocabArrival("g", 0, "c"),
          VocabArrival("g", 1, "a"), VocabArrival("g", 1, "d"), VocabArrival("g", 1, "d"))
        q.processAllAvailable()
        // a LATER micro-batch re-delivers d: untracked, so it re-counts —
        // the documented overcount of the saturated mode
        stream.addData(VocabArrival("g", 2, "d"))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("vn_cap").as[VocabNoveltyRow].collect().toSeq
        .sortBy(_.batch)
      assert(rows(0) === VocabNoveltyRow("g", 0, 3, 3, 3, true))
      assert(rows(1) === VocabNoveltyRow("g", 1, 2, 1, 4, true))
      assert(rows(2) === VocabNoveltyRow("g", 2, 1, 1, 5, true))
    }
  }

  test("below capacity a re-seen token is never new; groups are independent") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[VocabArrival]
      val q = StreamingVocabNovelty.curve(stream.toDS(), capacity = 10)
        .writeStream.format("memory").queryName("vn_groups")
        .outputMode("update").start()
      try {
        stream.addData(VocabArrival("x", 0, "a"), VocabArrival("y", 0, "a"))
        q.processAllAvailable()
        stream.addData(VocabArrival("x", 1, "a"), VocabArrival("x", 1, "b"),
          VocabArrival("y", 1, "p"))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("vn_groups").as[VocabNoveltyRow].collect().toSeq
      assert(rows.toSet === Set(
        VocabNoveltyRow("x", 0, 1, 1, 1, false),
        VocabNoveltyRow("y", 0, 1, 1, 1, false),
        VocabNoveltyRow("x", 1, 2, 1, 2, false),
        VocabNoveltyRow("y", 1, 1, 1, 2, false)))
    }
  }

  test("first-seen state survives a checkpointed restart") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val ckpt = java.nio.file.Files.createTempDirectory("vn_ckpt").toString
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[VocabNoveltyRow]()
      val stream = MemoryStream[VocabArrival]
      def start() = StreamingVocabNovelty.curve(stream.toDS(), capacity = 10)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[VocabNoveltyRow], _: Long) =>
          b.collect().foreach(seen.add)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()

      val q1 = start()
      try {
        stream.addData(VocabArrival("g", 0, "a"), VocabArrival("g", 0, "b"))
        q1.processAllAvailable()
      } finally q1.stop()

      val q2 = start() // first-seen map must come back from the state store
      try {
        stream.addData(VocabArrival("g", 1, "a"), VocabArrival("g", 1, "c"))
        q2.processAllAvailable()
      } finally q2.stop()

      import scala.jdk.CollectionConverters._
      val rows = seen.asScala.toSeq.sortBy(_.batch)
      // state loss would read a as new again (n_new = 2, cum = 4)
      assert(rows === Seq(
        VocabNoveltyRow("g", 0, 2, 2, 2, false),
        VocabNoveltyRow("g", 1, 2, 1, 3, false)))
    }
  }
}
