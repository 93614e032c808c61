package graft

import graft.streaming.{StreamingTokenDrift, TokenDriftScore, VocabArrival}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, explode, split}
import org.scalatest.funsuite.AnyFunSuite

/** q199's continuous sibling: streamed pane-vs-reference JSD reproduces the
  * batch number bit-for-bit below capacity, hits the ln 2 / 0 identities,
  * pools overflow honestly, re-baselines on relearn, drops late rows. */
class StreamingTokenDriftSpec extends AnyFunSuite {
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

  /** Each inner Seq is one micro-batch; scores come back (group, pane)-sorted. */
  private def run(capacity: Int, relearn: Option[Int], name: String,
                  batches: Seq[Seq[VocabArrival]]): Seq[TokenDriftScore] =
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val stream = MemoryStream[VocabArrival]
      val q = StreamingTokenDrift.driftScores(stream.toDS(), capacity, relearn)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).as[TokenDriftScore].collect().toSeq
        .sortBy(r => (r.group, r.pane))
    }

  test("batch parity: even/odd corpus panes reproduce q199's JSD bit-for-bit") {
    val dir = "/root/testdata/sf0.01"
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), (col("doc_id") % 2).as("pane"),
        explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .collect().map(r => VocabArrival(r.getString(0), r.getLong(1), r.getString(2)))
    val langs = toks.map(_.group).distinct.toSeq
    val got = run(capacity = 100000, relearn = None, "td_parity", Seq(
      toks.filter(_.batch == 0L).toSeq,
      toks.filter(_.batch == 1L).toSeq,
      // pane-2 markers seal pane 1 in every language group
      langs.map(l => VocabArrival(l, 2L, "flush-marker"))))
    val want = SparkEntry.queries("q199_js_divergence")(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got.map(_.group).toSet === want.keySet)
    got.foreach { s =>
      val (nTypes, tokA, tokB, jsd) = want(s.group)
      assert((s.n_types, s.n_ref, s.n_cur, s.jsd) === ((nTypes, tokA, tokB, jsd)),
        s"lang ${s.group}")
      assert(!s.saturated)
    }
  }

  test("identity panes score exactly 0; disjoint panes score exactly ln 2") {
    val got = run(capacity = 10, relearn = None, "td_ident", Seq(
      Seq(VocabArrival("same", 0, "a"), VocabArrival("same", 0, "b"),
        VocabArrival("disj", 0, "a"), VocabArrival("disj", 0, "a")),
      Seq(VocabArrival("same", 1, "a"), VocabArrival("same", 1, "b"),
        VocabArrival("disj", 1, "b")),
      Seq(VocabArrival("same", 2, "x"), VocabArrival("disj", 2, "x"))))
    val byGroup = got.map(s => s.group -> s).toMap
    assert(byGroup("same").jsd === 0.0)
    assert(byGroup("disj").jsd === 0.693147) // round(ln 2, 6)
  }

  test("over capacity: overflow pools into one residual, mass conserved, flagged") {
    val got = run(capacity = 2, relearn = None, "td_cap", Seq(
      Seq(VocabArrival("g", 0, "a"), VocabArrival("g", 0, "a"),
        VocabArrival("g", 0, "b")),
      Seq(VocabArrival("g", 1, "a"), VocabArrival("g", 1, "c"),
        VocabArrival("g", 1, "d")), // d pools (capacity 2: a, c tracked)
      Seq(VocabArrival("g", 2, "x"))))
    val s = got.head
    assert(s.n_ref === 3L && s.n_cur === 3L, "mass conserved through pooling")
    assert(s.n_types === 4L, "a, b, c + one pooled residual")
    assert(s.saturated)
    assert(s.jsd > 0.0 && s.jsd <= 0.693148)
  }

  test("reference map and open pane survive a checkpointed restart") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val ckpt = java.nio.file.Files.createTempDirectory("td_ckpt").toString
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[TokenDriftScore]()
      val stream = MemoryStream[VocabArrival]
      def start() = StreamingTokenDrift.driftScores(stream.toDS(), capacity = 10)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[TokenDriftScore], _: Long) =>
          b.collect().foreach(seen.add)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()

      val q1 = start()
      try {
        // pane 0 (the future reference) and half of pane 1 land before the stop
        stream.addData(VocabArrival("g", 0, "a"), VocabArrival("g", 0, "a"))
        q1.processAllAvailable()
        stream.addData(VocabArrival("g", 1, "a"))
        q1.processAllAvailable()
      } finally q1.stop()

      val q2 = start() // ref map + open-pane counts must come back
      try {
        stream.addData(VocabArrival("g", 1, "b"))
        q2.processAllAvailable()
        stream.addData(VocabArrival("g", 2, "x"))
        q2.processAllAvailable()
      } finally q2.stop()

      import scala.jdk.CollectionConverters._
      val rows = seen.asScala.toSeq
      assert(rows.size === 1)
      // a state loss would read n_ref = 0 (no reference) or n_cur = 1
      // (pane-1 tokens from before the restart forgotten)
      assert(rows.head.pane === 1L && rows.head.n_ref === 2L
        && rows.head.n_cur === 2L, rows.head.toString)
    }
  }

  test("relearn re-baselines AFTER scoring; late rows drop without effect") {
    val got = run(capacity = 10, relearn = Some(1), "td_relearn", Seq(
      Seq(VocabArrival("g", 0, "a"), VocabArrival("g", 0, "a")),
      Seq(VocabArrival("g", 1, "a"), VocabArrival("g", 1, "b")),
      // LATE row for pane 0 after pane 1 opened: must not touch anything
      Seq(VocabArrival("g", 0, "zzz")),
      Seq(VocabArrival("g", 2, "a"), VocabArrival("g", 2, "b")),
      Seq(VocabArrival("g", 3, "x"))))
    assert(got.map(_.pane) === Seq(1L, 2L))
    assert(got(0).jsd > 0.0, "pane 1 scores against the pane-0 reference")
    // with relearn=1 the reference became pane 1, and pane 2 ≡ pane 1
    assert(got(1).jsd === 0.0, "pane 2 scores 0 against the re-learned reference")
    assert(got(0).n_ref === 2L, "the late pane-0 token never landed")
  }
}
