package graft

import java.nio.file.Files

import graft.streaming.{GateTable, JointTables, StreamingDedup,
  StreamingEmbeddingGate}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** [[JointTables]] — the joint gate's table pair as one maintenance
  * unit: every pair op refuses on batch-set misalignment (the
  * crash-between-appends state only a gate replay may repair) and
  * sequences both tables inside one window otherwise. */
class JointTablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pair(): JointTables = JointTables(
    GateTable(StreamingDedup.descriptor,
      Files.createTempDirectory("graft-jt-text-").toString),
    GateTable(StreamingEmbeddingGate.descriptor,
      Files.createTempDirectory("graft-jt-vec-").toString))

  private def items(rows: (Long, String, Array[Double])*): DataFrame =
    rows.toSeq.toDF("doc_id", "text", "embedding")

  private val eA = Array(1.0, 2.0, -1.0, 0.5)
  private val eB = Array(-3.0, 0.25, 4.0, 1.0)
  private val eC = Array(0.1, -0.2, 0.3, 9.0)
  private val eD = Array(5.0, 5.0, -5.0, 0.0)

  private def frameSet(df: DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSet

  test("pair seed slices one item frame per descriptor, and maintenance " +
      "ops preserve joint classification across compact/fold/resize") {
    val jt = pair()
    jt.seed(items((0L, "seed corpus document body", eA)))
    var frames = Map.empty[Long, Set[(Long, String, String, String)]]
    jt.processBatch(items((1L, "first fresh document body", eB)), 0L,
      (f, i) => frames += i -> frameSet(f))
    assert(frames(0L) === Set((1L, "new", "new", "new")))

    // the probe whose answer must survive every maintenance op: 2 dups
    // the seed text, 3 dups batch-0's accepted embedding, 4 fresh
    val probe = items(
      (2L, "seed corpus document body", eC),
      (3L, "completely different words", eB),
      (4L, "another genuinely new doc", eC))
    def classifyProbe(): Set[(Long, String, String, String)] =
      frameSet(graft.streaming.StreamingJointGate.compose(
        jt.text.classifyNow(jt.text.desc.sliceOf(probe, "doc_id")),
        jt.vec.classifyNow(jt.vec.desc.sliceOf(probe, "doc_id")),
        jt.text.desc.keyCol, jt.vec.desc.keyCol))
    val before = classifyProbe()
    assert(before === Set(
      (2L, "exact_dup", "new", "exact_dup"),
      (3L, "new", "exact_dup", "exact_dup"),
      (4L, "new", "new", "new")))

    assert(jt.compact(spark) === (1, 1))
    assert(classifyProbe() === before)
    jt.processBatch(items((5L, "yet another new document", eC)), 1L,
      (_, _) => ())
    jt.processBatch(items((6L, "and one more fresh document", eD)), 2L,
      (_, _) => ())
    // keepLast = 1: batch 1 folds into the seed, batch 2 (replayable) stays
    assert(jt.foldHistory(spark, keepLast = 1) === (Seq(1L), Seq(1L)))
    val afterFold = classifyProbe()
    assert(afterFold !== before) // eC accepted in batch 1
    jt.resize(spark, textBuckets = 8, vecBuckets = 4)
    assert(jt.text.buckets === 8 && jt.vec.buckets === 4)
    assert(classifyProbe() === afterFold)
  }

  test("a batch-misaligned pair (crash between the two appends) refuses " +
      "maintenance until the gate's replay reconverges it") {
    val jt = pair()
    jt.seed(items((0L, "seed corpus document body", eA)))
    jt.processBatch(items((1L, "first fresh document body", eB)), 0L,
      (_, _) => ())
    // simulate the crash: batch 1 lands on the TEXT table only
    jt.text.processBatch(
      Seq((2L, "completely different words")).toDF("doc_id", "text"),
      1L, (_, _) => ())
    val e = intercept[IllegalArgumentException] { jt.compact(spark) }
    assert(e.getMessage.contains("batch-misaligned"))
    assert(intercept[IllegalArgumentException] {
      jt.foldHistory(spark, keepLast = 0)
    }.getMessage.contains("batch-misaligned"))
    assert(intercept[IllegalArgumentException] {
      jt.resize(spark, 8, 8)
    }.getMessage.contains("batch-misaligned"))
    // the gate's replay of batch 1 (at-least-once) reconverges the pair...
    jt.processBatch(items((2L, "completely different words", eC)), 1L,
      (_, _) => ())
    // ...and the same maintenance op now runs over both tables
    assert(jt.compact(spark) === (2, 2))
  }

  test("a crash between the two per-table MAINTENANCE halves is not a " +
      "wedge: re-running the same pair op converges the pair (review catch)") {
    val jt = pair()
    jt.seed(items((0L, "seed corpus document body", eA)))
    jt.processBatch(items((1L, "first fresh document body", eB)), 0L, (_, _) => ())
    jt.processBatch(items((2L, "second fresh document here", eC)), 1L, (_, _) => ())
    jt.processBatch(items((3L, "third fresh document text", eD)), 2L, (_, _) => ())
    // crash after the TEXT half of jt.foldHistory(keepLast = 1)
    jt.text.foldHistory(spark, keepLast = 1)
    // older batches differ (text {2}, vec {0,1,2}) — NOT the append-crash
    // state, and no replay could re-create text's folded dirs: the re-run
    // of the SAME op proceeds and the lagging vector table catches up
    assert(jt.foldHistory(spark, keepLast = 1) === (Seq(), Seq(0L, 1L)))
    assert(graft.streaming.GateLoop.batchIds(jt.text.sigDir).filter(_ >= 0).sorted
      === graft.streaming.GateLoop.batchIds(jt.vec.sigDir).filter(_ >= 0).sorted)
    // classification survived the whole dance: all three accepts probed
    val probe = items((9L, "second fresh document here", eD))
    val frame = graft.streaming.StreamingJointGate.compose(
      jt.text.classifyNow(jt.text.desc.sliceOf(probe, "doc_id")),
      jt.vec.classifyNow(jt.vec.desc.sliceOf(probe, "doc_id")))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(frame === Seq(("exact_dup", "exact_dup")))
    // A half-completed pair COMPACT is different: compact folds the NEWEST
    // batch id away on the finished side, and (ADVICE r19) that state is
    // indistinguishable by batch sets from older maintenance drift PLUS a
    // crash between the two appends of the newest batch — where proceeding
    // would fold a half-appended batch into one side permanently. So the
    // guard stays conservatively refused until the newest id re-aligns:
    // the next joint batch through the gate lands on both sides, after
    // which the re-run of the pair compact converges the older drift.
    jt.processBatch(items((4L, "fourth fresh document body", eB)), 3L, (_, _) => ())
    jt.processBatch(items((5L, "fifth and final document", eA)), 4L, (_, _) => ())
    jt.text.compact(spark) // the crash: text half done, vec untouched
    assert(intercept[IllegalArgumentException] {
      jt.compact(spark)
    }.getMessage.contains("batch-misaligned"))
    jt.processBatch(items((6L, "one more to realign them", eC)), 5L, (_, _) => ())
    // text folds its one live batch {5}; vec catches up folding {2,3,4,5}
    assert(jt.compact(spark) === (1, 4))
  }

  test("COMPOUND misalignment — older maintenance drift PLUS a half-appended " +
      "newest batch — still refuses until the gate replay lands (ADVICE r19)") {
    val jt = pair()
    jt.seed(items((0L, "seed corpus document body", eA)))
    jt.processBatch(items((1L, "first fresh document body", eB)), 0L, (_, _) => ())
    jt.processBatch(items((2L, "second fresh document here", eC)), 1L, (_, _) => ())
    jt.processBatch(items((3L, "third fresh document text", eD)), 2L, (_, _) => ())
    // half-completed pair maintenance: only the TEXT half folded (older drift)
    jt.text.foldHistory(spark, keepLast = 1)
    // ...PLUS a crash between the pair's two appends of batch 3 (text only):
    // diff is now {0,1,3} — the old guard (diff == Set(newest)) PASSED this
    // state and folded the half-appended batch 3 into text permanently
    jt.text.processBatch(
      Seq((4L, "fourth fresh document body")).toDF("doc_id", "text"),
      3L, (_, _) => ())
    assert(intercept[IllegalArgumentException] {
      jt.foldHistory(spark, keepLast = 1)
    }.getMessage.contains("batch-misaligned"))
    // the gate replay reconverges the NEWEST id on both tables...
    jt.processBatch(items((4L, "fourth fresh document body", eB)), 3L, (_, _) => ())
    // ...after which only older maintenance drift remains and the re-run of
    // the SAME pair op converges it (text already folded {0,1}; vec catches up)
    assert(jt.foldHistory(spark, keepLast = 1) === (Seq(2L), Seq(0L, 1L, 2L)))
    assert(graft.streaming.GateLoop.batchIds(jt.text.sigDir).filter(_ >= 0).sorted
      === graft.streaming.GateLoop.batchIds(jt.vec.sigDir).filter(_ >= 0).sorted)
  }

  test("pair seed validates BOTH tables before either destructive write " +
      "(review catch: the text seed must survive the vector guard's refusal)") {
    import spark.implicits._
    val jt = pair()
    // vector table pre-seeded; text table fresh
    jt.vec.seed(Seq((0L, eA)).toDF("vec_id", "embedding"))
    val e = intercept[IllegalArgumentException] {
      jt.seed(items((5L, "a replacement corpus", eB)))
    }
    assert(e.getMessage.contains("replace = true"))
    // the refusal happened BEFORE any write: text is still unseeded
    assert(graft.streaming.GateLoop.batchIds(jt.text.sigDir).isEmpty)
    // and the confirmed pair seed then replaces both
    jt.seed(items((5L, "a replacement corpus", eB)), replace = true)
    assert(graft.streaming.GateLoop.batchIds(jt.text.sigDir) === Seq(-1L))
    assert(graft.streaming.GateLoop.batchIds(jt.vec.sigDir) === Seq(-1L))
  }
}
