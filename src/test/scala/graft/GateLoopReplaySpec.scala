package graft

import java.nio.file.Files

import graft.streaming.{GateLoop, StreamingDedup}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.streaming.GateLoop]]'s replay contract (the r17 review catch):
  * foreachBatch is at-least-once, and a batch that crashed after its
  * signature append is re-executed with the SAME batchId. Because the
  * classification snapshot excludes the batch's own partition, the
  * replay must reproduce the original statuses and rewrite the identical
  * partition — the failure mode being guarded is the batch reading its
  * OWN signatures, flipping its accepts to exact_dup, and erasing them.
  * Plus the r18 fresh-checkpoint guard (ADVICE r17): a batchId BELOW the
  * table's max means a new checkpoint was attached to an old sigDir —
  * processing would exclude-then-overwrite historical partitions. */
class GateLoopReplaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def attempt(batch: org.apache.spark.sql.DataFrame, id: Long,
                      sigDir: String)(
                      onDeliver: Map[Long, String] => Unit): Unit =
    GateLoop.processBatch(
      batch, batchId = id, sigDir = sigDir,
      sigSchema = StreamingDedup.SigSchema, keyCol = "doc_id",
      classify = StreamingDedup.classify,
      signatureRows = StreamingDedup.signatureRows,
      deliver = (c, _) => onDeliver(
        c.collect().map(r => r.getLong(0) -> r.getString(1)).toMap))

  test("a replayed uncommitted batch reproduces its statuses and keeps its signatures") {
    import spark.implicits._
    val sigDir = Files.createTempDirectory("graft-replay-sigs-").toString
    StreamingDedup.seedSignatures(
      Seq((0L, "seed corpus document body")).toDF("doc_id", "text"), sigDir)
    val batch = Seq((1L, "seed corpus document body"), (2L, "a genuinely fresh doc"))
      .toDF("doc_id", "text")

    var delivered: Map[Long, String] = Map.empty

    def storedHashes(): Long = spark.read
      .schema(StreamingDedup.SigSchema).parquet(sigDir)
      .filter(col("kind") === "h").count()

    attempt(batch, 7L, sigDir)(delivered = _) // "crashed after append": partition written
    val first = delivered
    assert(first === Map(1L -> "exact_dup", 2L -> "new"))
    assert(storedHashes() == 2L) // seed doc 0 + accepted doc 2

    attempt(batch, 7L, sigDir)(delivered = _) // replay, same batchId — must NOT see its own partition
    assert(delivered === first,
      "replay drifted: the batch classified against its own signatures")
    assert(storedHashes() == 2L,
      "replay erased the batch's accepted signatures (empty overwrite)")
  }

  test("a batchId below the table's max is rejected (fresh checkpoint on an old sigDir)") {
    import spark.implicits._
    val sigDir = Files.createTempDirectory("graft-guard-sigs-").toString
    StreamingDedup.seedSignatures(
      Seq((0L, "seed corpus document body")).toDF("doc_id", "text"), sigDir)
    val batch = Seq((1L, "some ingest document")).toDF("doc_id", "text")

    attempt(batch, 5L, sigDir)(_ => ()) // table's max batch is now 5
    val e = intercept[IllegalArgumentException] {
      attempt(batch, 0L, sigDir)(_ => ()) // a NEW checkpoint restarts at 0
    }
    assert(e.getMessage.contains("LATER checkpoint"), e.getMessage)

    // replay of the max batch itself stays legal (the at-least-once case)
    attempt(batch, 5L, sigDir)(_ => ())

    // after compaction (history folded into batch=-1) a fresh checkpoint
    // is the DOCUMENTED re-attach path: batch 0 must be accepted again
    graft.streaming.SignatureCompaction.compact(
      spark, sigDir, StreamingDedup.SigSchema)
    attempt(batch, 0L, sigDir)(_ => ())
  }
}
