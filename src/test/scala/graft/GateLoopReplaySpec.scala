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
  * OWN signatures, flipping its accepts to exact_dup, and erasing them. */
class GateLoopReplaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("a replayed uncommitted batch reproduces its statuses and keeps its signatures") {
    import spark.implicits._
    val sigDir = Files.createTempDirectory("graft-replay-sigs-").toString
    StreamingDedup.seedSignatures(
      Seq((0L, "seed corpus document body")).toDF("doc_id", "text"), sigDir)
    val batch = Seq((1L, "seed corpus document body"), (2L, "a genuinely fresh doc"))
      .toDF("doc_id", "text")

    var delivered: Map[Long, String] = Map.empty
    def attempt(): Unit = GateLoop.processBatch(
      batch, batchId = 7L, sigDir = sigDir,
      sigSchema = "kind STRING, sig STRING", keyCol = "doc_id",
      classify = StreamingDedup.classify,
      signatureRows = StreamingDedup.signatureRows,
      deliver = (c, _) => delivered =
        c.collect().map(r => r.getLong(0) -> r.getString(1)).toMap)

    def storedHashes(): Long = spark.read
      .schema("kind STRING, sig STRING").parquet(sigDir)
      .filter(col("kind") === "h").count()

    attempt() // the "crashed after append" attempt: partition written
    val first = delivered
    assert(first === Map(1L -> "exact_dup", 2L -> "new"))
    assert(storedHashes() == 2L) // seed doc 0 + accepted doc 2

    attempt() // the replay, same batchId — must NOT see its own partition
    assert(delivered === first,
      "replay drifted: the batch classified against its own signatures")
    assert(storedHashes() == 2L,
      "replay erased the batch's accepted signatures (empty overwrite)")
  }
}
