package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming corpus ingestion — the training-data pipeline ops composed in
  * Structured Streaming: quality gate (narrow per-row score, same formula
  * family as q48) → content-hash dedup bounded by a watermark. This is the
  * forever-runnable form of the batch q40/q48 pipeline: per-row transforms
  * stream as-is, and the only stateful op (dedup) evicts by watermark, so
  * state is bounded by the dedup window — the shape a 100 TB/day crawl
  * ingest needs (plain dropDuplicates would accumulate every content hash
  * ever seen). */
class StreamingCorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("quality gate + watermarked content dedup over a document stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, String, Timestamp)]
    val docs = stream.toDS().toDF("doc_id", "text", "ingest_ts")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("toks")))
      .withColumn("uniq_ratio",
        size(array_distinct(col("toks"))).cast("double") / col("n_tok"))
      // quality gate: long enough AND not degenerate repetition
      .filter(col("n_tok") >= 5 && col("uniq_ratio") >= 0.5)
      .withColumn("content_hash", sha2(col("text"), 256))
      .withWatermark("ingest_ts", "10 seconds")
      .dropDuplicatesWithinWatermark("content_hash")
      .select("doc_id", "n_tok")
    val q = docs.writeStream.format("memory").queryName("corpus_out")
      .outputMode("append").start()
    try {
      stream.addData(
        (1L, "a solid document with plenty of distinct words", ts(1000)),
        (2L, "spam spam spam spam spam spam", ts(1000)), // uniq_ratio 1/6
        (3L, "too short", ts(1000)))
      q.processAllAvailable()
      stream.addData(
        (4L, "a solid document with plenty of distinct words", ts(1005)), // dup of 1
        (5L, "another quite different acceptable training document here", ts(1005)))
      q.processAllAvailable()
      stream.addData((6L, "late flush marker document with enough words", ts(1100)))
      q.processAllAvailable()
    } finally q.stop()

    val ids = spark.table("corpus_out").collect().map(_.getLong(0)).sorted.toSeq
    // 2 (repetitive) and 3 (short) fail the gate; 4 is a within-window dup of 1
    assert(ids == Seq(1L, 5L, 6L))
  }
}
