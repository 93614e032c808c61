package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** THE signature-gate micro-batch discipline, in one place — the three
  * ingest gates ([[StreamingDedup]] text, [[StreamingMultimodalGate]]
  * opaque bytes, [[StreamingEmbeddingGate]] vectors) differ only in
  * their signature schema, signature derivation, and classify rule;
  * the tricky part is identical and lives here once:
  *
  *   - the classification snapshot EXCLUDES the current batch's own
  *     `batch=<batchId>` partition (r17 review catch): foreachBatch is
  *     at-least-once, and a replayed batch that crashed after its
  *     signature append would otherwise read its OWN signatures —
  *     every accepted doc flips to `exact_dup`, `accepted` goes empty,
  *     and mode-overwrite ERASES the partition. With the exclusion a
  *     replay recomputes against exactly the pre-batch table, emits the
  *     original statuses, and rewrites the identical partition —
  *     exactly-once state under at-least-once execution;
  *   - statuses are fixed (eager localCheckpoint) BEFORE the signature
  *     append lands, so the two consumers below never recompute;
  *   - accepted (`new`) rows' signatures overwrite `batch=<batchId>`.
  *
  * [[SignatureCompaction.compact]]'s single-writer contract composes:
  * compaction requires a CLEANLY-STOPPED gate (no uncommitted batch),
  * so no replay can ever see its own rows folded into `batch=-1`. */
object GateLoop {

  /** One micro-batch. Exposed (not just the lambda) so the replay
    * contract is directly unit-testable. `sigSchema` is the DATA schema;
    * the `batch` partition column is appended for the exclusion filter
    * and dropped before `classify` sees the snapshot. */
  def processBatch(batch: DataFrame, batchId: Long, sigDir: String,
                   sigSchema: String, keyCol: String,
                   classify: (DataFrame, DataFrame) => DataFrame,
                   signatureRows: DataFrame => DataFrame,
                   deliver: (DataFrame, Long) => Unit): Unit = {
    val spark = batch.sparkSession
    val sigs = spark.read.schema(s"$sigSchema, batch BIGINT").parquet(sigDir)
      .filter(col("batch") =!= batchId)
      .drop("batch")
    val classified = classify(batch, sigs).localCheckpoint(true)
    val accepted = batch.join(
      classified.filter(col("status") === "new").select(col(keyCol)),
      Seq(keyCol), "left_semi")
    signatureRows(accepted).write.mode("overwrite")
      .parquet(s"$sigDir/batch=$batchId")
    deliver(classified, batchId)
  }

  def start(stream: DataFrame, sigDir: String,
            sigSchema: String, keyCol: String,
            classify: (DataFrame, DataFrame) => DataFrame,
            signatureRows: DataFrame => DataFrame,
            deliver: (DataFrame, Long) => Unit,
            checkpointDir: Option[String],
            trigger: Trigger): StreamingQuery = {
    require(stream.isStreaming,
      "stream must be a streaming DataFrame; use the gate's classify() for batch")
    val w: DataStreamWriter[Row] = stream.writeStream.outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, sigDir, sigSchema, keyCol,
          classify, signatureRows, deliver)
      }
    checkpointDir.foreach(d => w.option("checkpointLocation", d))
    w.start()
  }
}
