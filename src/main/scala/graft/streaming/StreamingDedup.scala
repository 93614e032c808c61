package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Streaming incremental corpus dedup — q79's classifier promoted to a
  * first-class continuous entry point (the reference's own run-forever loop
  * shape, `/root/reference/kinesis.go:99-151`, applied to corpus ingest).
  *
  * Each micro-batch of incoming docs (`doc_id BIGINT, text STRING`, any
  * extra columns pass through) is classified against a SIGNATURE TABLE ON
  * STORAGE as `exact_dup` (content sha-256 seen), `near_dup` (shares a
  * minhash LSH band — [[Dedup.bandRows]], the exact keys batch q79 uses),
  * or `new`; then the accepted (`new`) docs' signatures are appended back.
  * State lives in the parquet table, NOT the state store:
  *   - it survives restarts and is shared/queryable by other jobs;
  *   - it grows on cheap storage — "everything ever seen" needs nothing
  *     bounded, where watermarked in-memory dedup
  *     ([[graft.operators.StreamingBatch]] q33) bounds state by TIME;
  *   - at 100 TB the table is the same pre-materialized signature store the
  *     batch pipeline writes; streaming and nightly jobs dedup against one
  *     source of truth.
  *
  * Crash-safety: appends are CHECKPOINT-SHAPED — each batch writes its
  * signatures to the partition directory `batch=<batchId>` with
  * mode=overwrite, so a replayed micro-batch (foreachBatch is
  * at-least-once) overwrites its own partition instead of double-appending:
  * the signature table is exactly-once even though delivery is not. A
  * restarted query resumes from the source checkpoint — already-processed
  * batches are NOT re-read (restart-without-rescan), and their signatures
  * are already in the table.
  *
  * Ordering within a batch: all docs classify against the table as of the
  * batch START (a batch-internal duplicate pair is both `new`, exactly like
  * batch q79 classifying one day's docs against yesterday's corpus); the
  * NEXT batch sees both rows' signatures. Callers wanting batch-internal
  * uniqueness pick min doc_id per hash downstream.
  */
object StreamingDedup {

  /** Signature rows for a (static) doc batch: one `("h", sha256)` row per
    * doc plus one `("band", key)` row per LSH band. One unified table keeps
    * the exact and near checks in one scan/join. */
  def signatureRows(docs: DataFrame): DataFrame =
    docs.select(lit("h").as("kind"), sha2(col("text"), 256).as("sig"))
      .union(Dedup.bandRows(docs).select(lit("band").as("kind"), col("band").as("sig")))
      .distinct()

  /** Materialize the corpus seed — the "existing corpus" the stream dedups
    * against. Partition `batch=-1` so seed and per-batch appends share one
    * partitioned table. */
  def seedSignatures(corpus: DataFrame, sigDir: String): Unit =
    signatureRows(corpus).write.mode("overwrite").parquet(s"$sigDir/batch=-1")

  /** Classify `newDocs` against a signature snapshot → (doc_id, status).
    * Both checks are left-semi joins on uniform hash keys: the (small) new
    * batch drives the cost; the signature side reduces to its distinct
    * keys before the join. Plan-identical to batch q79's corpus checks. */
  def classify(newDocs: DataFrame, sigs: DataFrame): DataFrame = {
    val exactHits = newDocs.select(col("doc_id"), sha2(col("text"), 256).as("sig"))
      .join(sigs.filter(col("kind") === "h").select(col("sig")).distinct(),
        Seq("sig"), "left_semi")
      .select(col("doc_id")).distinct().withColumn("exact", lit(1))
    val nearHits = Dedup.bandRows(newDocs).select(col("doc_id"), col("band").as("sig"))
      .join(sigs.filter(col("kind") === "band").select(col("sig")).distinct(),
        Seq("sig"), "left_semi")
      .select(col("doc_id")).distinct().withColumn("near", lit(1))
    newDocs.select(col("doc_id"))
      .join(exactHits, Seq("doc_id"), "left_outer")
      .join(nearHits, Seq("doc_id"), "left_outer")
      .withColumn("status",
        when(col("exact").isNotNull, "exact_dup")
          .when(col("near").isNotNull, "near_dup")
          .otherwise("new"))
      .select(col("doc_id"), col("status"))
  }

  /** Start the continuous dedup ([[GateLoop]] — one copy of the replay-
    * safe micro-batch discipline for all three gates). `deliver`
    * receives each batch's (doc_id, status) — write it to a sink table,
    * route accepted docs on, etc. (at-least-once; the signature table
    * stays exactly-once via the loop's own-partition exclusion +
    * overwrite — a replayed uncommitted batch would otherwise read its
    * OWN signatures, flip its accepts to exact_dup, and erase them). */
  def start(docs: DataFrame, sigDir: String,
            deliver: (DataFrame, Long) => Unit,
            checkpointDir: Option[String] = None,
            trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    GateLoop.start(docs, sigDir, "kind STRING, sig STRING", "doc_id",
      classify, signatureRows, deliver, checkpointDir, trigger)
}
