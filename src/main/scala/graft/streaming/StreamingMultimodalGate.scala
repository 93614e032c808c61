package graft.streaming

import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Streaming multimodal ingest gate — q208's continuous twin (VERDICT r16
  * #4): each micro-batch of opaque payloads (`doc_id BIGINT, payload
  * BINARY`, extra columns pass through) is classified against a SIGNATURE
  * TABLE ON STORAGE as `exact_dup` (payload md5 seen), `near_dup` (shares
  * a high-16-bit SimHash band with a seen sketch AND verifies at
  * `bit_count(xor) ≤ maxHamming` — exactly batch q208's candidate+verify
  * rule on the [[Multimodal.byteSimhashSketch]] 60-bit byte sketch), or
  * `new`; accepted (`new`) payloads' signatures append back. Image/audio
  * payloads get the same exact/near/new gate text ingest already has
  * ([[StreamingDedup]]), WITHOUT decoding.
  *
  * The state discipline is [[StreamingDedup]]'s verbatim — state is the
  * parquet signature table, not the state store, because "everything ever
  * seen" wants unbounded cheap storage shared with the nightly batch jobs:
  *   - appends are CHECKPOINT-SHAPED: each batch overwrites its own
  *     `batch=<batchId>` partition, so an at-least-once foreachBatch replay
  *     cannot double-append — the table is exactly-once;
  *   - a restarted query resumes from the source checkpoint: processed
  *     batches are NOT re-read (restart-without-rescan) and their
  *     signatures are already on storage;
  *   - docs classify against the table as of batch START (batch-internal
  *     near-pairs are both `new`, exactly like q208 run over one ingest
  *     day) — the NEXT batch sees their signatures.
  *
  * Signature rows carry (kind, sig, simhash): one `("h", md5_hex, null)`
  * per payload and one `("sh", band, sketch)` per sketchable payload
  * (≥ 8 bytes — shorter blobs still exact-dedup by md5 but have no near
  * check, q208's own filter). The near probe is an EQUI-join on the band
  * (the q52 discipline — never all-pairs) followed by the Hamming verify;
  * per batch it costs the batch sketch scan plus a join whose build side
  * is the band-distinct signature table. */
object StreamingMultimodalGate {

  /** Signature table DATA schema (the `pb`/`batch` partition columns are
    * [[GateLoop]]'s) — pinned so empty seeds/partitions read. `src` is
    * the provenance owner (VERDICT r17 #3). */
  val SigSchema = "kind STRING, sig STRING, simhash BIGINT, src BIGINT"

  /** The multimodal gate's typed identity (SURVEY §7.9 r19 #1) — the
    * probe bucket hashes (kind, sig) only, never the sketch: the near
    * probe joins on the band alone. `classify` at the default
    * `maxHamming`; a caller tuning the verify threshold builds its own
    * descriptor copy. */
  val descriptor: GateDescriptor = GateDescriptor(
    name = "multimodal",
    sigSchema = SigSchema,
    keyCol = "doc_id",
    pbKeyCols = Seq("kind", "sig"),
    payloadCols = Seq("payload"),
    dataRows = Multimodal.gateSignatureData,
    classify = Multimodal.gateClassify(_, _, 12))

  /** Signature rows for a (static) blob batch — the batch rule verbatim
    * ([[Multimodal.gateSignatureRows]]; one rule, two consumers). */
  def signatureRows(blobs: DataFrame): DataFrame =
    Multimodal.gateSignatureRows(blobs)

  /** Materialize the corpus seed under `batch=-1` (shares the partitioned
    * table — `pb` sub-partitioning included — with per-batch appends). */
  def seedSignatures(corpus: DataFrame, sigDir: String): Unit =
    signatureRows(corpus).write.mode("overwrite")
      .partitionBy("pb").parquet(s"$sigDir/batch=-1")

  /** Classify `newBlobs` against a signature snapshot → the gate
    * family's shared provenance frame `(doc_id, status, matched_seed,
    * score)` — the batch rule verbatim ([[Multimodal.gateClassify]],
    * whose status readout is the oracle-checked q212 and whose arg-min
    * provenance is q214's): exact > near precedence, distinct-reduced
    * joins driven by the (small) batch side; score = Hamming distance
    * (0.0 for exact by definition). */
  def classify(newBlobs: DataFrame, sigs: DataFrame,
               maxHamming: Int = 12): DataFrame =
    Multimodal.gateClassify(newBlobs, sigs, maxHamming)

  /** Start the continuous gate ([[GateLoop]] — one copy of the replay-
    * safe, probe-pruned micro-batch discipline). `deliver` receives each
    * batch's provenance frame, at-least-once; the signature table stays
    * exactly-once via the loop's own-partition exclusion + overwrite. */
  def start(blobs: DataFrame, sigDir: String,
            deliver: (DataFrame, Long) => Unit,
            checkpointDir: Option[String] = None,
            maxHamming: Int = 12,
            trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    GateLoop.start(blobs, sigDir, SigSchema, "doc_id",
      classify(_, _, maxHamming), signatureRows, deliver, checkpointDir, trigger)
}
