package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Streaming embedding ingest gate — q216's continuous twin, completing
  * the gate family's streaming surface (text: [[StreamingDedup]], opaque
  * bytes: [[StreamingMultimodalGate]], vectors: THIS): each micro-batch
  * of embeddings (`vec_id BIGINT, embedding ARRAY<numeric>`) classifies
  * against a SIGNATURE TABLE ON STORAGE as `exact_dup` (byte-identical
  * vector — array-equality join against stored vectors), `near_dup`
  * (shares a hyperplane bucket — q61's ONE bucket formula via
  * [[Similarity.bucketed]] — and verifies at cosine ≥ τ), or `new`;
  * accepted vectors' signatures append back.
  *
  * State discipline is [[StreamingDedup]]'s verbatim: signatures are
  * parquet (`batch=<id>` partition overwrite → exactly-once under
  * at-least-once replay; restart resumes from the source checkpoint
  * without rescan; batch-internal near-pairs are both `new`). Signature
  * rows carry (bucket, nrm, emb) — the vector itself travels, because
  * BOTH probes need it: exact needs equality, near needs the full dot
  * product (q216's exact-verify rule, unlike the SimHash gate whose
  * 60-bit sketch suffices). At 100 TB the emb column is the same width
  * the corpus already stores; the bucket column keeps the near probe an
  * equi-join. [[SignatureCompaction.compact]] applies unchanged
  * (`SigSchema` below). */
object StreamingEmbeddingGate {

  val SigSchema = "bucket BIGINT, nrm DOUBLE, emb ARRAY<DOUBLE>"

  private def sketch(vecs: DataFrame): DataFrame =
    Similarity.bucketed(vecs, Similarity.DedupPlanes)
      .select(col("vec_id"), col("bucket").cast("long").as("bucket"),
        col("nrm"), col("emb"))

  /** Signature rows for a (static) vector batch. */
  def signatureRows(vecs: DataFrame): DataFrame =
    sketch(vecs).select(col("bucket"), col("nrm"), col("emb")).distinct()

  /** Materialize the corpus seed under `batch=-1`. */
  def seedSignatures(corpus: DataFrame, sigDir: String): Unit =
    signatureRows(corpus).write.mode("overwrite").parquet(s"$sigDir/batch=-1")

  /** Classify `newVecs` against a signature snapshot → (vec_id, status).
    * Precedence exact > near — q216's rule verbatim. */
  def classify(newVecs: DataFrame, sigs: DataFrame,
               tau: Double = 0.999): DataFrame = {
    val n = sketch(newVecs)
    val exactHits = n.select(col("vec_id"), col("emb"))
      .join(sigs.select(col("emb")).distinct(), Seq("emb"), "left_semi")
      .select(col("vec_id")).distinct().withColumn("exact", lit(1))
    val nearHits = n
      .join(sigs.select(col("bucket"), col("nrm").as("ns"),
          col("emb").as("es")).distinct(),
        Seq("bucket"))
      .withColumn("cos_sim",
        round(Similarity.dot(col("emb"), col("es")) / (col("nrm") * col("ns")), 6))
      .filter(col("cos_sim") >= tau)
      .select(col("vec_id")).distinct().withColumn("near", lit(1))
    newVecs.select(col("vec_id"))
      .join(exactHits, Seq("vec_id"), "left_outer")
      .join(nearHits, Seq("vec_id"), "left_outer")
      .withColumn("status",
        when(col("exact").isNotNull, "exact_dup")
          .when(col("near").isNotNull, "near_dup")
          .otherwise("new"))
      .select(col("vec_id"), col("status"))
  }

  /** Start the continuous gate ([[GateLoop]] — one copy of the replay-
    * safe micro-batch discipline; at-least-once `deliver`, exactly-once
    * signature table via own-partition exclusion + overwrite). */
  def start(vecs: DataFrame, sigDir: String,
            deliver: (DataFrame, Long) => Unit,
            checkpointDir: Option[String] = None,
            tau: Double = 0.999,
            trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    GateLoop.start(vecs, sigDir, SigSchema, "vec_id",
      classify(_, _, tau), signatureRows, deliver, checkpointDir, trigger)
}
