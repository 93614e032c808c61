package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque payload carried as a binary column + typed metadata. */
final case class Blob(doc_id: Long, payload: Array[Byte], source: String, n_chars: Long)

/** Extracted features for one payload. */
final case class BlobFeatures(doc_id: Long, n_bytes: Int, header_hex: String, width: Int)

/** Multimodal-column plumbing (BASELINE north-star): image/audio/video are
  * opaque `binary` columns with typed metadata; decode / feature-extract
  * runs batch-wise over partitions.
  *
  * No media libraries exist in this container (SURVEY env notes), so the
  * DECODER IS A STUB — a deterministic fake (byte length + header bytes +
  * a metadata-derived "width") standing in where a real image/audio decode
  * would run. What IS real and tested is the Spark-side plumbing this
  * pipeline needs at 100 TB:
  *   - schema: `binary` payload + typed metadata columns, a typed
  *     `Dataset[Blob]` boundary;
  *   - partition-batch execution: `mapPartitions` processes each partition
  *     as one iterator (the JVM analogue of `mapInPandas` batch shape), so
  *     a real decoder would amortize model/codec init once per partition,
  *     not per row;
  *   - narrow plan: decode is per-row, no shuffle; output is columnar and
  *     oracle-checkable because the fake is deterministic.
  */
object Multimodal extends QueryModule {

  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs = Tables(spark, dir, "documents")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        col("source"), col("n_chars"))
      .as[Blob]
    blobs.mapPartitions { it =>
      // STUB decode: a real implementation opens a codec ONCE here, then
      // decodes each payload; this fake derives features deterministically.
      it.map { b =>
        val header = b.payload.take(4).map("%02x".format(_)).mkString
        BlobFeatures(b.doc_id, b.payload.length, header, (b.n_chars % 256).toInt)
      }
    }.toDF()
      .orderBy(col("doc_id"))
  }

  /** The same feature extraction as [[features]] in pure built-in
    * expressions (VERDICT r02 next-round item 7) — the shape to prefer
    * whenever the "decode" is expressible without a codec: every column
    * stays inside WholeStageCodegen (verified by PlanRegressionSpec), the
    * scan prunes to the referenced columns, and there is no iterator
    * boundary at all. q51's `mapPartitions` remains the documented pattern
    * for codec-init-once decoding; this is the fast path for everything
    * else. Adds a payload digest (md5) — the content-addressing step a real
    * media pipeline runs before decode to dedup storage. */
  def featuresExpr(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), col("text").cast("binary").as("payload"), col("n_chars"))
      .select(
        col("doc_id"),
        length(col("payload")).as("n_bytes"),
        lower(hex(substring(col("payload"), 1, 4))).as("header_hex"),
        md5(col("payload")).as("payload_md5"),
        (col("n_chars") % 256).cast("int").as("width"))
      .orderBy(col("doc_id"))

  /** Frame sampling over opaque payloads — the third multimodal verb
    * (decode q51, feature-extract q59, frame-sample here): take a fixed
    * 16-byte "frame" every 64 bytes of payload, one output row per
    * sampled frame. On real video this is the every-Nth-keyframe sampler
    * feeding a vision encoder; the Spark shape is what matters — a
    * generator (posexplode) over per-row slice arithmetic, rows ∝ frames
    * not payload bytes, all inside codegen, no shuffle before the
    * presentation sort. */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .filter(length(col("payload")) >= 16)
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, int(floor((length(payload)-16)/64))), i -> substring(payload, i*64+1, 16))"))
          .as(Seq("frame_idx", "frame")))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        lower(hex(col("frame"))).as("frame_hex"))
      .orderBy(col("doc_id"), col("frame_idx"))

  val queries: Map[String, QueryFn] = Map(
    "q51_multimodal_features" -> features _,
    "q59_multimodal_expr" -> featuresExpr _,
    "q67_multimodal_frames" -> frameSample _
  )

  val oracleSql: Map[String, String] = Map(
    "q51_multimodal_features" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |       lower(hex(encode(substr(text, 1, 4)))) AS header_hex,
        |       CAST(n_chars % 256 AS INT) AS width
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    // md5(text) ≡ Spark's md5(cast(text as binary)): both hash the UTF-8 bytes.
    "q59_multimodal_expr" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |       lower(hex(encode(substr(text, 1, 4)))) AS header_hex,
        |       md5(text) AS payload_md5,
        |       CAST(n_chars % 256 AS INT) AS width
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    "q67_multimodal_frames" ->
      """WITH f AS (
        |  SELECT doc_id,
        |         unnest(range(0,
        |           CAST(floor((octet_length(encode(text)) - 16) / 64.0) AS BIGINT) + 1)) AS frame_idx
        |  FROM documents WHERE doc_id < 50 AND octet_length(encode(text)) >= 16)
        |SELECT f.doc_id, f.frame_idx,
        |       lower(hex(encode(substr(d.text, CAST(f.frame_idx*64 + 1 AS INT), 16)))) AS frame_hex
        |FROM f JOIN documents d ON d.doc_id = f.doc_id
        |ORDER BY f.doc_id, f.frame_idx""".stripMargin
  )
}
