package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 source for remote-write POST bodies — the "proper" Spark-native
  * answer to the reference's HTTP entry point (`/root/reference/main.go:61`,
  * `kinesis.go:68-93`) that SURVEY §2.1 planned and rounds 1-3 stood in for
  * with the generic binaryFile stream.
  *
  * Protocol (same directory convention as [[RemoteWrite.bodyDirStream]]): a
  * tiny HTTP frontend appends each received POST body as one file whose name
  * is a monotonically increasing sequence id (e.g. zero-padded counter or
  * timestamp). This source's streaming offset IS the received-body sequence
  * number: offset N = "the first N files in name order". That makes offsets
  *   - exactly replayable: any [start, end) range always maps to the same
  *     bodies (files are append-only, names monotonic — the same contract
  *     Kafka offsets or the reference's implicit channel ordering rely on);
  *   - checkpointable: the offset serializes as the plain number, so a
  *     restarted query resumes at the first unprocessed body
  *     (improving on the reference's lossy SIGTERM path, `main.go:114-119`).
  *
  * Admission control: `maxFilesPerTrigger` bounds each micro-batch — the
  * backpressure knob standing in for the reference's bounded channel
  * (`kinesis.go:21,60`). Unlike the binaryFile source, there is no
  * seen-files map on the driver: state is one long plus the name of the
  * last admitted file (the high-water mark that makes the index→file
  * mapping verifiable on replay). At 1000-executor scale
  * the per-batch file slice is split into `filesPerPartition` groups, so
  * read parallelism follows batch size instead of pinning to the driver.
  *
  * Schema: `seq BIGINT, path STRING, body BINARY` — `body` feeds
  * [[RemoteWrite.fromBodies]]; `seq` gives downstream operators a total
  * arrival order the binaryFile source cannot provide.
  */
object BodyStream {
  val schema: StructType = StructType.fromDDL("seq BIGINT, path STRING, body BINARY")

  /** Stable listing: regular files, hidden/temp (`.`/`_` prefix) excluded,
    * name order. The frontend writes to a dot-prefixed temp name and
    * renames into place, so partially-written bodies are never listed. */
  def list(dir: String): Vector[String] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) Vector.empty
    else {
      val s = Files.list(d)
      try s.iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(_.getFileName.toString)
        .filterNot(n => n.startsWith(".") || n.startsWith("_"))
        .toVector.sorted
      finally s.close()
    }
  }

  /** Cheap body count (no sort, no Vector) — used only to pin the
    * Trigger.AvailableNow fence, where an exact name boundary is not
    * needed. Offset admission itself ([[BodyMicroBatchStream.latestOffset]])
    * uses the sorted [[list]]: it must name the high-water-mark file so the
    * committed offset can be validated against later listings. */
  def count(dir: String): Long = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) 0L
    else {
      val s = Files.list(d)
      try s.iterator().asScala.count { p =>
        val n = p.getFileName.toString
        Files.isRegularFile(p) && !n.startsWith(".") && !n.startsWith("_")
      }.toLong
      finally s.close()
    }
  }

  case class BodyPartition(dir: String, files: Seq[(Long, String)]) extends InputPartition

  def partitions(dir: String, files: Seq[String], baseSeq: Long,
                 filesPerPartition: Int): Array[InputPartition] =
    files.zipWithIndex
      .map { case (f, i) => (baseSeq + i, f) }
      .grouped(math.max(1, filesPerPartition))
      .map(g => BodyPartition(dir, g): InputPartition)
      .toArray

  /** Fail-loud offset-contract check: an offset of N is only meaningful if
    * the first N files of today's listing are the same N files that were
    * admitted when the offset was committed. The recorded high-water mark
    * (name of file N-1) detects both hazards silently re-mapping a
    * committed range to different bodies:
    *   - a writer violating name monotonicity (unpadded counters: "10"
    *     sorts before "9", shifting every index after insertion);
    *   - external deletion/compaction of processed files (listing shrinks,
    *     every index re-maps).
    * Legacy plain-number offsets (pre-hwm checkpoints) carry an empty hwm
    * and get the length check only. */
  def validateBoundary(listing: Vector[String], off: BodySeqOffset, dir: String): Unit = {
    if (listing.length < off.seq) throw new IllegalStateException(
      s"remote-write-bodies: directory `$dir` lists ${listing.length} bodies but " +
        s"offset ${off.seq} is committed — files were deleted or compacted. " +
        "The body directory must be append-only while a checkpoint references it; " +
        "to archive processed bodies, stop the query and reset the checkpoint.")
    if (off.seq > 0 && off.hwm.nonEmpty) {
      val at = listing(Math.toIntExact(off.seq) - 1)
      if (at != off.hwm) throw new IllegalStateException(
        s"remote-write-bodies: committed offset ${off.seq} expects `${off.hwm}` at " +
          s"position ${off.seq - 1} of the name-ordered listing of `$dir` but found " +
          s"`$at` — a new file sorted before the high-water mark (non-monotonic " +
          "names, e.g. unpadded counters) or a processed file was removed. " +
          "Refusing to replay a re-mapped range.")
    }
  }

  /** One task = one file group; each file is read whole, exactly like the
    * reference's `io.ReadAll(r.Body)` (`kinesis.go:69`). */
  object ReaderFactory extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val bp = partition.asInstanceOf[BodyPartition]
      new PartitionReader[InternalRow] {
        private val it = bp.files.iterator
        private var row: InternalRow = _
        override def next(): Boolean = it.hasNext && {
          val (seq, name) = it.next()
          val full = Paths.get(bp.dir, name)
          row = InternalRow(seq, UTF8String.fromString(full.toString),
            Files.readAllBytes(full))
          true
        }
        override def get(): InternalRow = row
        override def close(): Unit = ()
      }
    }
  }
}

/** `spark.readStream.format("remote-write-bodies").load(dir)` — registered
  * via META-INF/services (DataSourceRegister). */
class BodyStreamProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "remote-write-bodies"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = BodyStream.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    // Spark convention for fixed-schema sources: reject a user-supplied
    // schema that differs instead of silently serving different columns.
    if (schema != null && schema != BodyStream.schema)
      throw new IllegalArgumentException(
        s"remote-write-bodies serves a fixed schema `${BodyStream.schema.toDDL}`; " +
          s"a user-specified schema is not supported (got `${schema.toDDL}`)")
    val opts = new CaseInsensitiveStringMap(properties)
    new BodyTable(
      Option(opts.get("path")).getOrElse(
        throw new IllegalArgumentException("remote-write-bodies: .load(dir) path required")),
      opts.getInt("maxFilesPerTrigger", 1000),
      opts.getInt("filesPerPartition", 100))
  }
}

class BodyTable(dir: String, maxFilesPerTrigger: Int, filesPerPartition: Int)
    extends Table with SupportsRead {
  override def name(): String = s"remote-write-bodies(`$dir`)"
  override def schema(): StructType = BodyStream.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new BodyScan(dir, maxFilesPerTrigger, filesPerPartition)
    }
}

class BodyScan(dir: String, maxFilesPerTrigger: Int, filesPerPartition: Int) extends Scan {
  override def readSchema(): StructType = BodyStream.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new BodyMicroBatchStream(dir, maxFilesPerTrigger, filesPerPartition)
  /** Batch read of everything currently in the directory — lets the same
    * source back offline reprocessing (`spark.read.format(...)`). */
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      BodyStream.partitions(dir, BodyStream.list(dir), 0L, filesPerPartition)
    override def createReaderFactory(): PartitionReaderFactory = BodyStream.ReaderFactory
  }
}

/** Offset = number of bodies ever admitted (files in name order), plus the
  * NAME of the last admitted file (`hwm`, "" when seq = 0). The hwm pins the
  * index→file mapping: [[BodyStream.validateBoundary]] re-checks it against
  * every later listing, so a range silently re-mapped by non-monotonic names
  * or file deletion fails loudly instead of replaying wrong bodies. */
case class BodySeqOffset(seq: Long, hwm: String) extends Offset {
  override def json(): String = s"""{"seq":$seq,"hwm":"${BodySeqOffset.esc(hwm)}"}"""
}

object BodySeqOffset {
  private def esc(s: String): String = s.flatMap {
    case '\\' => "\\\\"
    case '"' => "\\\""
    case c => c.toString
  }
  private val JsonForm = """\{"seq":(\d+),"hwm":"((?:[^"\\]|\\.)*)"\}""".r

  /** Accepts the current JSON form and the legacy plain-number form written
    * by pre-hwm checkpoints (which then get the weaker length-only check). */
  def parse(json: String): BodySeqOffset = json.trim match {
    case JsonForm(seq, hwm) =>
      BodySeqOffset(seq.toLong, hwm.replace("\\\"", "\"").replace("\\\\", "\\"))
    case legacy => BodySeqOffset(legacy.toLong, "")
  }
}

class BodyMicroBatchStream(dir: String, maxFilesPerTrigger: Int, filesPerPartition: Int)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  /** Under Trigger.AvailableNow the engine asks us to pin "available" at
    * query start; batches then drain up to this fence in
    * maxFilesPerTrigger-sized steps and the query stops. -1 = unpinned
    * (ProcessingTime trigger: every batch sees the live listing). */
  @volatile private var availableNowFence: Long = -1L

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowFence = BodyStream.count(dir)

  override def initialOffset(): Offset = BodySeqOffset(0L, "")
  override def deserializeOffset(json: String): Offset = BodySeqOffset.parse(json)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(maxFilesPerTrigger)

  /** Engine calls the admission-control overload below when the source
    * implements SupportsAdmissionControl; this variant must not be used. */
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  /** Admits up to `limit` new bodies. Uses the sorted listing (not the
    * cheap count): the committed start boundary is validated against it and
    * the new offset records the admitted high-water-mark NAME, so replay /
    * checkpoint recovery can prove the range still maps to the same files. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val listing = BodyStream.list(dir)
    cachedListing = listing
    val s = start.asInstanceOf[BodySeqOffset]
    BodyStream.validateBoundary(listing, s, dir)
    val total = if (availableNowFence >= 0) math.min(listing.length.toLong, availableNowFence)
                else listing.length.toLong
    val end = limit match {
      case rl: ReadMaxRows => math.min(total, s.seq + rl.maxRows())
      case _ => total
    }
    val endSeq = math.max(s.seq, end)
    val hwm =
      if (endSeq == 0L) ""
      else if (endSeq == s.seq && s.hwm.nonEmpty) s.hwm
      else listing(Math.toIntExact(endSeq) - 1)
    BodySeqOffset(endSeq, hwm)
  }

  /** Listing from this trigger's latestOffset, reused by the immediately
    * following planInputPartitions — halves the per-trigger O(n log n)
    * directory sorts. Safe to reuse because the directory is append-only
    * with monotonic names (enforced by validateBoundary): a cached listing
    * long enough to cover the batch maps every index in [start, end) to
    * the same file a fresh listing would. Empty on recovery (the engine
    * replans a committed batch without calling latestOffset) → re-list. */
  @volatile private var cachedListing: Vector[String] = Vector.empty

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[BodySeqOffset]
    val e = end.asInstanceOf[BodySeqOffset]
    val listing =
      if (cachedListing.length >= e.seq) cachedListing else BodyStream.list(dir)
    // Re-validate both boundaries at plan time: the directory may have
    // changed between offset admission (possibly a previous run, on
    // recovery) and batch planning.
    BodyStream.validateBoundary(listing, s, dir)
    BodyStream.validateBoundary(listing, e, dir)
    BodyStream.partitions(dir,
      listing.slice(Math.toIntExact(s.seq), Math.toIntExact(e.seq)), s.seq,
      filesPerPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory = BodyStream.ReaderFactory

  /** Deliberately a no-op: processed files must stay put, because offsets
    * index into the name-ordered listing — removing a file before the
    * high-water mark would shift every later index (now a loud
    * [[BodyStream.validateBoundary]] failure rather than silent wrong
    * data). Retention therefore happens OUTSIDE the streaming query: stop
    * it, archive the directory, reset the checkpoint. */
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
