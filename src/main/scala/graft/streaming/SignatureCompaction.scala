package graft.streaming

import graft.FsTrees.{listDir, parquets, rmTree}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Maintenance for the dedup gates' on-storage signature tables
  * ([[StreamingDedup]], [[StreamingMultimodalGate]],
  * [[StreamingEmbeddingGate]]): every micro-batch appends one
  * `batch=<id>` partition forever, so a long-running gate accumulates
  * thousands of tiny files — the small-files problem the q185 index
  * solved with [[graft.operators.Pipeline.phraseIndexCompact]]. This op
  * folds ALL batch partitions into ONE compacted, distinct `batch=-1`
  * seed file. Classification answers are unchanged by construction:
  * every gate's classify reduces the signature side to its DISTINCT
  * keys, and distinct(union of all partitions) is exactly what the fold
  * writes.
  *
  * Swap discipline is phraseIndexCompact's verbatim (single-writer
  * maintenance contract — run while the gate is CLEANLY stopped; a clean
  * stop also means no uncommitted batch is pending, so [[GateLoop]]'s
  * replay exclusion can never collide with rows folded into `batch=-1`):
  * the compacted file is written to a dot-prefixed scratch dir UNDER THE
  * TABLE ROOT (same filesystem → ATOMIC_MOVE holds; hidden from Spark's
  * listing), moved into `batch=-1` under a unique name, and only then
  * are the superseded files and folded batch dirs deleted; stale crash
  * scratch is purged at entry and the per-run scratch is removed in a
  * finally. */
object SignatureCompaction {

  /** Fold every `batch=<id>` partition into one distinct `batch=-1`
    * file. `schema` is the table's DATA schema (no `batch` column —
    * it is the partition dir). @return number of batch partitions
    * folded away (0 = nothing to do: the idempotence witness). */
  def compact(spark: SparkSession, sigDir: String, schema: String): Int = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val root = Paths.get(sigDir)
    listDir(root)
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith(".graft-sig-compact-"))
      .foreach(rmTree)
    val batchDirs = listDir(root)
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("batch="))
    val seedDir = root.resolve("batch=-1")
    val folded = batchDirs.filterNot(_ == seedDir)
    val seedFiles = if (Files.exists(seedDir)) parquets(seedDir) else Nil
    if (folded.isEmpty && seedFiles.length <= 1) return 0 // already compact
    // parse the DDL properly — a split(",") phantom-columns any type
    // containing a comma (STRUCT<...>, DECIMAL(p,s)) (r17 review catch)
    val dataCols = StructType.fromDDL(schema).fieldNames.toSeq
    val tmp = Files.createTempDirectory(root, ".graft-sig-compact-")
    try {
      spark.read.schema(schema).parquet(sigDir)
        .select(dataCols.map(col): _*).distinct()
        .repartition(1)
        .write.mode("overwrite").parquet(tmp.toString)
      Files.createDirectories(seedDir)
      parquets(tmp).zipWithIndex.foreach { case (f, i) =>
        Files.move(f, seedDir.resolve(
          s"compacted-${java.util.UUID.randomUUID}-$i.parquet"),
          StandardCopyOption.ATOMIC_MOVE)
      }
      seedFiles.foreach { f =>
        Files.deleteIfExists(f)
        Files.deleteIfExists(f.resolveSibling("." + f.getFileName.toString + ".crc"))
      }
      folded.foreach(rmTree)
    } finally {
      rmTree(tmp)
      // Spark's shared FileStatusCache can otherwise serve the pre-swap
      // listing to the next reader of this path (FAILED_READ_FILE on the
      // deleted parts) — invalidate it whenever files MAY have moved, so
      // an exception mid-swap (after ATOMIC_MOVEs/deletes already mutated
      // the table) cannot leave the cache stale (ADVICE r17)
      spark.catalog.refreshByPath(sigDir)
    }
    folded.size
  }
}
