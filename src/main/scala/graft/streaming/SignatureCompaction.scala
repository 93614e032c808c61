package graft.streaming

import graft.{Tfs, TfsEntry}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Maintenance for the dedup gates' on-storage signature tables
  * ([[StreamingDedup]], [[StreamingMultimodalGate]],
  * [[StreamingEmbeddingGate]]): every micro-batch appends one
  * `batch=<id>` partition forever, so a long-running gate accumulates
  * thousands of tiny files — the small-files problem the q185 index
  * solved with [[graft.operators.Pipeline.phraseIndexCompact]]. This op
  * folds ALL batch partitions into one compacted, distinct `batch=-1`
  * seed, PRESERVING the `pb=<b>` probe-bucket sub-partitioning
  * ([[GateLoop]]'s pruning layout — a fold that flattened it would
  * silently un-prune every later micro-batch). Classification answers
  * are unchanged by construction: every gate's classify reduces the
  * signature side to its DISTINCT keys, and distinct(union of all
  * partitions) is exactly what the fold writes.
  *
  * The fold is SIZE-BOUNDED, not single-task (VERDICT r17 #4): rows
  * shuffle once on `pb` (one task per bucket — parallelism follows the
  * bucket fan-out) and `maxRecordsPerFile` splits each bucket's output
  * at a target file size estimated from the table's own measured
  * bytes-per-row, so a petabyte seed folds as ≤buckets concurrent tasks
  * writing bounded files instead of one task writing one file.
  *
  * Swap discipline is phraseIndexCompact's verbatim (single-writer
  * maintenance contract — run while the gate is CLEANLY stopped; a clean
  * stop also means no uncommitted batch is pending, so [[GateLoop]]'s
  * replay exclusion can never collide with rows folded into `batch=-1`):
  * the compacted files are written to a dot-prefixed scratch dir UNDER
  * THE TABLE ROOT (same filesystem → the [[graft.Tfs]] move contract
  * holds; hidden from Spark's listing), moved into `batch=-1/pb=<b>/`
  * under unique names, and only then are the superseded files and folded
  * batch dirs deleted; stale crash scratch is purged at entry, the
  * per-run scratch is removed in a finally, and the FileStatusCache is
  * invalidated in the same finally (files may have moved even on an
  * exception — ADVICE r17). After a compact the table's max batch id is
  * -1, so [[GateLoop]]'s fresh-checkpoint guard permits re-attaching a
  * new checkpoint.
  *
  * ALL file moves/listings/deletes go through the [[graft.Tfs]] seam
  * (VERDICT r19 #1): plain paths behave exactly as before (nio), while
  * scheme'd table roots (`s3a://…`, `hdfs://…`, `file:/…`) run the SAME
  * maintenance against Hadoop `FileSystem` — the object-store story a
  * 100 TB signature table needs. The seam's move contract (atomic
  * destination visibility, crash tolerance via unique names +
  * idempotent re-run) is documented at [[graft.Tfs]]. */
object SignatureCompaction {

  /** Fold every `batch=<id>` partition into the distinct `batch=-1`
    * seed. `schema` is the table's DATA schema (no `batch`/`pb` columns —
    * they are partition dirs). `targetFileBytes` bounds output file
    * size. @return number of batch partitions folded away (0 = nothing
    * to fold: the idempotence witness; a seed fragmented past one file
    * per bucket is still rewritten). */
  def compact(spark: SparkSession, sigDir: String, schema: String,
              targetFileBytes: Long = 128L << 20): Int = {
    val fs = Tfs.of(sigDir)
    fs.dirsWithPrefix(sigDir, ".graft-sig-compact-").foreach(fs.rmTree)
    val batchDirs = fs.dirsWithPrefix(sigDir, "batch=")
    val seedDir = Tfs.child(sigDir, "batch=-1")
    val folded = batchDirs.filterNot(Tfs.name(_) == "batch=-1")
    // seed parquet files live under pb=<b>/ sub-dirs (plus any flat
    // stragglers from a pre-pb layout)
    val seedFiles = seedFilesOf(fs, seedDir)
    if (folded.isEmpty && seedFiles.length <= GateLoop.readBuckets(sigDir)) return 0
    // parse the DDL properly — a split(",") phantom-columns any type
    // containing a comma (STRUCT<...>, DECIMAL(p,s)) (r17 review catch)
    val dataCols = StructType.fromDDL(schema).fieldNames.toSeq
    // measured bytes-per-row → records per output file at the target size
    val totalBytes = batchDirs.flatMap(fs.walkFiles)
      .filter(_.path.endsWith(".parquet")).map(_.size).sum
    val df = spark.read.schema(s"$schema, pb INT").parquet(sigDir)
      .select((dataCols :+ "pb").map(col): _*).distinct()
    swapIn(spark, sigDir, df, totalBytes, targetFileBytes,
      seedFiles, folded, afterMoves = () => ())
    folded.size
  }

  /** BUCKET-COUNT EVOLUTION (SURVEY §7.9 r19 #2): fold the whole table —
    * seed and batch partitions — into `batch=-1` REWRITING every row's
    * probe bucket under a new fan-out. A table's pb count is pinned for
    * its lifetime ([[GateLoop.BucketsMeta]]) because writers and probe
    * readers must hash identically; the only sound resize is therefore a
    * compaction-shaped rewrite while the gate is cleanly stopped. Grow
    * the fan-out as the seed grows (finer micro-batch pruning: a batch
    * opens `probe keys / buckets` of the table), shrink it if tiny
    * buckets fragment files. The new `pb` comes from the descriptor's
    * `pbKeyCols` through the ONE [[GateLoop.pbOf]] formula the writers
    * use, so post-resize probes agree bit-for-bit by construction;
    * classification is unchanged for the same reason as [[compact]] —
    * classify() distinct-reduces the signature side and the fold writes
    * exactly distinct(union of partitions).
    *
    * Crash ordering (same single-writer contract as [[compact]]): new
    * files MOVE in first, the meta marker flips second, superseded files
    * delete last. The invariant that makes either crash side readable is
    * NOT directory disjointness — the old and new pb ranges overlap
    * (16→32 shares pb=0..15), so leftover files from the other layout
    * CAN sit in dirs the surviving marker's probe opens — it is that
    * both layouts hold the same distinct signature rows and every
    * classify rule distinct-reduces / arg-maxes its signature side
    * (the same rationale as [[compact]]): a crash before the flip reads
    * the complete old layout plus possible new-layout duplicate rows; a
    * crash after the flip reads the complete new layout plus possible
    * old-layout duplicate rows; duplicates change no classification.
    * Either way, RE-RUN resize before restarting the gate to finish the
    * swap and drop the leftovers.
    * @return number of batch partitions folded away. */
  def resize(spark: SparkSession, table: GateTable, targetBuckets: Int,
             targetFileBytes: Long = 128L << 20): Int = {
    require(targetBuckets > 0,
      s"targetBuckets must be positive, got $targetBuckets")
    val fs = Tfs.of(table.sigDir)
    fs.dirsWithPrefix(table.sigDir, ".graft-sig-compact-").foreach(fs.rmTree)
    val batchDirs = fs.dirsWithPrefix(table.sigDir, "batch=")
    val seedDir = Tfs.child(table.sigDir, "batch=-1")
    val folded = batchDirs.filterNot(Tfs.name(_) == "batch=-1")
    // EVERY pre-resize file is superseded: the old layout's pb dirs are
    // wrong under the new fan-out, so the seed's own files fold too
    val seedFiles = seedFilesOf(fs, seedDir)
    val totalBytes = batchDirs.flatMap(fs.walkFiles)
      .filter(_.path.endsWith(".parquet")).map(_.size).sum
    val dataCols = StructType.fromDDL(table.desc.sigSchema).fieldNames.toSeq
    // distinct over the DATA columns only — the old pb is layout, not
    // data, and the new pb is a pure function of pbKeyCols
    val df = spark.read.schema(table.desc.sigSchema).parquet(table.sigDir)
      .select(dataCols.map(col): _*).distinct()
      .withColumn("pb", GateLoop.pbOf(targetBuckets,
        table.desc.pbKeyCols.map(col)))
    swapIn(spark, table.sigDir, df, totalBytes, targetFileBytes,
      seedFiles, folded,
      afterMoves = () => GateLoop.writeBuckets(table.sigDir, targetBuckets))
    folded.size
  }

  /** The seed's parquet files: under its `pb=<b>` sub-dirs plus any
    * flat stragglers from a pre-pb layout. */
  private def seedFilesOf(fs: Tfs, seedDir: String): Seq[String] =
    if (!fs.exists(seedDir)) Nil
    else fs.parquets(seedDir) ++
      fs.dirsWithPrefix(seedDir, "pb=").flatMap(fs.parquets)

  /** The shared swap: write `df` (data cols + `pb`) into same-FS dot
    * scratch, move into `batch=-1/pb=<b>/`, run `afterMoves` (the
    * resize's meta flip), then delete superseded files and folded batch
    * dirs; scratch removal and FileStatusCache invalidation in the
    * finally. */
  private def swapIn(spark: SparkSession, sigDir: String,
                     df: org.apache.spark.sql.DataFrame,
                     totalBytes: Long, targetFileBytes: Long,
                     seedFiles: Seq[String],
                     folded: Seq[String],
                     afterMoves: () => Unit): Unit = {
    val fs = Tfs.of(sigDir)
    val seedDir = Tfs.child(sigDir, "batch=-1")
    val totalRows = df.count()
    val bytesPerRow = math.max(1.0,
      totalBytes.toDouble / math.max(1L, totalRows).toDouble)
    val recordsPerFile = math.max(1L, (targetFileBytes / bytesPerRow).toLong)
    val tmp = fs.mkScratch(sigDir, ".graft-sig-compact-")
    try {
      df.repartition(col("pb")) // one task per bucket: the parallel fold
        .write.option("maxRecordsPerFile", recordsPerFile)
        .mode("overwrite").partitionBy("pb").parquet(tmp)
      fs.mkdirs(seedDir)
      fs.dirsWithPrefix(tmp, "pb=").foreach { pbDir =>
        val dst = Tfs.child(seedDir, Tfs.name(pbDir))
        fs.mkdirs(dst)
        fs.parquets(pbDir).zipWithIndex.foreach { case (f, i) =>
          fs.move(f, Tfs.child(dst,
            s"compacted-${java.util.UUID.randomUUID}-$i.parquet"))
        }
      }
      afterMoves()
      seedFiles.foreach { f =>
        fs.deleteIfExists(f)
        fs.deleteIfExists(Tfs.crcSibling(f))
      }
      // pb dirs whose every row folded elsewhere: drop if now empty
      fs.dirsWithPrefix(seedDir, "pb=")
        .filter(fs.parquets(_).isEmpty)
        .foreach(fs.rmTree)
      folded.foreach(fs.rmTree)
    } finally {
      fs.rmTree(tmp)
      // Spark's shared FileStatusCache can otherwise serve the pre-swap
      // listing to the next reader of this path (FAILED_READ_FILE on the
      // deleted parts) — invalidate it whenever files MAY have moved,
      // exception paths included (ADVICE r17)
      spark.catalog.refreshByPath(sigDir)
    }
  }

  /** Windowed HISTORY FOLD — the metadata-only sibling of [[compact]]:
    * move every `batch=<id>` partition older than the newest `keepLast`
    * into the `batch=-1` seed by RENAMING its parquet files into the
    * seed's matching `pb=<b>` dirs. No Spark job, no rewrite: the gate
    * invariant (an accepted row never shares a key with the existing
    * table, and in-batch rows are key-distinct) means the union of
    * partitions is already distinct, so a pure file move preserves the
    * table's rows AND the pb pruning layout exactly. At a petabyte seed
    * this is O(moved files) metadata work where [[compact]] is a full
    * rewrite — run foldHistory on a schedule to bound batch-dir count,
    * [[compact]] rarely (file sizing). Crash-safe by move semantics: a
    * partial fold never duplicates a row, and a re-run folds the
    * remainder.
    *
    * Single-writer contract as [[compact]]: run while the gate is
    * CLEANLY stopped. Folded rows lose per-batch attribution (their
    * partition becomes -1) — keepLast retains the newest N batch dirs
    * for provenance-by-batch. After a full fold (keepLast = 0) the max
    * batch id is -1, re-admitting a fresh checkpoint ([[GateLoop]]'s
    * guard). @return folded batch ids, ascending (empty = nothing to
    * fold: the idempotence witness). */
  def foldHistory(spark: SparkSession, sigDir: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 0, s"keepLast must be >= 0, got $keepLast")
    foldBatchPartitions(spark, sigDir, keepLast, subPrefix = "pb=")
  }

  /** The ONE move-into-archive discipline, shared by the signature fold
    * above (`pb=` sub-partitions) and the review queue's
    * [[GateDeliveries.foldHistory]] (`status=`/`joint_status=` — the
    * sink's partition column is caller-chosen, so the prefix must be
    * too; a hardcoded prefix here silently moved NOTHING on a
    * joint-status queue and then deleted the batch dirs — the review
    * catch that forced this extraction). Defense in depth: after the
    * matching sub-dirs' files move, the batch dir must hold NO parquet
    * file anywhere — any remainder (an unexpected layout, a foreign
    * partition column) aborts loudly BEFORE the rmTree instead of
    * deleting unmoved data; the partial fold heals on re-run after the
    * operator fixes the prefix. */
  private[streaming] def foldBatchPartitions(spark: SparkSession,
      rootDir: String, keepLast: Int, subPrefix: String): Seq[Long] = {
    val fs = Tfs.of(rootDir)
    val archive = Tfs.child(rootDir, "batch=-1")
    val batchIds = fs.dirsWithPrefix(rootDir, "batch=")
      .flatMap(d => Tfs.name(d).stripPrefix("batch=").toLongOption)
      .filter(_ >= 0L).sorted
    val fold = batchIds.dropRight(keepLast)
    if (fold.isEmpty) return Nil
    try {
      fold.foreach { id =>
        val batchDir = Tfs.child(rootDir, s"batch=$id")
        fs.dirsWithPrefix(batchDir, subPrefix).foreach { subDir =>
          val dst = Tfs.child(archive, Tfs.name(subDir))
          fs.mkdirs(dst)
          fs.parquets(subDir).zipWithIndex.foreach { case (f, i) =>
            fs.deleteIfExists(Tfs.crcSibling(f))
            fs.move(f, Tfs.child(dst,
              s"folded-b$id-${java.util.UUID.randomUUID}-$i.parquet"))
          }
        }
        val leftover = fs.walkFiles(batchDir)
          .filter(_.path.endsWith(".parquet"))
        require(leftover.isEmpty,
          s"$batchDir still holds ${leftover.size} parquet file(s) outside " +
            s"'$subPrefix*' sub-dirs (e.g. ${leftover.head.path}) — wrong " +
            "sub-partition prefix for this table's layout? Refusing to " +
            "delete unmoved data; already-moved files are safe, re-run " +
            "with the right prefix to finish the fold.")
        fs.rmTree(batchDir)
      }
    } finally spark.catalog.refreshByPath(rootDir)
    fold
  }
}
