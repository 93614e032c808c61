package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition pruning on a hive-layout write — the other half of the
  * pushdown story PlanRegressionSpec pins for row-group filters: a corpus
  * partitioned by a categorical column at write time answers
  * single-category queries by never OPENING the other partitions'
  * files, which at 100 TB is the difference between scanning one
  * event type and scanning all of them. */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("filter on the partition column becomes a PartitionFilter, not a scan filter") {
    val out = Files.createTempDirectory("graft-part-").toString
    Tables(spark, "/root/testdata/sf0.001", "events")
      .write.partitionBy("event_type").mode("overwrite").parquet(out)

    val q = spark.read.parquet(out)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.explainString(FormattedMode)
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    assert("PartitionFilters: \\[[^\\]]*= purchase\\)".r.findFirstIn(plan).isDefined, plan)

    // the partition predicate must NOT degrade to a post-scan data filter
    assert(!plan.contains("PushedFilters: [IsNotNull(event_type)"), plan)

    // and the answer matches the unpartitioned read
    val expected = Tables(spark, "/root/testdata/sf0.001", "events")
      .filter(col("event_type") === "purchase").count()
    assert(q.agg(sum(col("n"))).collect()(0).getLong(0) == expected)
  }

  test("q165's layout in practice: z-ordered files are stats-skippable on BOTH dims") {
    import org.apache.spark.sql.Column
    import spark.implicits._
    // the file-level proof behind q165's audit: write the SAME 64x64 grid
    // as 16 files z-ordered and 16 files linearly sorted, then check which
    // files a y-only box predicate could skip on footer min/max alone —
    // the pruning a parquet reader does per row group at 100 TB.
    def spread(c: Column): Column =
      Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))
        .foldLeft(c.bitwiseAND(lit(65535L))) { case (s, (sh, m)) =>
          s.bitwiseOR(shiftleft(s, sh)).bitwiseAND(lit(m))
        }
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
      // scale 6-bit coords to 16 bits (x << 10), as q165 does via min-max
      .withColumn("z", spread(shiftleft(col("x"), 10))
        .bitwiseOR(shiftleft(spread(shiftleft(col("y"), 10)), 1)))
    val (zdir, ldir) = (Files.createTempDirectory("graft-z-").toString,
      Files.createTempDirectory("graft-lin-").toString)
    grid.repartitionByRange(16, col("z")).sortWithinPartitions("z")
      .select("x", "y").write.mode("overwrite").parquet(zdir)
    grid.repartitionByRange(16, col("x"), col("y")).sortWithinPartitions("x", "y")
      .select("x", "y").write.mode("overwrite").parquet(ldir)

    def skippable(dir: String): Int = {
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.toString)
      assert(files.length == 16, s"expected 16 files in $dir")
      files.count { f =>
        val r = spark.read.parquet(f).agg(min(col("y")), max(col("y"))).head()
        r.getLong(1) < 8L || r.getLong(0) > 15L // disjoint from y IN [8, 15]
      }
    }
    val (zSkip, lSkip) = (skippable(zdir), skippable(ldir))
    assert(zSkip >= 8, s"z-order skipped only $zSkip/16 files on the y box")
    assert(lSkip == 0, s"linear layout unexpectedly skippable ($lSkip) — bad control")

    // both layouts answer the box query identically, and the y predicate is
    // pushed to the scan (so real readers get the row-group skip for free)
    val q = spark.read.parquet(zdir).filter(col("y") >= 8 && col("y") <= 15)
    assert(q.queryExecution.explainString(FormattedMode).contains(
      "PushedFilters: [IsNotNull(y), GreaterThanOrEqual(y,8), LessThanOrEqual(y,15)]"))
    assert(q.count() == 64L * 8 &&
      spark.read.parquet(ldir).filter(col("y").between(8, 15)).count() == 64L * 8)
  }

  test("q185's index in practice: a phrase probe opens ONLY the phrase terms' " +
      "bucket directories, and the answer equals the scan-based q180") {
    val dir = "/root/testdata/sf0.001"
    val phrase = Seq("table", "hash")
    val idxDir = operators.Pipeline.phraseIndexDir(TestSpark.spark, dir)
    val spark = TestSpark.spark

    // file-level proof, the §6.8/q165 discipline: the pruned read's input
    // files are a strict subset confined to ≤2 bucket directories
    val all = spark.read.parquet(idxDir)
    val probed = operators.Pipeline.phraseSearchIndexed(spark, dir, phrase)
    val scan = probed.queryExecution.sparkPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.nonEmpty, "no file scans in the indexed probe")
    // selectedPartitions is POST-pruning: the probe must touch at most the
    // phrase's ≤2 bucket directories of the >2 the index holds
    val opened = scan.map(_.selectedPartitions.partitionCount).max
    val totalBuckets = all.select(col("bucket")).distinct().count()
    assert(totalBuckets > 2, s"degenerate index: $totalBuckets buckets")
    assert(opened <= 2, s"probe opened $opened of $totalBuckets bucket dirs")
    val plan = probed.queryExecution.explainString(FormattedMode)
    assert(plan.contains("PartitionFilters:") && plan.contains("bucket"),
      s"no bucket partition filter:\n$plan")

    // and the two access paths agree exactly
    val viaIndex = probed.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val viaScan = operators.Pipeline.phraseSearch(Tables(spark, dir, "documents"), phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(viaIndex.toSeq == viaScan.toSeq, "index and scan paths disagree")
    assert(viaIndex.nonEmpty)
  }

  test("q185 incremental append (VERDICT r13 #7): a TWO-GENERATION index — " +
      "initial build + an ingest batch — answers identically to the " +
      "full-corpus scan, and the probe stays partition-pruned") {
    val dir = "/root/testdata/sf0.001"
    val phrase = Seq("table", "hash")
    val docs = Tables(spark, dir, "documents")
    // generation 0 indexes the even docs (the initial build); generation 1
    // appends the odd docs (the ingest batch) through the SAME bucketing
    val idxDir = Files.createTempDirectory("graft-phrase-gen-").toString
    operators.Pipeline.phraseIndexAppend(idxDir, docs.filter(col("doc_id") % 2 === 0), gen = 0)
    operators.Pipeline.phraseIndexAppend(idxDir, docs.filter(col("doc_id") % 2 === 1), gen = 1)

    val probed = operators.Pipeline.phraseIndexProbe(spark, idxDir, phrase)

    // file-listing proof: the multi-generation probe still opens at most
    // the phrase's ≤2 bucket dirs (appends land INSIDE bucket dirs, so
    // pruning is generation-oblivious) — and the pruned read really does
    // see BOTH generations' files inside those buckets
    val scan = probed.queryExecution.sparkPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.nonEmpty, "no file scans in the indexed probe")
    assert(scan.map(_.selectedPartitions.partitionCount).max <= 2,
      "multi-generation probe lost partition pruning")
    val gens = spark.read.parquet(idxDir)
      .filter(col("tok").isin(phrase: _*))
      .select(col("gen")).distinct().collect().map(_.getInt(0)).sorted
    assert(gens.toSeq == Seq(0, 1),
      s"probed buckets must hold postings from both generations, saw ${gens.toSeq}")

    // correctness across generations: identical to scanning the full corpus
    val viaIndex = probed.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val viaScan = operators.Pipeline.phraseSearch(docs, phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(viaIndex.toSeq == viaScan.toSeq,
      "two-generation index and scan paths disagree")
    assert(viaIndex.nonEmpty)
  }

  test("q185 generation compaction (VERDICT r14 #5): an over-threshold " +
      "bucket rewrites to ONE file, probes answer identically " +
      "mid-compaction and after, pruning and both generations intact") {
    val dir = "/root/testdata/sf0.001"
    val phrase = Seq("table", "hash")
    val docs = Tables(spark, dir, "documents")
    // five ingest generations by doc_id mod 5 → ≥5 files per touched bucket
    val idxDir = Files.createTempDirectory("graft-phrase-compact-spec-").toString
    (0 to 4).foreach { g =>
      operators.Pipeline.phraseIndexAppend(idxDir,
        docs.filter(col("doc_id") % 5 === g), gen = g)
    }
    def filesOf(bucket: Int): Seq[String] = {
      val d = new java.io.File(s"$idxDir/bucket=$bucket")
      if (!d.exists()) Seq.empty
      else d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSeq.sorted
    }
    val baseline = operators.Pipeline.phraseIndexProbe(spark, idxDir, phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(baseline.nonEmpty)

    // compact ONE phrase bucket first — the index is now MID-compaction
    // (one bucket single-file, its phrase sibling still 5 small files)
    val phraseBuckets = spark.read.parquet(idxDir)
      .filter(col("tok").isin(phrase: _*))
      .select(col("bucket")).distinct().collect().map(_.getInt(0)).sorted
    assert(phraseBuckets.length == 2, s"phrase buckets: ${phraseBuckets.toSeq}")
    val preCount = filesOf(phraseBuckets.head).length
    assert(preCount >= 5, s"append produced only $preCount files")
    // surgically compact just the first bucket: run with a threshold that
    // both buckets pass, against a root holding ONLY that bucket... the op
    // is per-bucket by design, so emulate the mid-compaction state by
    // compacting all, then verifying file layouts: instead compact with
    // maxFiles high enough that nothing triggers (no-op contract) first
    assert(operators.Pipeline.phraseIndexCompact(spark, idxDir, maxFiles = 99).isEmpty,
      "threshold not reached must be a no-op")
    assert(filesOf(phraseBuckets.head).length == preCount, "no-op rewrote files")

    // now compact ONLY the first phrase bucket (single-bucket root view)
    val oneBucketRoot = Files.createTempDirectory("graft-phrase-one-").toString
    val moved = new java.io.File(s"$idxDir/bucket=${phraseBuckets.head}")
    val target = new java.io.File(s"$oneBucketRoot/bucket=${phraseBuckets.head}")
    Files.move(moved.toPath, target.toPath)
    assert(operators.Pipeline.phraseIndexCompact(spark, oneBucketRoot, maxFiles = 4)
      == Seq(phraseBuckets.head))
    Files.move(target.toPath, moved.toPath)
    assert(filesOf(phraseBuckets.head).length == 1,
      s"bucket ${phraseBuckets.head} not compacted: ${filesOf(phraseBuckets.head)}")
    assert(filesOf(phraseBuckets.last).length == preCount,
      "untouched bucket changed mid-compaction")

    // MID-compaction: answers identical, pruning intact, generations intact
    val mid = operators.Pipeline.phraseIndexProbe(spark, idxDir, phrase)
    val scan = mid.queryExecution.sparkPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.map(_.selectedPartitions.partitionCount).max <= 2,
      "mid-compaction probe lost partition pruning")
    assert(mid.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      == baseline, "mid-compaction probe disagrees with the pre-compaction answer")
    val gensCompacted = spark.read.parquet(s"$idxDir/bucket=${phraseBuckets.head}")
      .select(col("gen")).distinct().collect().map(_.getInt(0)).sorted.toSeq
    assert(gensCompacted == (0 to 4).toSeq,
      s"compaction lost generations: $gensCompacted")

    // plant stale scratch from a "crashed" prior compaction: the next run
    // must purge it (ADVICE r16 — half-written scratch trees otherwise
    // live under the index root forever)
    val stale = new java.io.File(s"$idxDir/.graft-phrase-compact-stale123/sub")
    assert(stale.mkdirs())
    Files.write(stale.toPath.resolve("part-half-written.parquet"),
      Array[Byte](1, 2, 3))

    // full compaction: every phrase bucket single-file, answers unchanged
    val done = operators.Pipeline.phraseIndexCompact(spark, idxDir, maxFiles = 4)
    assert(!stale.getParentFile.exists(),
      "stale crash scratch not purged at compaction entry")
    assert(done.nonEmpty && done.contains(phraseBuckets.last))
    assert(filesOf(phraseBuckets.last).length == 1, "full compaction incomplete")
    assert(operators.Pipeline.phraseIndexProbe(spark, idxDir, phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      == baseline, "post-compaction probe disagrees")
  }
}
