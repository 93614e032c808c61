package graft

import java.nio.file.Files

import graft.operators.Similarity
import graft.streaming.{SignatureCompaction, StreamingEmbeddingGate}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.streaming.StreamingEmbeddingGate]] — q216's continuous twin:
  * batch-rule parity on the real embeddings table (with q216's planted
  * twins), restart-without-rescan, and signature-table compaction reuse. */
class StreamingEmbeddingGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def collectStatuses(buf: scala.collection.mutable.Map[Long, String])
                             (classified: DataFrame, batchId: Long): Unit = {
    val rows = classified.collect()
    buf.synchronized { rows.foreach(r => buf(r.getLong(0)) = r.getString(1)) }
  }

  private def vecsDF(rows: Seq[(Long, Seq[Double])]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("one streamed batch classifies exactly like batch q216 (twins included)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val expected = Similarity.embeddingGate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(expected.values.toSet == Set("exact_dup", "near_dup", "new"))

    val base = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val mx = base.agg(max(col("vec_id"))).head().getLong(0)
    val twins = base.filter(col("vec_id") === 5)
      .select(lit(mx + 1).as("vec_id"), col("embedding"))
      .unionAll(base.filter(col("vec_id") === 7)
        .select(lit(mx + 2).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0)).as("embedding")))
    val sigDir = Files.createTempDirectory("graft-embsigs-").toString
    StreamingEmbeddingGate.seedSignatures(base.filter(col("vec_id") < 400), sigDir)

    val got = scala.collection.mutable.Map[Long, String]()
    val stream = MemoryStream[(Long, Seq[Double])]
    stream.addData(base.filter(col("vec_id") >= 400).unionAll(twins).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq: _*)
    val q = StreamingEmbeddingGate.start(
      stream.toDS().toDF("vec_id", "embedding"), sigDir,
      collectStatuses(got), trigger = Trigger.AvailableNow())
    q.awaitTermination(120000)
    assert(got.toMap === expected,
      s"drift from batch rule: ${(got.toMap.toSet -- expected.toSet).take(5)}")
  }

  test("restart without rescan; compaction reuse keeps classification identical") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graft-embsrc-").toString
    val sigDir = Files.createTempDirectory("graft-embsigs-").toString
    val ckpt = Files.createTempDirectory("graft-embckpt-").toString

    val v = Seq.tabulate(64)(i => (i % 7 + 1).toDouble)     // the seed vector
    val near = v.map(_ * 2.0)                               // cosine 1.0, not byte-equal
    val fresh = Seq.tabulate(64)(i => if (i % 2 == 0) 1.0 else -1.0) // ~orthogonal
    StreamingEmbeddingGate.seedSignatures(vecsDF(Seq((0L, v))), sigDir)

    def vecStream = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<DOUBLE>").parquet(srcDir)
    def writeBatch(rows: (Long, Seq[Double])*): Unit =
      vecsDF(rows).write.mode("append").parquet(srcDir)

    writeBatch((1L, v), (2L, near), (3L, fresh))
    val got1 = scala.collection.mutable.Map[Long, String]()
    val q1 = StreamingEmbeddingGate.start(vecStream, sigDir,
      collectStatuses(got1), checkpointDir = Some(ckpt),
      trigger = Trigger.AvailableNow())
    q1.awaitTermination(120000)
    assert(got1.toMap === Map(1L -> "exact_dup", 2L -> "near_dup", 3L -> "new"))

    // run 2: vec 4 byte-dups a RUN-1 accept — state came from the table
    writeBatch((4L, fresh), (5L, Seq.tabulate(64)(i => ((i * 13) % 11 - 5).toDouble)))
    val got2 = scala.collection.mutable.Map[Long, String]()
    val q2 = StreamingEmbeddingGate.start(vecStream, sigDir,
      collectStatuses(got2), checkpointDir = Some(ckpt),
      trigger = Trigger.AvailableNow())
    q2.awaitTermination(120000)
    assert(got2.keySet === Set(4L, 5L)) // vecs 1-3 not re-delivered
    assert(got2(4L) == "exact_dup")

    // SignatureCompaction applies unchanged to the vector table
    val probe = vecsDF(Seq((100L, v), (101L, near), (102L, fresh.map(_ * 3.0))))
    def classifyProbe() = StreamingEmbeddingGate.classify(probe,
      spark.read.schema(StreamingEmbeddingGate.SigSchema).parquet(sigDir))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val before = classifyProbe()
    assert(before(100L) == "exact_dup" && before(101L) == "near_dup"
      && before(102L) == "near_dup") // x3 scaling of an accepted vector: cos 1
    assert(SignatureCompaction.compact(spark, sigDir,
      StreamingEmbeddingGate.SigSchema) >= 2)
    assert(classifyProbe() === before, "compaction changed classification")
    val dirs = new java.io.File(sigDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch=")).map(_.getName)
    assert(dirs.toSeq === Seq("batch=-1"))
  }
}
