package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming form of q79's incremental dedup: each micro-batch of incoming
  * docs is classified against a SIGNATURE TABLE ON STORAGE (content hashes
  * as parquet), and the accepted docs' signatures are appended back —
  * state lives in the table, not in executor memory, so it survives
  * restarts, is shared by other jobs, and grows on cheap storage instead
  * of the state store. This foreachBatch + storage-table pattern is how a
  * 100 TB/day ingest actually keeps "everything ever seen" dedup state
  * (watermarked in-memory dedup — `StreamingDedupWatermarkSpec` — bounds
  * state by TIME; the signature table bounds nothing and needs nothing
  * bounded). */
class StreamingIncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("batches dedup against a growing on-storage signature table") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sigDir = Files.createTempDirectory("graft-sigs-").toString
    val accepted = scala.collection.mutable.ArrayBuffer[(Long, String)]()

    // seed the corpus signature table
    Seq("existing document alpha", "existing document beta")
      .toDF("text").select(sha2(col("text"), 256).as("h"))
      .write.mode("overwrite").parquet(sigDir)

    val stream = MemoryStream[(Long, String)]
    val q = stream.toDS().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val sigs = batch.sparkSession.read.parquet(sigDir)
        val hashed = batch.withColumn("h", sha2(col("text"), 256))
        val fresh = hashed.join(sigs, Seq("h"), "left_anti")
          // batch-internal dups: keep first doc_id per content
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
              .orderBy(col("doc_id"))))
          .filter(col("rn") === 1)
        val rows = fresh.select(col("doc_id"), col("text")).collect()
        accepted.synchronized { accepted ++= rows.map(r => (r.getLong(0), r.getString(1))) }
        fresh.select(col("h")).write.mode("append").parquet(sigDir)
      }.start()
    try {
      stream.addData((1L, "existing document alpha"), (2L, "brand new one"),
        (3L, "brand new one")) // batch-internal dup of 2
      q.processAllAvailable()
      stream.addData((4L, "brand new one"), (5L, "another new one")) // 4 dups batch 1's accept
      q.processAllAvailable()
    } finally q.stop()

    assert(accepted.map(_._1).sorted == Seq(2L, 5L))
    // the signature table now covers everything accepted + seeded
    assert(spark.read.parquet(sigDir).distinct().count() == 4)
  }
}
