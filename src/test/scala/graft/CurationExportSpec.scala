package graft

import java.nio.file.Files

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q220's writer ([[Dedup.curatedShardsWrite]]) — the step after the
  * gate: accepted docs land in `shard=<s>/pack_id=<p>/` training-pack
  * dirs. The spec pins the written layout against the ORACLE-CHECKED
  * manifest (q220), so the files a trainer mmaps are provably the packs
  * the manifest bills. */
class CurationExportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("the written shard layout is exactly the q220 manifest, every doc " +
      "appears once, and a shard filter prunes to its dirs") {
    val out = Files.createTempDirectory("graft-curated-").toString
    Dedup.curatedShardsWrite(spark, sf, out)
    val written = spark.read.parquet(out)

    // layout ≡ manifest (the oracle-checked aggregate); partition-dir
    // columns read back as the inferred int type — normalize to long
    val fromFiles = written
      .groupBy(col("shard").cast("long"), col("pack_id").cast("long"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).cast("long").as("pack_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val manifest = Dedup.curationExport(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(fromFiles === manifest)

    // every accepted doc exactly once, with its real token count
    val docs = Tables(spark, sf, "documents")
    assert(written.select("doc_id").distinct().count() === written.count())
    val tokCheck = written
      .join(docs.select(col("doc_id"), col("text").as("orig_text")), Seq("doc_id"))
      .filter(size(split(col("orig_text"), " ")) =!= col("n_tok")).count()
    assert(tokCheck === 0L)
    // accepted = the gate's `new` rows and nothing else
    val statuses = Dedup.dedupGateProvenance(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val writtenIds = written.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(writtenIds === statuses.filter(_._2 == "new").keySet)

    // a trainer worker's shard filter prunes to that shard's dirs
    val one = written.filter(col("shard") === 0L)
    val plan = one.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters:") && plan.contains("shard"),
      s"shard filter did not reach the partition scan:\n$plan")
  }

  test("the BPE-billed writer's layout is exactly the q223 manifest, " +
      "with n_tok the encoded count under the trained vocab") {
    import graft.operators.TextStats
    val out = Files.createTempDirectory("graft-curated-bpe-").toString
    Dedup.curatedShardsWriteBpe(spark, sf, out)
    val written = spark.read.parquet(out)

    val fromFiles = written
      .groupBy(col("shard").cast("long"), col("pack_id").cast("long"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).cast("long").as("pack_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val manifest = Dedup.curationExportBpe(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(fromFiles === manifest)

    // n_tok really is the BPE-encoded count (not whitespace): recompute
    // independently over the same docs with the same trained vocab
    val docs = Tables(spark, sf, "documents")
    val expected = TextStats.bpeTokenCounts(
        docs.join(written.select("doc_id"), Seq("doc_id"), "left_semi"),
        TextStats.bpeTrain(spark, sf))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val drift = written.select(col("doc_id"), col("n_tok")).collect()
      .count(r => expected(r.getLong(0)) != r.getInt(1))
    assert(drift === 0)
    // and it differs from the whitespace billing somewhere (the
    // compression the variant exists to capture)
    val wsSame = written
      .join(docs.select(col("doc_id"), col("text").as("orig_text")), Seq("doc_id"))
      .filter(size(split(col("orig_text"), " ")) =!= col("n_tok")).count()
    assert(wsSame > 0L)
  }
}
