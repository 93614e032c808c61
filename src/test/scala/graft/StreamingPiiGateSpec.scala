package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** q204's continuous twin: the streamed scrub IS the batch rule (parity by
  * construction, asserted on real corpus rows), and the pane aggregate
  * finalizes on the watermark with late rows dropped. */
class StreamingPiiGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("streamed scrub equals the batch per-doc rule on injected corpus rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // real docs with the q204 injection — every PII class present
    val docs = operators.TextStats.injectPii(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
      .select("doc_id", "lang", "text")
    val rows = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

    val stream = MemoryStream[(Long, String, String)]
    val scrubbed = graft.streaming.StreamingPiiGate.scrub(
      stream.toDS().toDF("doc_id", "lang", "text"))
    val q = scrubbed.writeStream.format("memory").queryName("pii_scrub")
      .outputMode("append").start()
    try {
      val (h1, h2) = rows.splitAt(rows.length / 2)
      stream.addData(h1.toSeq: _*)
      q.processAllAvailable()
      stream.addData(h2.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    def key(r: org.apache.spark.sql.Row) = r.getAs[Long]("doc_id")
    def obs(r: org.apache.spark.sql.Row) =
      (r.getAs[Int]("n_emails"), r.getAs[Int]("n_ips"), r.getAs[Int]("n_phones"),
        r.getAs[Int]("n_cards"), r.getAs[Int]("n_luhn_valid"),
        r.getAs[String]("redacted"))
    val got = spark.table("pii_scrub").collect().map(r => key(r) -> obs(r)).toMap
    val want = operators.TextStats.piiPerDoc(docs).collect()
      .map(r => key(r) -> obs(r)).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("extended-class streamed scrub equals batch q210's per-doc rule on injected rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = operators.TextStats.injectPiiExt(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
      .select("doc_id", "lang", "text")
    val rows = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

    val stream = MemoryStream[(Long, String, String)]
    val scrubbed = graft.streaming.StreamingPiiGate.scrubExtended(
      stream.toDS().toDF("doc_id", "lang", "text"))
    val q = scrubbed.writeStream.format("memory").queryName("pii_scrub_ext")
      .outputMode("append").start()
    try {
      val (h1, h2) = rows.splitAt(rows.length / 2)
      stream.addData(h1.toSeq: _*)
      q.processAllAvailable()
      stream.addData(h2.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    def key(r: org.apache.spark.sql.Row) = r.getAs[Long]("doc_id")
    def obs(r: org.apache.spark.sql.Row) =
      (r.getAs[Int]("n_ip6"), r.getAs[Int]("n_ibans"),
        r.getAs[Int]("n_iban_valid"), r.getAs[String]("redacted"))
    val got = spark.table("pii_scrub_ext").collect().map(r => key(r) -> obs(r)).toMap
    val want = operators.TextStats.piiExtPerDoc(docs).collect()
      .map(r => key(r) -> obs(r)).toMap
    assert(got === want)
    assert(got.nonEmpty && got.values.exists(_._3 > 0)) // valid IBANs flowed
  }

  test("extended pane counts finalize on the watermark; late rows are dropped") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, String, String, Timestamp)]
    val panes = graft.streaming.StreamingPiiGate.paneCountsExtended(
      stream.toDS().toDF("doc_id", "lang", "text", "ingest_ts"),
      watermarkDelay = "5 seconds", pane = "1 minute")
    val q = panes.writeStream.format("memory").queryName("pii_panes_ext")
      .outputMode("append").start()
    try {
      stream.addData(
        (1L, "en", "pay GB82WEST12345698765432 now", ts(60)),
        (2L, "en", "clean text here", ts(70)),
        (3L, "de", "host fe80::1:2 and 2001:db8:85a3:0:8a2e:370:7334:1", ts(80)))
      q.processAllAvailable()
      stream.addData((4L, "en", "iban GB82WEST12345698765431 shaped", ts(200)))
      q.processAllAvailable()
      // LATE: pane [60,120) closed at watermark 195 — dropped
      stream.addData((5L, "en", "late fe80::9:9", ts(61)))
      q.processAllAvailable()
      stream.addData((6L, "en", "flush marker", ts(400)))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("pii_panes_ext").collect().map { r =>
      val w = r.getStruct(0)
      (w.getTimestamp(0).getTime / 1000, r.getString(1), r.getAs[Long]("n_docs"),
        r.getAs[Long]("docs_with_pii"), r.getAs[Long]("n_ip6"),
        r.getAs[Long]("n_ibans"), r.getAs[Long]("n_iban_valid"))
    }.toSet
    assert(got === Set(
      (60L, "en", 2L, 1L, 0L, 1L, 1L), // doc 5's late IPv6 NOT counted
      (60L, "de", 1L, 1L, 2L, 0L, 0L),
      (180L, "en", 1L, 1L, 0L, 1L, 0L))) // shaped-but-invalid IBAN
  }

  test("pane counts finalize on the watermark; late rows are dropped") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, String, String, Timestamp)]
    val panes = graft.streaming.StreamingPiiGate.paneCounts(
      stream.toDS().toDF("doc_id", "lang", "text", "ingest_ts"),
      watermarkDelay = "5 seconds", pane = "1 minute")
    val q = panes.writeStream.format("memory").queryName("pii_panes")
      .outputMode("append").start()
    try {
      stream.addData(
        (1L, "en", "mail bob@corp.io now", ts(60)),
        (2L, "en", "clean text here", ts(70)),
        (3L, "de", "dial 555-1234 twice 555-9999", ts(80)))
      q.processAllAvailable()
      // advance the watermark past pane [60,120) → it finalizes
      stream.addData((4L, "en", "host 10.0.0.1 up", ts(200)))
      q.processAllAvailable()
      // LATE: pane [60,120) already closed at watermark 195 — dropped
      stream.addData((5L, "en", "mail late@x.io", ts(61)))
      q.processAllAvailable()
      // close the second pane too
      stream.addData((6L, "en", "flush marker", ts(400)))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("pii_panes").collect().map { r =>
      val w = r.getStruct(0)
      (w.getTimestamp(0).getTime / 1000, r.getString(1), r.getAs[Long]("n_docs"),
        r.getAs[Long]("docs_with_pii"), r.getAs[Long]("n_emails"),
        r.getAs[Long]("n_phones"), r.getAs[Long]("n_ips"))
    }.toSet
    assert(got === Set(
      (60L, "en", 2L, 1L, 1L, 0L, 0L), // doc 5's late email NOT counted
      (60L, "de", 1L, 1L, 0L, 2L, 0L),
      (180L, "en", 1L, 1L, 0L, 0L, 1L)))
  }
}
