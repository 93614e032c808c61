package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** q204's PII gate on planted fixtures: per-class detection, Luhn
  * valid/invalid discrimination, redaction rewrites, clean docs counted
  * clean, and the zero-join plan pin. */
class PiiScrubSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "text")
  }

  private def scrub(rows: (Long, String, String)*) =
    operators.TextStats.piiScrub(docs(rows: _*))
      .collect().map(r => r.getString(0) -> r).toMap

  test("per-class detection + Luhn discrimination on planted docs") {
    val out = scrub(
      (1L, "en", "mail bob.smith@corp.io and alice@x.co today"), // 2 emails
      (2L, "en", "valid 4242424242424242 invalid 4242424242424241"), // 2 cards, 1 luhn
      (3L, "en", "host 192.168.0.1 dial 555-1234"),
      (4L, "en", "perfectly clean text"),
      (5L, "de", "amex 378282246310005 visa 4111111111111111"))
    val en = out("en")
    assert(en.getAs[Long]("n_docs") === 4L)
    assert(en.getAs[Long]("docs_with_pii") === 3L)
    assert(en.getAs[Long]("n_emails") === 2L)
    assert(en.getAs[Long]("n_ips") === 1L)
    assert(en.getAs[Long]("n_phones") === 1L)
    assert(en.getAs[Long]("n_cards") === 2L)
    assert(en.getAs[Long]("n_luhn_valid") === 1L)
    val de = out("de")
    assert(de.getAs[Long]("n_cards") === 2L && de.getAs[Long]("n_luhn_valid") === 2L)
  }

  test("redaction rewrites every class and only those spans") {
    // the redaction length delta proves each span was rewritten
    val one = docs((1L, "en",
      "x bob@corp.io y 4242424242424242 z 10.0.0.1 w 555-9876 end"))
    val row = operators.TextStats.piiScrub(one).collect().head
    assert(row.getAs[Long]("docs_with_pii") === 1L)
    // '<EMAIL>'(7) - 11, '<CARDNUM>'(9) - 16, '<IP>'(4) - 8, '<PHONE>'(7) - 8
    assert(row.getAs[Long]("chars_delta") ===
      (7L - 11L) + (9L - 16L) + (4L - 8L) + (7L - 8L))
  }

  test("card-shaped runs shorter than 13 or longer than 19 digits are not candidates") {
    val out = scrub(
      (1L, "en", "short 123456789012 ok"), // 12 digits
      (2L, "en", "long 12345678901234567890 ok")) // 20 digits
    assert(out("en").getAs[Long]("n_cards") === 0L)
    assert(out("en").getAs[Long]("docs_with_pii") === 0L)
  }

  test("injectPii is deterministic and class-complete on the real corpus slice") {
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val inj = operators.TextStats.injectPii(base)
    val agg = operators.TextStats.piiScrub(inj)
      .agg(org.apache.spark.sql.functions.sum(col("n_emails")),
        org.apache.spark.sql.functions.sum(col("n_ips")),
        org.apache.spark.sql.functions.sum(col("n_phones")),
        org.apache.spark.sql.functions.sum(col("n_cards")),
        org.apache.spark.sql.functions.sum(col("n_luhn_valid")))
      .collect().head
    // every class present, and some-but-not-all cards Luhn-valid
    (0 to 3).foreach(i => assert(agg.getLong(i) > 0L, s"class $i empty"))
    assert(agg.getLong(4) > 0L && agg.getLong(4) < agg.getLong(3))
  }

  test("plan pin: zero joins — one scan, one aggregate, the presentation sort") {
    val p = SparkEntry.queries("q204_pii_scrub")(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Join"), p)
    assert(p.contains("Aggregate"), p)
    // one agg shuffle + the presentation range sort — nothing else moves
    assert("Exchange".r.findAllIn(p.linesIterator
      .filter(_.matches("""\s*(\+-|:-)?\s*Exchange.*""")).mkString("\n")).size <= 2, p)
  }

  private def scrubExt(rows: (Long, String, String)*) =
    operators.TextStats.piiScrubExtended(docs(rows: _*))
      .collect().map(r => r.getString(0) -> r).toMap

  test("q210: IPv6 full + compressed forms detected; tricky negatives stay clean") {
    val out = scrubExt(
      (1L, "en", "full 2001:db8:85a3:0:8a2e:370:7334:1 here"),
      (2L, "en", "compressed fe80::1:2 and fe80::abcd:1 twice"),
      (3L, "en", "time 12:30:45 and ab:cd and mac aa:bb:cc:dd:ee:ff stay"),
      (4L, "en", "loopback ::1 is out of dialect (not PII)"),
      (5L, "en", "uppercase FE80::1:2 is non-canonical, not detected"))
    val en = out("en")
    assert(en.getAs[Long]("n_ip6") === 3L)
    assert(en.getAs[Long]("docs_with_pii") === 2L)
  }

  test("q210: zone id survives redaction — the address redacts, %eth0 does not") {
    val one = docs((1L, "en", "link-local fe80::1:2%eth0 end"))
    val red = operators.TextStats.piiExtPerDoc(one)
      .select(col("redacted")).collect().head.getString(0)
    assert(red === "link-local <IP6>%eth0 end", red)
  }

  test("q210: IBAN mod-97 discrimination; 14- and 35-char runs are not candidates") {
    val out = scrubExt(
      (1L, "en", "valid GB82WEST12345698765432 ok"),
      (2L, "en", "valid DE89370400440532013000 ok"),
      (3L, "en", "broken-check GB82WEST12345698765431 shaped only"),
      // 14 chars (below the 15 minimum) and 35 chars (above the 34 max):
      // clean negatives — interior starts fail \b, shorter cuts fail \b
      (4L, "en", "short GB82WEST123456 long GB82WEST1234569876543212345678901AB"))
    val en = out("en")
    assert(en.getAs[Long]("n_ibans") === 3L)
    assert(en.getAs[Long]("n_iban_valid") === 2L)
    assert(en.getAs[Long]("docs_with_pii") === 3L)
  }

  test("q210: redaction deltas account every span") {
    val one = docs((1L, "en", "x fe80::9:1 y GB82WEST12345698765432 end"))
    val row = operators.TextStats.piiScrubExtended(one).collect().head
    // '<IP6>'(5) - 9, '<IBAN>'(6) - 22
    assert(row.getAs[Long]("chars_delta") === (5L - 9L) + (6L - 22L))
  }

  test("q210: injectPiiExt is deterministic and class-complete on the real corpus") {
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val agg = operators.TextStats.piiExtPerDoc(
      operators.TextStats.injectPiiExt(base))
      .agg(org.apache.spark.sql.functions.sum(col("n_ip6")),
        org.apache.spark.sql.functions.sum(col("n_ibans")),
        org.apache.spark.sql.functions.sum(col("n_iban_valid")))
      .collect().head
    assert(agg.getLong(0) > 0L && agg.getLong(1) > 0L)
    // some-but-not-all IBANs mod-97-valid (the rotating broken check digit)
    assert(agg.getLong(2) > 0L && agg.getLong(2) < agg.getLong(1))
  }

  test("q210 plan pin: zero joins — one scan, one aggregate, presentation sort") {
    val p = SparkEntry.queries("q210_pii_extended")(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Join"), p)
    assert(p.contains("Aggregate"), p)
    assert("Exchange".r.findAllIn(p.linesIterator
      .filter(_.matches("""\s*(\+-|:-)?\s*Exchange.*""")).mkString("\n")).size <= 2, p)
  }
}
