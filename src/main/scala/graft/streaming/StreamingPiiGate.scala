package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming PII gate — batch q204's continuous twin, and the hygiene
  * stage of the streaming corpus pipeline (quality gate → dedup →
  * [[StreamingClassifier]] serving): detect and REDACT emails / IPv4s /
  * phones / card numbers in-flight, and publish per-pane per-language
  * detection counts for the privacy dashboard.
  *
  * Detection/redaction is [[graft.operators.TextStats.piiPerDoc]] — the
  * EXACT rule batch q204 aggregates (one rule, two consumers: the
  * q47/q189 single-constant discipline), and it is STATELESS, so
  * [[scrub]] streams as a pure per-row map: no state store, no shuffle,
  * every micro-batch encodes at scan parallelism — at 100 TB/day this
  * stage adds zero coordination, which is why real ingest pipelines run
  * the PII pass first. [[paneCounts]] is the only stateful piece: a
  * watermarked event-time window aggregate whose state is one row per
  * (pane, lang) — bounded by time, not data. */
object StreamingPiiGate {

  /** Redacted doc stream: input columns plus per-class counts,
    * `n_luhn_valid`, and `redacted`. Works on batch frames too (it is
    * the batch rule verbatim). */
  def scrub(docs: DataFrame): DataFrame =
    graft.operators.TextStats.piiPerDoc(docs)

  /** Per-(event-time pane, lang) detection counts off the scrubbed
    * stream: docs seen, docs carrying any PII, per-class totals. Late
    * rows beyond the watermark are dropped (append-mode semantics); a
    * pane finalizes when the watermark passes its end. */
  def paneCounts(docs: DataFrame, watermarkDelay: String = "10 seconds",
                 pane: String = "1 minute"): DataFrame =
    scrub(docs)
      .withWatermark("ingest_ts", watermarkDelay)
      .groupBy(window(col("ingest_ts"), pane), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_emails") + col("n_ips") + col("n_phones")
          + col("n_cards") > 0, 1L).otherwise(0L)).as("docs_with_pii"),
        sum(col("n_emails")).cast("long").as("n_emails"),
        sum(col("n_ips")).cast("long").as("n_ips"),
        sum(col("n_phones")).cast("long").as("n_phones"),
        sum(col("n_cards")).cast("long").as("n_cards"),
        sum(col("n_luhn_valid")).cast("long").as("n_luhn_valid"))

  /** Extended-class twin — batch q210's rule verbatim
    * ([[graft.operators.TextStats.piiExtPerDoc]]): IPv6 + IBAN-shaped
    * detection with the mod-97-valid subset, stateless like [[scrub]],
    * so it streams as the same zero-coordination per-row map. */
  def scrubExtended(docs: DataFrame): DataFrame =
    graft.operators.TextStats.piiExtPerDoc(docs)

  /** [[paneCounts]] for the extended classes. */
  def paneCountsExtended(docs: DataFrame, watermarkDelay: String = "10 seconds",
                         pane: String = "1 minute"): DataFrame =
    scrubExtended(docs)
      .withWatermark("ingest_ts", watermarkDelay)
      .groupBy(window(col("ingest_ts"), pane), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_ip6") + col("n_ibans") > 0, 1L).otherwise(0L))
          .as("docs_with_pii"),
        sum(col("n_ip6")).cast("long").as("n_ip6"),
        sum(col("n_ibans")).cast("long").as("n_ibans"),
        sum(col("n_iban_valid")).cast("long").as("n_iban_valid"))
}
