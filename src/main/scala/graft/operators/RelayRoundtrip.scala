package graft.operators

import graft.{QueryModule, Tables}
import graft.sources.{Prompb, RemoteWrite}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's ENTIRE relay path as one oracle-checked batch query:
  * events → prompb `WriteRequest` bodies (snappy+protobuf, 500 series per
  * body like one remote-write POST) → wire decode → flatten → JSON-lines
  * encode (`/root/reference/kinesis.go:68-93`, `prometheus.go:10-37`,
  * `record.go:9-12`) → re-extract from the JSON and aggregate.
  *
  * The oracle aggregates the SAME stats straight off the source table, so a
  * hash match proves the encode→decode→flatten→encode loop is lossless:
  * every sample survives, timestamps exact (int64), values exact (shortest
  * JSON double repr round-trips bit-exactly).
  *
  * Scale notes: the whole loop is narrow (mapPartitions encode, per-row
  * decode/flatten/encode) — zero shuffles until the final tiny aggregate;
  * identical shape to the production relay (`RelayPipeline`), so this query
  * doubles as the relay-throughput benchmark entry.
  *
  * Considered and rejected (round 5): replacing the encode-side
  * `mapPartitions` with a native expression. Batching 500 series into one
  * body is inherently a partition-level operation — the expression form
  * would need `monotonically_increasing_id() div 500` + `groupBy` +
  * `collect_list`, i.e. a full shuffle of every sample, to feed a
  * per-body encode expression. At 100 TB a shuffle of the entire stream
  * costs far more than the Dataset-encoder object boundary it would
  * remove, so the mapPartitions (zero-shuffle, body built from a local
  * iterator exactly like the reference's channel batches) stays.
  */
object RelayRoundtrip extends QueryModule {

  def roundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // fan-out (opt r20, graft.Par): the testdata's events table is one
    // single-row-group file, so without this the whole encode→decode loop
    // runs as ONE task (stage-profiled ~1.5 s single-core at sf0.1 on
    // local[32]); at production scale the scan splits naturally and
    // fanOut is a no-op — the zero-shuffle shape the scaladoc promises
    // is preserved exactly where it matters
    val bodies = graft.Par.fanOut(Tables(spark, dir, "events")
        .select(col("event_type"), unix_millis(col("ts")).as("tms"),
          col("user_id"), col("value")))
      .as[(String, Long, Long, Double)]
      .mapPartitions { it =>
        // One body per 500 series — the shape of a remote-write POST batch.
        it.grouped(500).map { group =>
          val series = group.map { case (et, tms, uid, v) =>
            Prompb.TimeSeries(
              Map("__name__" -> et, "user" -> uid.toString),
              Seq(Prompb.Sample(v, tms)))
          }
          org.xerial.snappy.Snappy.compress(Prompb.encode(series))
        }
      }.toDF("body")
    RemoteWrite.jsonLines(RemoteWrite.fromBodies(bodies))
      // one from_json parse instead of two get_json_object passes per row
      .select(col("name"),
        from_json(col("json"),
          org.apache.spark.sql.types.StructType.fromDDL("time LONG, value DOUBLE")).as("j"))
      .select(col("name"), col("j.time").as("t"), col("j.value").as("v"))
      .groupBy(col("name"))
      .agg(count(lit(1)).as("n_samples"),
        sum(col("t")).as("sum_time"),
        round(sum(col("v")), 2).as("sum_value"))
      .orderBy(col("name"))
  }

  val queries: Map[String, QueryFn] = Map(
    "q02_relay_roundtrip" -> roundtrip _
  )

  val oracleSql: Map[String, String] = Map(
    "q02_relay_roundtrip" ->
      """SELECT event_type AS name, count(*) AS n_samples,
        |       CAST(sum(epoch_ms(ts)) AS BIGINT) AS sum_time,
        |       round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
