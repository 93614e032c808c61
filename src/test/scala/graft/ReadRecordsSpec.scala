package graft

import java.nio.file.Files

import graft.sources.{Prompb, RemoteWrite}
import graft.sources.Prompb.{Sample, TimeSeries}
import graft.streaming.{KinesisFileSink, RelayPipeline}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Consumer-side loop closure: the records the relay ships are read back
  * with [[RemoteWrite.readRecords]] — explicit record.go schema, null
  * values and label maps intact. */
class ReadRecordsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sink .jsonl files read back with values, nulls, and labels intact") {
    val in = Files.createTempDirectory("graft-rr-in-").toString
    val out = Files.createTempDirectory("graft-rr-out-").toString
    val body = org.xerial.snappy.Snappy.compress(Prompb.encode(Seq(
      TimeSeries(Map("__name__" -> "up", "host" -> "h1"), Seq(Sample(1.5, 10L))),
      TimeSeries(Map("__name__" -> "gap", "host" -> "h2"),
        Seq(Sample(Double.NaN, 20L))), // NaN → "value":null on the wire
      TimeSeries(Map("__name__" -> "empty_series"), Seq()))))
    Files.write(java.nio.file.Paths.get(in, "00000000000000000000.bin"), body)

    val q = RelayPipeline.start(spark,
      RemoteWrite.bodyDsv2Stream(spark, in),
      new KinesisFileSink(out, "metrics"), trigger = Trigger.AvailableNow())
    q.awaitTermination(60000)

    val back = RemoteWrite.readRecords(spark, s"$out/metrics")
    val rows = back.orderBy(col("name")).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("empty_series", "gap", "up"))
    val byName = rows.map(r => r.getString(0) -> r).toMap
    assert(byName("up").getLong(1) == 10L && byName("up").getDouble(2) == 1.5)
    assert(byName("up").getMap[String, String](3)("host") == "h1")
    assert(byName("gap").isNullAt(2)) // null survives the round trip
    assert(byName("empty_series").getLong(1) == 0L) // time=0 preservation row
  }
}
