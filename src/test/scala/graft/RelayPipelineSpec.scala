package graft

import graft.sources.Prompb
import graft.sources.Prompb.{Sample, TimeSeries}
import graft.streaming.{CollectingSink, KinesisFileSink, RelayPipeline, SinkEntry}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming assembly (SURVEY.md §2.4, Phase 2): MemoryStream of
  * snappy+protobuf bodies → RelayPipeline → sinks. Verifies drain-on-stop
  * delivers everything (improving on the reference's lossy SIGTERM path,
  * `/root/reference/main.go:114-119`).
  */
class RelayPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def body(series: TimeSeries*): Array[Byte] =
    org.xerial.snappy.Snappy.compress(Prompb.encode(series))

  test("end-to-end: bodies stream → chunked sink delivery, kinesis keys") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Array[Byte]]
    val sink = new CollectingSink

    // data BEFORE start — AvailableNow latches the end offset at query
    // init, so post-start addData is a race it only wins on a warm
    // session (cold isolated runs lost it; full-suite runs masked it)
    stream.addData(
      body(TimeSeries(Map("__name__" -> "cpu", "host" -> "a"),
        Seq(Sample(0.5, 1000L), Sample(0.6, 2000L)))),
      body(TimeSeries(Map("__name__" -> "mem"), Nil)))
    val q = RelayPipeline.start(spark, stream.toDF().toDF("body"), sink,
      trigger = Trigger.AvailableNow())
    q.processAllAvailable()
    q.stop()

    val lines = sink.allLines
    assert(lines.size == 3)
    assert(lines.count(_.contains("\"name\":\"cpu\"")) == 2)
    assert(lines.count(_.contains("\"name\":\"mem\"")) == 1)
    assert(lines.find(_.contains("mem")).get.contains("\"time\":0,\"value\":null"))
    // Kinesis semantics: partition key = metric name (kinesis.go:174)
    val keys = sink.allBatches.flatten.map(_.partitionKey)
    assert(keys.forall(_.isDefined))
    assert(keys.flatten.toSet == Set("cpu", "mem"))
  }

  test("firehose mode: no partition keys (firehose.go:165-167)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Array[Byte]]
    val sink = new CollectingSink
    stream.addData(body(TimeSeries(Map("__name__" -> "x"), Seq(Sample(1.0, 1L)))))
    val q = RelayPipeline.start(spark, stream.toDF().toDF("body"), sink,
      firehose = true, trigger = Trigger.AvailableNow())
    q.processAllAvailable()
    q.stop()
    assert(sink.allBatches.flatten.forall(_.partitionKey.isEmpty))
    assert(sink.allLines.size == 1)
  }

  test("batch delivery through KinesisFileSink emulation writes JSON-lines files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sink-").toString
    val df = RelayPipeline.records(Seq(
      body(TimeSeries(Map("__name__" -> "disk"), Seq(Sample(9.0, 99L))))).toDF("body"))
    RelayPipeline.deliver(df, new KinesisFileSink(dir, "test-stream"))
    val all = new java.io.File(dir, "test-stream").listFiles()
    // data files are clean jsonl; partition keys live in the dot-prefixed
    // sidecar a Spark glob never sees (kinesis.go:174 shard-key parity)
    val (sidecars, files) = all.partition(_.getName.startsWith("."))
    assert(files.nonEmpty)
    val content = files.map(f =>
      new String(java.nio.file.Files.readAllBytes(f.toPath))).mkString
    assert(content ==
      """{"name":"disk","time":99,"value":9.0,"labels":{"__name__":"disk"}}""" + "\n")
    assert(sidecars.map(f =>
      new String(java.nio.file.Files.readAllBytes(f.toPath))).mkString
      == "\"disk\"\n")
  }

  test("chunking: >500 records in one micro-batch split into ≤500-entry sends") {
    import spark.implicits._
    val manySeries = (1 to 1203).map(i =>
      TimeSeries(Map("__name__" -> s"m$i"), Seq(Sample(i.toDouble, i.toLong))))
    val sink = new CollectingSink
    val df = RelayPipeline.records(
      Seq(body(manySeries: _*)).toDF("body")).coalesce(1)
    RelayPipeline.deliver(df, sink)
    val batches = sink.allBatches
    assert(batches.map(_.size).sum == 1203)
    assert(batches.forall(_.size <= 500))
    assert(batches.exists(_.size == 500))
  }
}
