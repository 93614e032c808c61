package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import graft.sources.{BodyStream, HttpFrontend, Prompb, RemoteWrite}
import graft.sources.Prompb.{Sample, TimeSeries}
import graft.streaming.{CollectingSink, RelayPipeline}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The reference's actual entry point, end to end: remote-write POSTs →
  * HTTP frontend → body files → DSv2 source → relay pipeline → sink.
  * Response codes mirror `kinesis.go:68-93` (400 on snappy/proto garbage). */
class HttpFrontendSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def body(series: TimeSeries*): Array[Byte] =
    org.xerial.snappy.Snappy.compress(Prompb.encode(series))

  private def post(port: Int, bytes: Array[Byte]): Int = {
    val client = HttpClient.newHttpClient()
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/receive"))
        .POST(HttpRequest.BodyPublishers.ofByteArray(bytes)).build(),
      HttpResponse.BodyHandlers.discarding()).statusCode()
  }

  test("accepted POSTs land as monotonically named body files; garbage is rejected") {
    val dir = Files.createTempDirectory("graft-http-").toString
    val f = new HttpFrontend(dir, 0)
    f.start()
    try {
      val port = f.boundPort
      assert(post(port, body(TimeSeries(Map("__name__" -> "up"), Seq(Sample(1.0, 10L))))) == 200)
      assert(post(port, "not snappy at all".getBytes) == 400) // kinesis.go:76-81
      assert(post(port, org.xerial.snappy.Snappy.compress(
        Array[Byte](0x7f, 0x7f, 0x7f, 0x7f))) == 400) // kinesis.go:83-87
      assert(post(port, body(TimeSeries(Map("__name__" -> "dn"), Seq(Sample(2.0, 20L))))) == 200)
      val listed = BodyStream.list(dir)
      assert(listed == Vector("00000000000000000000.bin", "00000000000000000001.bin"))
    } finally f.stop()
  }

  test("concurrent POSTs admit in some total order with no gaps, overwrites, or losses") {
    val dir = Files.createTempDirectory("graft-http-").toString
    val f = new HttpFrontend(dir, 0)
    f.start()
    try {
      val port = f.boundPort
      import scala.collection.parallel.CollectionConverters._
      val codes = (1 to 32).par.map(i =>
        post(port, body(TimeSeries(Map("__name__" -> s"c$i"), Seq(Sample(i.toDouble, i.toLong)))))).toList
      assert(codes.forall(_ == 200))
      val listed = BodyStream.list(dir)
      assert(listed == (0 until 32).map(n => f"$n%020d.bin").toVector) // dense, ordered
      // every body survived intact: decode all files, collect metric names
      val names = listed.flatMap(n => Prompb.decode(org.xerial.snappy.Snappy.uncompress(
        Files.readAllBytes(java.nio.file.Paths.get(dir, n)))).map(_.labels("__name__")))
      assert(names.sorted == (1 to 32).map(i => s"c$i").sorted)
    } finally f.stop()
  }

  test("numbering resumes after existing bodies (restart-safe sequence)") {
    val dir = Files.createTempDirectory("graft-http-").toString
    val f1 = new HttpFrontend(dir, 0); f1.start()
    try assert(post(f1.boundPort, body(TimeSeries(Map("__name__" -> "a"), Seq(Sample(1.0, 1L))))) == 200)
    finally f1.stop()
    val f2 = new HttpFrontend(dir, 0); f2.start() // a restarted frontend
    try {
      assert(post(f2.boundPort, body(TimeSeries(Map("__name__" -> "b"), Seq(Sample(2.0, 2L))))) == 200)
      assert(BodyStream.list(dir).last == "00000000000000000001.bin")
    } finally f2.stop()
  }

  test("live trigger: posts during the run are picked up across micro-batches, with observed metrics") {
    val dir = Files.createTempDirectory("graft-http-").toString
    val f = new HttpFrontend(dir, 0)
    f.start()
    try {
      val sink = new CollectingSink
      val q = RelayPipeline.start(spark,
        RemoteWrite.bodyDsv2Stream(spark, dir), sink,
        trigger = Trigger.ProcessingTime("100 milliseconds"))
      try {
        assert(post(f.boundPort, body(TimeSeries(Map("__name__" -> "live1"),
          Seq(Sample(1.0, 1L))))) == 200)
        q.processAllAvailable()
        // NaN value → "value":null on the wire AND in the observed metric
        assert(post(f.boundPort, body(TimeSeries(Map("__name__" -> "live2"),
          Seq(Sample(Double.NaN, 2L))))) == 200)
        q.processAllAvailable()
        assert(sink.allLines.size == 2)
        assert(sink.allLines.exists(_.contains(""""name":"live2"""")))
        val metrics = q.recentProgress.flatMap(p =>
          Option(p.observedMetrics.get("relay")))
        assert(metrics.map(_.getLong(0)).sum == 2) // n_records across batches
        assert(metrics.map(_.getLong(1)).sum == 1) // the NaN→null sample
      } finally q.stop()
    } finally f.stop()
  }

  test("POST /receive to sink lines, through the DSv2 source and relay pipeline") {
    val dir = Files.createTempDirectory("graft-http-").toString
    val f = new HttpFrontend(dir, 0)
    f.start()
    try {
      (1 to 4).foreach { i =>
        assert(post(f.boundPort, body(TimeSeries(
          Map("__name__" -> s"m$i", "host" -> "h1"), Seq(Sample(i.toDouble, i.toLong))))) == 200)
      }
      val sink = new CollectingSink
      val q = RelayPipeline.start(spark,
        RemoteWrite.bodyDsv2Stream(spark, dir), sink, trigger = Trigger.AvailableNow())
      q.awaitTermination(60000)
      assert(sink.allLines.size == 4)
      assert((1 to 4).forall(i => sink.allLines.exists(_.contains(s""""name":"m$i""""))))
    } finally f.stop()
  }
}
