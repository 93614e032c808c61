package graft

import java.nio.file.{Files, Paths}

import graft.sources.{Prompb, RemoteWrite}
import graft.sources.Prompb.{Sample, TimeSeries}
import graft.streaming.{CollectingSink, RelayPipeline}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 remote-write source (SURVEY §2.1's "proper answer"): sequence-
  * number offsets over the body-file directory protocol, driven through the
  * full relay pipeline (VERDICT r02 next-round item 4). */
class BodyStreamSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def body(series: TimeSeries*): Array[Byte] =
    org.xerial.snappy.Snappy.compress(Prompb.encode(series))

  private def writeBodies(dir: String, bodies: Seq[Array[Byte]], from: Int = 0): Unit =
    bodies.zipWithIndex.foreach { case (b, i) =>
      // frontend convention: write hidden temp, rename into place
      val tmp = Paths.get(dir, f".${from + i}%08d.bin.tmp")
      Files.write(tmp, b)
      Files.move(tmp, Paths.get(dir, f"${from + i}%08d.bin"))
    }

  test("batch read: seq/path/body schema, bodies in arrival order") {
    val dir = Files.createTempDirectory("graft-bodies-").toString
    writeBodies(dir, Seq(
      body(TimeSeries(Map("__name__" -> "a"), Seq(Sample(1.0, 1L)))),
      body(TimeSeries(Map("__name__" -> "b"), Seq(Sample(2.0, 2L))))))
    val df = spark.read.format("remote-write-bodies").load(dir)
    assert(df.columns.toSeq == Seq("seq", "path", "body"))
    val rows = df.orderBy("seq").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    val names = RemoteWrite.fromBodies(df.select("body"))
      .select("name").collect().map(_.getString(0)).sorted.toSeq
    assert(names == Seq("a", "b"))
  }

  test("streaming end-to-end through RelayPipeline with admission control") {
    val dir = Files.createTempDirectory("graft-bodies-").toString
    writeBodies(dir, (1 to 5).map(i =>
      body(TimeSeries(Map("__name__" -> s"m$i", "host" -> "h"),
        Seq(Sample(i.toDouble, i.toLong))))))
    val sink = new CollectingSink
    val q = RelayPipeline.start(spark,
      RemoteWrite.bodyDsv2Stream(spark, dir, maxFilesPerTrigger = 2), sink,
      trigger = Trigger.AvailableNow())
    q.awaitTermination(60000)
    assert(sink.allLines.size == 5)
    assert((1 to 5).forall(i => sink.allLines.exists(_.contains(s""""name":"m$i""""))))
    // maxFilesPerTrigger=2 over 5 bodies ⇒ at least 3 micro-batches
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3)
  }

  test("checkpointed restart resumes at the first unprocessed body, no dupes") {
    val dir = Files.createTempDirectory("graft-bodies-").toString
    val ckpt = Files.createTempDirectory("graft-ckpt-").toString
    writeBodies(dir, Seq(body(TimeSeries(Map("__name__" -> "x"), Seq(Sample(1.0, 1L))))))
    val sink1 = new CollectingSink
    val q1 = RelayPipeline.start(spark,
      RemoteWrite.bodyDsv2Stream(spark, dir), sink1,
      trigger = Trigger.AvailableNow(), checkpointDir = Some(ckpt))
    q1.awaitTermination(60000)
    assert(sink1.allLines.size == 1)

    writeBodies(dir, Seq(body(TimeSeries(Map("__name__" -> "y"), Seq(Sample(2.0, 2L))))),
      from = 1)
    val sink2 = new CollectingSink
    val q2 = RelayPipeline.start(spark,
      RemoteWrite.bodyDsv2Stream(spark, dir), sink2,
      trigger = Trigger.AvailableNow(), checkpointDir = Some(ckpt))
    q2.awaitTermination(60000)
    // only the new body — offset seq=1 was committed by the first run
    assert(sink2.allLines.size == 1)
    assert(sink2.allLines.head.contains(""""name":"y""""))
  }

  test("offset json roundtrips, including the legacy plain-number form") {
    import graft.sources.BodySeqOffset
    val o = BodySeqOffset(7L, """we"ird\name.bin""")
    assert(BodySeqOffset.parse(o.json()) == o)
    assert(BodySeqOffset.parse("42") == BodySeqOffset(42L, "")) // pre-hwm checkpoint
    assert(BodySeqOffset.parse(BodySeqOffset(0L, "").json()) == BodySeqOffset(0L, ""))
  }

  test("offset contract: deletion and non-monotonic names fail loudly") {
    import graft.sources.{BodySeqOffset, BodyStream}
    val dir = Files.createTempDirectory("graft-bodies-").toString
    writeBodies(dir, (0 until 3).map(i =>
      body(TimeSeries(Map("__name__" -> s"m$i"), Seq(Sample(i.toDouble, i.toLong))))))
    val committed = BodySeqOffset(3L, BodyStream.list(dir).last)
    BodyStream.validateBoundary(BodyStream.list(dir), committed, dir) // current dir: fine

    // a file sorting BEFORE the high-water mark re-maps index 2 → loud failure
    Files.write(Paths.get(dir, "00000001a.bin"), Array[Byte](1))
    val e1 = intercept[IllegalStateException](
      BodyStream.validateBoundary(BodyStream.list(dir), committed, dir))
    assert(e1.getMessage.contains("high-water mark"))
    Files.delete(Paths.get(dir, "00000001a.bin"))

    // deleting a processed file shrinks the listing below the offset
    Files.delete(Paths.get(dir, "00000000.bin"))
    val e2 = intercept[IllegalStateException](
      BodyStream.validateBoundary(BodyStream.list(dir), committed, dir))
    assert(e2.getMessage.contains("deleted"))
  }
}
