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
    // ADVICE r19: the legacy guard must route Unicode digits (isDigit
    // accepts them, toLong does not) and Long overflow through the TYPED
    // "unrecognized offset" error, never a raw NumberFormatException
    for (bad <- Seq("٤٢" /* Arabic-Indic 42 */,
                    "99999999999999999999" /* > Long.MaxValue */)) {
      val e = intercept[IllegalArgumentException](BodySeqOffset.parse(bad))
      assert(e.getMessage.contains("unrecognized"), s"for input '$bad': $e")
    }
  }

  private def threeBodies(dir: String): Unit =
    writeBodies(dir, (0 until 3).map(i =>
      body(TimeSeries(Map("__name__" -> s"m$i"), Seq(Sample(i.toDouble, i.toLong))))))

  test("offset contract: boundaryIndex re-anchors across front-to-back archival") {
    import graft.sources.{BodySeqOffset, BodyStream}
    val dir = Files.createTempDirectory("graft-bodies-").toString
    threeBodies(dir)
    val committed = BodySeqOffset(3L, BodyStream.list(dir).last)
    assert(BodyStream.boundaryIndex(BodyStream.list(dir), committed, dir) == 3)

    // archiving processed bodies front-to-back is LEGAL: the hwm re-anchors
    // the index→file mapping instead of failing (the round-7 contract change
    // that obsoleted the old deletion-refusal case)
    Files.delete(Paths.get(dir, "00000000.bin"))
    assert(BodyStream.boundaryIndex(BodyStream.list(dir), committed, dir) == 2)
    Files.delete(Paths.get(dir, "00000001.bin"))
    assert(BodyStream.boundaryIndex(BodyStream.list(dir), committed, dir) == 1)

    // unprocessed bodies sort after the hwm and never shift the anchor
    writeBodies(dir, Seq(body(TimeSeries(Map("__name__" -> "m3"),
      Seq(Sample(3.0, 3L))))), from = 3)
    assert(BodyStream.boundaryIndex(BodyStream.list(dir), committed, dir) == 1)

    // full drain (hwm archived along with everything before it) anchors at 0
    Files.delete(Paths.get(dir, "00000002.bin"))
    assert(BodyStream.boundaryIndex(BodyStream.list(dir), committed, dir) == 0)
  }

  test("offset contract: hwm archived while earlier files remain fails loudly") {
    import graft.sources.{BodySeqOffset, BodyStream}
    val dir = Files.createTempDirectory("graft-bodies-").toString
    threeBodies(dir)
    val committed = BodySeqOffset(3L, BodyStream.list(dir).last)
    Files.delete(Paths.get(dir, "00000002.bin")) // hwm gone, 0 and 1 remain
    val e = intercept[IllegalStateException](
      BodyStream.boundaryIndex(BodyStream.list(dir), committed, dir))
    assert(e.getMessage.contains("front-to-back"))
  }

  test("offset contract: non-monotonic name insertion fails loudly") {
    import graft.sources.{BodySeqOffset, BodyStream}
    val dir = Files.createTempDirectory("graft-bodies-").toString
    threeBodies(dir)
    val committed = BodySeqOffset(3L, BodyStream.list(dir).last)
    // a file sorting BEFORE the high-water mark re-maps committed indices
    Files.write(Paths.get(dir, "00000001a.bin"), Array[Byte](1))
    val e = intercept[IllegalStateException](
      BodyStream.boundaryIndex(BodyStream.list(dir), committed, dir))
    assert(e.getMessage.contains("non-monotonic"))
  }

  test("offset contract: legacy plain-number offsets keep the append-only rule") {
    import graft.sources.{BodySeqOffset, BodyStream}
    val dir = Files.createTempDirectory("graft-bodies-").toString
    threeBodies(dir)
    val legacy = BodySeqOffset(3L, "") // pre-hwm checkpoint: no anchor name
    assert(BodyStream.boundaryIndex(BodyStream.list(dir), legacy, dir) == 3)
    // with no hwm to re-anchor on, archival is indistinguishable from loss
    Files.delete(Paths.get(dir, "00000000.bin"))
    val e = intercept[IllegalStateException](
      BodyStream.boundaryIndex(BodyStream.list(dir), legacy, dir))
    assert(e.getMessage.contains("deleted or compacted"))
  }

  test("idle trigger upgrades a legacy hwm-less offset to the anchored form") {
    import graft.sources.{BodySeqOffset, BodyStream => BS}
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = Files.createTempDirectory("graft-bodies-").toString
    threeBodies(dir)
    val stream = new graft.sources.BodyMicroBatchStream(dir,
      maxFilesPerTrigger = 1000, filesPerPartition = 100)
    // pre-hwm checkpoint, already caught up: an idle trigger must anchor
    // hwm = listing(seq-1) instead of leaving the weaker length-only check
    // (and archival ineligibility) in place until new bodies arrive
    val upgraded = stream.latestOffset(BodySeqOffset(3L, ""), ReadLimit.allAvailable())
      .asInstanceOf[BodySeqOffset]
    assert(upgraded === BodySeqOffset(3L, BS.list(dir).last, 0L))
    // a NON-idle legacy trigger anchors on the newly admitted hwm as before
    writeBodies(dir, Seq(body(TimeSeries(Map("__name__" -> "m3"),
      Seq(Sample(3.0, 3L))))), from = 3)
    val advanced = stream.latestOffset(BodySeqOffset(3L, ""), ReadLimit.allAvailable())
      .asInstanceOf[BodySeqOffset]
    assert(advanced === BodySeqOffset(4L, BS.list(dir).last, 0L))
  }

  test("archiver honors the published floor; restart resumes past archived bodies") {
    import graft.sources.{BodySeqOffset, BodyStream}
    val dir = Files.createTempDirectory("graft-bodies-").toString
    val ckpt = Files.createTempDirectory("graft-ckpt-").toString
    writeBodies(dir, Seq(
      body(TimeSeries(Map("__name__" -> "old1"), Seq(Sample(1.0, 1L)))),
      body(TimeSeries(Map("__name__" -> "old2"), Seq(Sample(2.0, 2L))))))
    val sink1 = new CollectingSink
    // maxFilesPerTrigger=1 forces ≥2 micro-batches: Spark invokes
    // source.commit(N) when batch N+1 starts, so a single-batch AvailableNow
    // run terminates before any floor is published (the marker lags the
    // checkpoint by one batch — conservative, safe for the archiver)
    val q1 = RelayPipeline.start(spark,
      RemoteWrite.bodyDsv2Stream(spark, dir, maxFilesPerTrigger = 1), sink1,
      trigger = Trigger.AvailableNow(), checkpointDir = Some(ckpt))
    q1.awaitTermination(60000)
    assert(sink1.allLines.size == 2)

    // archive exactly what the published floor covers, front-to-back
    val floorPath = Paths.get(dir, "_archive_floor")
    assert(Files.exists(floorPath))
    val floor = BodySeqOffset.parse(Files.readString(floorPath))
    assert(floor.seq >= 1L && floor.hwm.nonEmpty)
    BodyStream.list(dir).takeWhile(_ <= floor.hwm)
      .foreach(f => Files.delete(Paths.get(dir, f)))

    writeBodies(dir, Seq(body(TimeSeries(Map("__name__" -> "fresh"),
      Seq(Sample(3.0, 3L))))), from = 2)

    val sink2 = new CollectingSink
    val q2 = RelayPipeline.start(spark,
      RemoteWrite.bodyDsv2Stream(spark, dir), sink2,
      trigger = Trigger.AvailableNow(), checkpointDir = Some(ckpt))
    q2.awaitTermination(60000)
    // exactly the new body — no replay attempt against archived files
    assert(sink2.allLines.size == 1)
    assert(sink2.allLines.head.contains(""""name":"fresh""""))
  }
}
