package graft.streaming

import graft.sources.RemoteWrite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** CLI entry point — the Spark form of the reference's `main()`
  * (`/root/reference/main.go:70-119`): flag parsing, writer selection,
  * stream lifecycle. Ingest is the production shape from SURVEY.md §2.1:
  * a frontend appends each remote-write POST body as a file under --in.
  *
  * Usage:
  *   graft.streaming.RelayMain --in <bodiesDir> --out <sinkDir>
  *     [--stream-name metrics]        (main.go:74 -stream-name)
  *     [--firehose]                   (main.go:71 -firehose)
  *     [--write-interval 10]          (main.go:75, seconds; 0 = drain-and-exit)
  *     [--source dsv2|files]          ingest source: the custom DSv2
  *                                    sequence-offset source (default) or
  *                                    the generic binaryFile stream
  *     [--listen-addr 9501]           also serve POST /receive on this port
  *                                    (main.go:73 -listen-addr), appending
  *                                    each accepted body to --in — the full
  *                                    reference shape in one process
  *     [--region <aws-region>]        AWS region for the sink client
  *                                    (main.go:74 -region; defaults to
  *                                    $AWS_REGION like the reference)
  *
  * That is all five reference flags (-firehose, -stream-name, -listen-addr,
  * -region, -write-interval) plus the Spark-side ingest/source knobs.
  */
object RelayMain {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 1).collect {
      case Array(k, v) if k.startsWith("--") => k -> v
    }.toMap
    val inDir = opts.getOrElse("--in", sys.error("--in <bodiesDir> required"))
    val outDir = opts.getOrElse("--out", sys.error("--out <sinkDir> required"))
    // stream-name required, like main.go:79-81
    val streamName = opts.getOrElse("--stream-name", "metrics")
    val firehose = args.contains("--firehose")
    val intervalSec = opts.getOrElse("--write-interval", "10").toInt
    // Without a checkpoint the binaryFile source restarts from scratch and
    // re-delivers every historical body after a crash; default one under the
    // sink dir so restarts resume instead of duplicating.
    val checkpoint = opts.getOrElse("--checkpoint", s"$outDir/_checkpoint")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-relay")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val region = opts.getOrElse("--region", RecordSink.defaultRegion)
    val sink: RecordSink =
      if (firehose) new FirehoseFileSink(outDir, streamName, region)
      else new KinesisFileSink(outDir, streamName, region)
    val trigger =
      if (intervalSec == 0) Trigger.AvailableNow()
      else Trigger.ProcessingTime(s"$intervalSec seconds")

    val frontend = opts.get("--listen-addr").map { port =>
      val f = new graft.sources.HttpFrontend(inDir, port.toInt)
      f.start()
      f
    }

    val bodies = opts.getOrElse("--source", "dsv2") match {
      case "files" => RemoteWrite.bodyDirStream(spark, inDir)
      case _ => RemoteWrite.bodyDsv2Stream(spark, inDir)
    }
    // finally-stop the frontend and Spark even when the stream dies with an
    // exception: the frontend's non-daemon pool would otherwise pin the JVM
    // alive after main unwinds
    try {
      val q = RelayPipeline.start(spark, bodies,
        sink, firehose = firehose, trigger = trigger,
        checkpointDir = Some(checkpoint))
      if (intervalSec == 0) { q.processAllAvailable(); q.stop() }
      else q.awaitTermination()
    } finally {
      frontend.foreach(_.stop())
      spark.stop()
    }
  }
}
