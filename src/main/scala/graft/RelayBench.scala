package graft

import java.nio.file.{Files, Paths}

import graft.sources.{Prompb, RemoteWrite}
import graft.sources.Prompb.{Sample, TimeSeries}
import graft.streaming.{KinesisFileSink, RelayPipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Relay throughput bench — the number the reference never published
  * (BASELINE.md: its only ceilings are AWS API limits). Generates N
  * remote-write bodies (snappy+prompb, like real `POST /receive` traffic),
  * then times the FULL relay: DSv2 source → decode → flatten → JSON-lines
  * → chunked sink files. Prints one JSON line with bodies/s and samples/s.
  *
  * Usage: runMain graft.RelayBench [nBodies] [seriesPerBody]
  * (defaults 2000 × 100 = 200k samples). The generation step is untimed.
  * Env: SPARK_GRAFT_RELAY_DELIVERY=exactly-once swaps in the idempotent
  * batch=<id> sink to measure the cost of the exactly-once layout.
  */
object RelayBench {
  def main(args: Array[String]): Unit = {
    val nBodies = args.headOption.map(_.toInt).getOrElse(2000)
    val seriesPerBody = args.lift(1).map(_.toInt).getOrElse(100)
    val dir = Files.createTempDirectory("relay-bench-in-").toString
    val outDir = Files.createTempDirectory("relay-bench-out-").toString

    (0 until nBodies).foreach { b =>
      val series = (0 until seriesPerBody).map { s =>
        TimeSeries(
          Map("__name__" -> s"metric_${s % 50}", "host" -> s"h${b % 16}", "idx" -> s.toString),
          Seq(Sample(b * 1.5 + s, b.toLong * 1000 + s)))
      }
      Files.write(Paths.get(dir, f"$b%020d.bin"),
        org.xerial.snappy.Snappy.compress(Prompb.encode(series)))
    }

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val delivery = sys.env.getOrElse("SPARK_GRAFT_RELAY_DELIVERY", "at-most-once")
    val sink: graft.streaming.RecordSink = delivery match {
      case "exactly-once" => new graft.streaming.ExactlyOnceFileSink(outDir, "bench")
      case _ => new KinesisFileSink(outDir, "bench")
    }
    val samples = nBodies.toLong * seriesPerBody
    val t0 = System.nanoTime()
    val q = RelayPipeline.start(spark,
      RemoteWrite.bodyDsv2Stream(spark, dir, maxFilesPerTrigger = nBodies),
      sink, trigger = Trigger.AvailableNow())
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9

    val line = f"""{"metric":"relay_throughput","bodies":$nBodies,"samples":$samples,""" +
      f""""delivery":"$delivery","sec":$secs%.3f,"bodies_per_sec":${nBodies / secs}%.0f,""" +
      f""""samples_per_sec":${samples / secs}%.0f}"""
    Files.writeString(Paths.get("relay_bench_out.json"), line + "\n")
    println(line)
    spark.stop()
  }
}
