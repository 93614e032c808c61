package graft

import java.nio.file.{Files, Paths}

import graft.streaming.{CounterSample, StreamingRate}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming-state throughput bench for the `transformWithState` layer:
  * pushes a high-cardinality counter stream (S series × B micro-batches)
  * through [[StreamingRate.rateUpdates]] on the RocksDB state store and
  * prints one JSON line with samples/s. Measures the property that matters
  * at production cardinality: per-batch cost is the state lookup+update of
  * the touched series, with state held OFF-HEAP by RocksDB — the same
  * shape a 1000-executor deployment runs, minus the network.
  *
  * Usage: runMain graft.RateBench [nSeries] [nBatches] [samplesPerSeries]
  * (defaults 20000 × 5 × 1 = 100k state updates across 5 commits).
  */
object RateBench {
  def main(args: Array[String]): Unit = {
    val nSeries = args.headOption.map(_.toInt).getOrElse(20000)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(5)
    val perSeries = args.lift(2).map(_.toInt).getOrElse(1)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val stream = MemoryStream[CounterSample]
    val q = StreamingRate.rateUpdates(stream.toDS())
      .writeStream.format("noop").outputMode("update").start()

    val samples = nSeries.toLong * nBatches * perSeries
    val t0 = System.nanoTime()
    (0 until nBatches).foreach { b =>
      stream.addData((0 until nSeries).flatMap { s =>
        (0 until perSeries).map { i =>
          val t = (b.toLong * perSeries + i) * 15000000L // 15 s scrape interval
          CounterSample(s"metric_${s % 100}", s.toLong, t, b * 10.0 + i)
        }
      })
      q.processAllAvailable()
    }
    val secs = (System.nanoTime() - t0) / 1e9
    q.stop()

    val line = f"""{"metric":"rate_state_throughput","series":$nSeries,""" +
      f""""batches":$nBatches,"samples":$samples,"sec":$secs%.3f,""" +
      f""""samples_per_sec":${samples / secs}%.0f}"""
    Files.writeString(Paths.get("rate_bench_out.json"), line + "\n")
    println(line)
    spark.stop()
  }
}
