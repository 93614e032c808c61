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
  * Env knobs for the state-sizing curve (SURVEY §6.6/§6.7):
  *   SPARK_GRAFT_RATE_PARTITIONS  state partition count (default = CPUS —
  *                                varies the commit fan-out independently
  *                                of executor threads)
  *   SPARK_GRAFT_RATE_CHANGELOG   true ⇒ RocksDB changelog checkpointing:
  *                                each commit uploads the delta instead of
  *                                snapshotting the store; snapshots happen
  *                                in the background every N commits
  *   SPARK_GRAFT_RATE_TOUCH_DIV   touch only series ≡ batch (mod DIV) per
  *                                micro-batch (default 1 = every series
  *                                every batch). DIV>1 is the sparse-update
  *                                regime — total state cardinality stays
  *                                nSeries, but each commit's delta is
  *                                nSeries/DIV, which is where changelog
  *                                checkpointing can actually win
  */
object RateBench {
  def main(args: Array[String]): Unit = {
    val nSeries = args.headOption.map(_.toInt).getOrElse(20000)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(5)
    val perSeries = args.lift(2).map(_.toInt).getOrElse(1)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val partitions = sys.env.getOrElse("SPARK_GRAFT_RATE_PARTITIONS", cpus)
    val changelog = sys.env.get("SPARK_GRAFT_RATE_CHANGELOG").exists(_.toBoolean)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", partitions)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        changelog.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val stream = MemoryStream[CounterSample]
    val q = StreamingRate.rateUpdates(stream.toDS())
      .writeStream.format("noop").outputMode("update").start()

    val touchDiv = sys.env.getOrElse("SPARK_GRAFT_RATE_TOUCH_DIV", "1").toInt
    var samples = 0L
    val t0 = System.nanoTime()
    (0 until nBatches).foreach { b =>
      val batch = (0 until nSeries).filter(_ % touchDiv == b % touchDiv).flatMap { s =>
        (0 until perSeries).map { i =>
          val t = (b.toLong * perSeries + i) * 15000000L // 15 s scrape interval
          CounterSample(s"metric_${s % 100}", s.toLong, t, b * 10.0 + i)
        }
      }
      samples += batch.length
      stream.addData(batch)
      q.processAllAvailable()
    }
    val secs = (System.nanoTime() - t0) / 1e9
    q.stop()

    val line = f"""{"metric":"rate_state_throughput","series":$nSeries,""" +
      f""""batches":$nBatches,"samples":$samples,"partitions":$partitions,""" +
      f""""changelog":$changelog,"touch_div":$touchDiv,"sec":$secs%.3f,""" +
      f""""samples_per_sec":${samples / secs}%.0f}"""
    Files.writeString(Paths.get("rate_bench_out.json"), line + "\n")
    println(line)
    spark.stop()
  }
}
