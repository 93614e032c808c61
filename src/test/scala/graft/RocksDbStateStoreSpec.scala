package graft

import java.sql.Timestamp

import graft.streaming.StreamingAsOf
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Production state-backend compatibility: the stream-stream as-of join on
  * the RocksDB state store provider — the backend a 1000-executor
  * deployment actually runs (bounded JVM heap; state spills to local SSD
  * instead of executor memory). The operator must not depend on anything
  * HDFSBackedStateStore-specific: same results as the default-provider run
  * in [[StreamingAsOfSpec]]. */
class RocksDbStateStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("streaming as-of join is exact on the RocksDB state store") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val quotes = MemoryStream[(Long, Timestamp, Double)]
      val orders = MemoryStream[(Long, Timestamp, Long)]
      val joined = StreamingAsOf.join(
        orders.toDS().toDF("user_id", "ots", "order_id"),
        quotes.toDS().toDF("q_user", "qts", "price"),
        leftKey = "user_id", leftTs = "ots", leftId = "order_id",
        rightKey = "q_user", rightTs = "qts", rightVal = "price",
        delay = "5 seconds", idleTtlMs = 10000L)
      val q = joined.writeStream.format("memory").queryName("asof_rocksdb")
        .outputMode("append").start()
      try {
        quotes.addData((1L, ts(100), 1.0), (1L, ts(200), 2.0))
        orders.addData((1L, ts(150), 10L), (2L, ts(250), 20L))
        q.processAllAvailable()
        quotes.addData((1L, ts(300), 3.0))
        orders.addData((1L, ts(350), 30L))
        q.processAllAvailable()
        quotes.addData((3L, ts(400), 0.0))
        q.processAllAvailable()
        quotes.addData((3L, ts(500), 0.0))
        q.processAllAvailable()
        val got = spark.table("asof_rocksdb").collect()
          .map(r => r.getLong(1) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
        // same scenario + expectations as the default-backend spec
        assert(got === Map(10L -> Some(1.0), 20L -> None, 30L -> Some(3.0)))
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
