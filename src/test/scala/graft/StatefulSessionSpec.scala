package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** Custom keyed state via `mapGroupsWithState` (SURVEY Structured-Streaming
  * surface): a per-user running counter that survives across micro-batches —
  * the primitive under custom sessionization when `session_window` isn't
  * expressive enough.
  */
class StatefulSessionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("mapGroupsWithState keeps per-key state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, Double)] // (user_id, value)

    val counted = stream.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          val (n0, sum0) = state.getOption.getOrElse((0L, 0.0))
          val batch = rows.toSeq
          val next = (n0 + batch.size, sum0 + batch.map(_._2).sum)
          state.update(next)
          (user, next._1, next._2)
      }

    val q = counted.toDF("user_id", "n", "sum")
      .writeStream.format("memory").queryName("state_test")
      .outputMode(OutputMode.Update()).start()
    try {
      stream.addData((1L, 1.0), (1L, 2.0), (2L, 10.0))
      q.processAllAvailable()
      stream.addData((1L, 3.0)) // state for user 1 must carry (2, 3.0)
      q.processAllAvailable()
    } finally q.stop()

    val last = spark.table("state_test")
      .groupBy("user_id").agg(org.apache.spark.sql.functions.max("n").as("n"),
        org.apache.spark.sql.functions.max("sum").as("sum"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(last(1L) == (3L, 6.0), "user 1: 2 rows in batch 1 + 1 in batch 2, sum 6.0")
    assert(last(2L) == (1L, 10.0))
  }
}
