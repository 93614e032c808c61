package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling — the runtime complement to q54's static
  * salting: with adaptive execution on, a sort-merge join whose shuffle
  * has one oversized partition gets that partition SPLIT at runtime
  * (multiple reducers each join a slice of the hot key against a
  * replicated other side), with no query rewrite at all. This spec forces
  * tiny skew thresholds, joins a corpus that is 90% one key, and asserts
  * the executed plan actually took the skew path (`skew=true`). */
class SkewJoinAqeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the skewed partition of a sort-merge join at runtime") {
    val dir = Files.createTempDirectory("graft-skew-").toString
    import spark.implicits._
    // 90% of the fact side is key 0 — the canonical hot-key shape
    (1 to 200000).map(i => (if (i % 10 == 0) i % 50 else 0L, s"payload-$i"))
      .toDF("k", "v").write.mode("overwrite").parquet(s"$dir/fact")
    (0L to 49L).map(k => (k, s"dim-$k")).toDF("k", "d")
      .write.mode("overwrite").parquet(s"$dir/dim")

    withConf(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.read.parquet(s"$dir/fact")
        .join(spark.read.parquet(s"$dir/dim"), "k")
      // collect() drives THIS Dataset's query execution, so the adaptive
      // plan below is the final one that actually ran (count() would spawn
      // a separate execution and leave this plan unexecuted)
      assert(joined.collect().length == 200000)
      val executed = joined.queryExecution.executedPlan.toString
      assert(executed.contains("isFinalPlan=true"), executed)
      assert(executed.contains("skew=true"), executed)
    }
  }
}
