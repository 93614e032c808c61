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

  test("q164: salted join matches the plain join and spreads the hot key") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-salt-").toString
    // 90% of events hit user 7 — the hot key the salt must spread
    (1 to 20000).map { i =>
      val u = if (i % 10 == 0) (i % 5) + 1L else 7L
      (i.toLong, i.toLong * 1000, u, "view", (i % 100) / 10.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    (1L to 10L).map(k => (k, s"c$k", 1, 0.0, s"SEG${k % 3}"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")

    val salted = operators.Joins.joinSaltedSkew(spark, dir, salts = 8)
    val plain = graft.Tables(spark, dir, "events")
      .join(graft.Tables(spark, dir, "customer"),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(round(value * 100) as bigint)")).as("value_cents"))
      .orderBy(col("c_mktsegment"))
    assert(salted.collect().toSeq == plain.collect().toSeq)
    // the join itself must be a real shuffle, not a broadcast of the
    // replicated dim — otherwise the salting demo silently degenerates
    val executed = salted.queryExecution.executedPlan.toString
    assert(executed.contains("ShuffledHashJoin"), executed)
    // the hot key's rows land in all 8 salt buckets
    val spread = graft.Tables(spark, dir, "events")
      .filter(col("user_id") === 7L)
      .select(org.apache.spark.sql.functions.pmod(
        graft.functions.TextExpressions.md5Hash60Col(
          concat(col("event_id").cast("string"), lit(":skewsalt"))), lit(8L)))
      .distinct().count()
    assert(spread == 8L, s"hot key only reached $spread of 8 salt buckets")
  }
}
