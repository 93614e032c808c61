package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition pruning on a hive-layout write — the other half of the
  * pushdown story PlanRegressionSpec pins for row-group filters: a corpus
  * partitioned by a categorical column at write time answers
  * single-category queries by never OPENING the other partitions'
  * files, which at 100 TB is the difference between scanning one
  * event type and scanning all of them. */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("filter on the partition column becomes a PartitionFilter, not a scan filter") {
    val out = Files.createTempDirectory("graft-part-").toString
    Tables(spark, "/root/testdata/sf0.001", "events")
      .write.partitionBy("event_type").mode("overwrite").parquet(out)

    val q = spark.read.parquet(out)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.explainString(FormattedMode)
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    assert("PartitionFilters: \\[[^\\]]*= purchase\\)".r.findFirstIn(plan).isDefined, plan)

    // the partition predicate must NOT degrade to a post-scan data filter
    assert(!plan.contains("PushedFilters: [IsNotNull(event_type)"), plan)

    // and the answer matches the unpartitioned read
    val expected = Tables(spark, "/root/testdata/sf0.001", "events")
      .filter(col("event_type") === "purchase").count()
    assert(q.agg(sum(col("n"))).collect()(0).getLong(0) == expected)
  }
}
