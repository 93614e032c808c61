package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Co-located (zero-shuffle) join via bucketed tables — the deployment
  * story the Joins scaladoc promises ("the partitioning a real deployment
  * would bucket both tables on to eliminate the shuffle entirely").
  *
  * At 100 TB the orders ⋈ lineitem sort-merge join shuffles BOTH fact
  * tables on every run; bucketing both by the join key at write time moves
  * that shuffle to ingestion, once. This spec materializes both tables
  * bucketed by the key and proves the plan property that matters: the
  * join runs with NO Exchange on either side, while the identical join
  * over plain parquet shuffles both.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed orders ⋈ lineitem plans with zero Exchange; unbucketed shuffles") {
    val loc = Files.createTempDirectory("graft-bucketdemo-").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bucketdemo LOCATION '$loc'")
    try {
      Tables(spark, dir, "orders").write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("bucketdemo.orders_b")
      Tables(spark, dir, "lineitem").write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("bucketdemo.lineitem_b")

      val joined = spark.table("bucketdemo.lineitem_b")
        .hint("merge")
        .join(spark.table("bucketdemo.orders_b"),
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey"))
      val plan = joined.queryExecution.explainString(FormattedMode)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)

      // contrast: the same join over plain parquet shuffles both sides
      val plain = Tables(spark, dir, "lineitem").hint("merge")
        .join(Tables(spark, dir, "orders"),
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey"))
        .queryExecution.explainString(FormattedMode)
      assert(plain.contains("Exchange"), plain)

      // and the result is the same either way
      assert(joined.count() ==
        Tables(spark, dir, "lineitem").join(Tables(spark, dir, "orders"),
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey")).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS bucketdemo.lineitem_b")
      spark.sql("DROP TABLE IF EXISTS bucketdemo.orders_b")
      spark.sql("DROP DATABASE IF EXISTS bucketdemo")
    }
  }
}
