package graft

import org.scalatest.funsuite.AnyFunSuite

/** The iterative graph family's size-gated broadcast (VERDICT r19's q153
  * watch item): the frontier/label/survivor/closure frames broadcast only
  * when a MEASURED row count says the graph is catalog-sized; above the
  * limit every operator falls back to plain equi-joins with the edge side
  * pre-partitioned once on the loop's join key. The fallback must be a
  * pure strategy change — this spec runs each operator on REAL testdata
  * with `broadcastRowLimit = 0` (forcing the shuffle path) and pins
  * row-exact parity with the default (broadcast) path.
  */
class GraphScaleJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("q153 label-prop: shuffle path == broadcast path on real testdata") {
    assert(rows(operators.WarehouseOps.graphLabelProp(spark, dir, broadcastRowLimit = 0L))
      === rows(operators.WarehouseOps.graphLabelProp(spark, dir)))
  }

  test("q148 k-hop BFS: shuffle path == broadcast path on real testdata") {
    assert(rows(operators.WarehouseOps.graphKhop(spark, dir, broadcastRowLimit = 0L))
      === rows(operators.WarehouseOps.graphKhop(spark, dir)))
  }

  test("q182 k-core peel: shuffle path == broadcast path on real testdata") {
    assert(rows(operators.WarehouseOps.graphKcore(spark, dir, broadcastRowLimit = 0L))
      === rows(operators.WarehouseOps.graphKcore(spark, dir)))
  }

  test("q147 triangles: shuffle closure probe == broadcast probe on real testdata") {
    assert(rows(operators.WarehouseOps.graphTriangles(spark, dir, broadcastRowLimit = 0L))
      === rows(operators.WarehouseOps.graphTriangles(spark, dir)))
  }
}
