package graft

import graft.functions.{DotProduct, SumOfSquares, VectorRewrite}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The HOF-fold → native-expression optimizer rule: plans written with
  * `aggregate(zip_with(...))` get [[graft.functions.DotProduct]] /
  * [[graft.functions.SumOfSquares]] automatically, with bit-identical
  * results. Injected here via `spark.experimental.extraOptimizations`
  * (the runtime path); config-built sessions get it from
  * `GraftExtensions.injectOptimizerRule`.
  */
class VectorRewriteSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    if (!s.experimental.extraOptimizations.contains(VectorRewrite))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ VectorRewrite
    s
  }

  // parquet-backed so ConvertToLocalRelation can't constant-fold the plan
  // away before the assertion sees it
  private def hofDf = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    .select(col("vec_id"),
      col("embedding").cast("array<double>").as("a"),
      reverse(col("embedding").cast("array<double>")).as("b"))
    .withColumn("dot",
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x))
    .withColumn("sumsq",
      aggregate(col("a"), lit(0.0), (acc, x) => acc + x * x))

  test("HOF folds are rewritten to DotProduct / SumOfSquares in the optimized plan") {
    val optimized = hofDf.queryExecution.optimizedPlan
    val exprs = optimized.expressions.flatMap(_.collect {
      case d: DotProduct => d
      case s: SumOfSquares => s
    })
    assert(exprs.exists(_.isInstanceOf[DotProduct]), optimized.toString)
    assert(exprs.exists(_.isInstanceOf[SumOfSquares]), optimized.toString)
    assert(!optimized.toString.contains("aggregate("), optimized.toString)
  }

  test("rewritten results are bit-identical to the explicit native expressions") {
    import graft.functions.VectorExpressions
    val rows = hofDf
      .withColumn("dotN", VectorExpressions.dotProduct(col("a"), col("b")))
      .withColumn("sumsqN", VectorExpressions.sumOfSquares(col("a")))
      .select("dot", "dotN", "sumsq", "sumsqN").collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getDouble(2) == r.getDouble(3))
    }
  }
}
