package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: rewrite the interpreted higher-order-function vector
  * folds into the fused native expressions —
  *
  *   aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,v) -> acc+v)
  *     ==> vec_dot(a, b)                        ([[DotProduct]])
  *   aggregate(a, 0.0, (acc,x) -> acc+x*x)
  *     ==> vec_sumsq(a)                         ([[SumOfSquares]])
  *
  * Users (and old call sites) writing the idiomatic-but-interpreted HOF
  * form get the compiled loop automatically; the rewrite preserves the
  * exact ascending left-fold order, so results are bit-identical (pinned
  * by `NativeExpressionsSpec` and every similarity oracle hash).
  *
  * Injected via [[GraftExtensions]] (`injectOptimizerRule`) for sessions
  * built from config, or at runtime through
  * `spark.experimental.extraOptimizations`.
  */
object VectorRewrite extends Rule[LogicalPlan] {

  private def isZeroDouble(e: Expression): Boolean = e match {
    case Literal(v, DoubleType) => v == 0.0
    case _ => false
  }

  /** finish lambda is the identity (the default for 3-arg `aggregate`). */
  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      body.exprId == arg.exprId
    case _ => false
  }

  /** merge lambda is (acc, v) -> acc + v (either operand order). */
  private def isPlainSumMerge(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      Set(l.exprId, r.exprId) == Set(acc.exprId, v.exprId)
    case _ => false
  }

  /** zip lambda is (x, y) -> x * y over both zip variables. */
  private def isPairProduct(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      Set(l.exprId, r.exprId) == Set(x.exprId, y.exprId)
    case _ => false
  }

  /** merge lambda is (acc, x) -> acc + x*x. */
  private def isSumSqMerge(f: Expression): Boolean = f match {
    case LambdaFunction(Add(acc1: NamedLambdaVariable,
        Multiply(v1: NamedLambdaVariable, v2: NamedLambdaVariable, _), _),
        Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      acc1.exprId == acc.exprId && v1.exprId == v.exprId && v2.exprId == v.exprId
    case LambdaFunction(Add(Multiply(v1: NamedLambdaVariable, v2: NamedLambdaVariable, _),
        acc1: NamedLambdaVariable, _),
        Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      acc1.exprId == acc.exprId && v1.exprId == v.exprId && v2.exprId == v.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(ZipWith(a, b, zipF), zero, merge, finish)
        if isZeroDouble(zero) && isPairProduct(zipF) &&
          isPlainSumMerge(merge) && isIdentityFinish(finish) =>
      DotProduct(a, b)
    case ArrayAggregate(arr, zero, merge, finish)
        if isZeroDouble(zero) && isSumSqMerge(merge) && isIdentityFinish(finish) =>
      SumOfSquares(arr)
  }
}
