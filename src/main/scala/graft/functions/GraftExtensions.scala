package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Canonical library integration point: register graft's native expressions
  * through `SparkSessionExtensions`, so any session can opt in with
  *
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *
  * (or programmatically via `SparkSession.builder.withExtensions`). This is
  * the supported mechanism for shipping planner/function extensions in a
  * library — no session mutation, works on a cluster where sessions are
  * built from config alone. `RelayExpressions.register` remains for ad-hoc
  * registration on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[RelayExpressions.type].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("snappy_decompress"),
      info("snappy_decompress", "snappy_decompress(binary) - snappy-decompress a body; null on corrupt input"),
      (es: Seq[Expression]) => SnappyDecompress(es.head)))
    ext.injectFunction((
      FunctionIdentifier("prompb_decode"),
      info("prompb_decode", "prompb_decode(binary) - decode a prometheus remote-write WriteRequest; null on corrupt input"),
      (es: Seq[Expression]) => PrompbDecode(es.head)))
    ext.injectFunction((
      FunctionIdentifier("token_shingles"),
      info("token_shingles", "token_shingles(text) - token 3-grams of a space-separated string"),
      (es: Seq[Expression]) => TokenShingles(es.head, 3)))
    ext.injectFunction((
      FunctionIdentifier("simhash60"),
      info("simhash60", "simhash60(text) - 60-bit simhash of a space-separated string"),
      (es: Seq[Expression]) => SimHash64(es.head, 60)))
    ext.injectFunction((
      FunctionIdentifier("md5_hash60"),
      info("md5_hash60", "md5_hash60(s) - first 60 md5 bits as bigint; ≡ conv(substring(md5(s),1,15),16,10)"),
      (es: Seq[Expression]) => Md5Hash60(es.head)))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two array<double> vectors"),
      (es: Seq[Expression]) => DotProduct(es.head, es(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_sumsq"),
      info("vec_sumsq", "vec_sumsq(a) - sum of squares of an array<double> vector"),
      (es: Seq[Expression]) => SumOfSquares(es.head)))
    // Interpreted HOF vector folds → fused native expressions (bit-identical).
    ext.injectOptimizerRule(_ => VectorRewrite)
    // First-class as-of join operator (custom LogicalPlan -> SparkPlan).
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
