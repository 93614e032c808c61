package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text expressions for the dedup family's hot path.
  *
  * The round-2/3 shingle pipeline was
  * `transform(sequence(0, size(toks)-3), i -> concat_ws(...))` — Spark
  * evaluates higher-order-function lambdas INTERPRETED, one closure call
  * per element, and the measured cost at sf0.1 was ~4 s of single-task CPU
  * for 260k shingles (the whole q60 budget). [[TokenShingles]] is the same
  * computation as a compiled one-pass expression: split once, one
  * StringBuilder per shingle, direct `GenericArrayData` output, and a
  * single static call in whole-stage codegen — the same
  * built-in > native-Expression > UDF ladder the relay decode follows
  * ([[RelayExpressions]]).
  *
  * Semantics match the HOF pipeline exactly (and DuckDB's
  * `string_split`): split on single space KEEPING empty tokens, n-gram
  * joined by single spaces, docs with fewer than n tokens yield an empty
  * array.
  */
object TextExpressions {

  /** Static worker shared by interpreted eval and generated code. */
  def shingles(text: UTF8String, n: Int): GenericArrayData = {
    val toks = text.toString.split(" ", -1)
    val count = toks.length - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  def tokenShingles(c: Column, n: Int): Column =
    ColumnBridge.column(TokenShingles(ColumnBridge.expression(c), n))

  /** Optional SQL surface: `SELECT token_shingles(text, 3)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_shingles",
      es => TokenShingles(es.head, 3), "scala_udf")
}

/** Token n-grams of a space-separated string as a codegen'd unary
  * expression: string → array<string>, empty array when under n tokens. */
case class TokenShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextExpressions.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextExpressions.shingles($c, $n);""")

  override protected def withNewChildInternal(newChild: Expression): TokenShingles =
    copy(child = newChild)
}
