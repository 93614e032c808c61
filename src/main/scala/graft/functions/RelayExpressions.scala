package graft.functions

import graft.sources.Prompb
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the two genuinely black-box relay steps
  * (SURVEY §2.1: snappy, protobuf). These replace the round-1 Scala UDFs —
  * the preference ladder is built-in > native `Expression` (codegen) > UDF:
  *
  *   - [[SnappyDecompress]] participates in whole-stage codegen via
  *     `doGenCode` (a static-call one-liner, no lambda/serde overhead);
  *   - [[PrompbDecode]] builds Catalyst internal data (UTF8String /
  *     ArrayBasedMapData / GenericArrayData) DIRECTLY in `eval`, skipping
  *     the UDF's encoder round-trip through external Scala objects
  *     (Map/Seq/case classes), and generates a single static call in
  *     whole-stage codegen.
  *
  * Error contract unchanged: corrupt input → null → the body's rows are
  * dropped, batch keeps running (reference 400s that one request,
  * `/root/reference/kinesis.go:79,86`).
  */
object RelayExpressions {

  /** WriteRequest as Catalyst rows:
    * array<struct<labels: map<string,string>, samples: array<struct<value: double, timestamp: bigint>>>> */
  val writeRequestType: ArrayType = ArrayType(StructType(Seq(
    StructField("labels", MapType(StringType, StringType, valueContainsNull = false),
      nullable = false),
    StructField("samples", ArrayType(StructType(Seq(
      StructField("value", DoubleType, nullable = false),
      StructField("timestamp", LongType, nullable = false))), containsNull = false),
      nullable = false))), containsNull = false)

  /** Static decompress used by both interpreted eval and generated code.
    * Returns null on corrupt input (log-and-drop). */
  def snappyDecompress(bytes: Array[Byte]): Array[Byte] =
    try org.xerial.snappy.Snappy.uncompress(bytes)
    catch {
      case e: java.io.IOException =>
        System.err.println(s"[RelayExpressions] snappy decode failed, dropping body: ${e.getMessage}")
        null
    }

  /** Static decode → internal data. Returns null on corrupt input. */
  def prompbDecode(bytes: Array[Byte]): GenericArrayData =
    try {
      val series = Prompb.decode(bytes)
      new GenericArrayData(series.map { ts =>
        val keys = new GenericArrayData(ts.labels.keysIterator.map(UTF8String.fromString).toArray[Any])
        val vals = new GenericArrayData(ts.labels.valuesIterator.map(UTF8String.fromString).toArray[Any])
        val samples = new GenericArrayData(ts.samples.map(s =>
          InternalRow(s.value, s.timestamp): Any).toArray)
        InternalRow(new ArrayBasedMapData(keys, vals), samples): Any
      }.toArray)
    } catch {
      case e: Prompb.DecodeError =>
        System.err.println(s"[RelayExpressions] protobuf decode failed, dropping body: ${e.getMessage}")
        null
    }

  def snappy(c: Column): Column =
    ColumnBridge.column(SnappyDecompress(ColumnBridge.expression(c)))

  def prompb(c: Column): Column =
    ColumnBridge.column(PrompbDecode(ColumnBridge.expression(c)))

  /** Optional SQL surface: `SELECT prompb_decode(snappy_decompress(body))`. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("snappy_decompress",
      es => SnappyDecompress(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("prompb_decode",
      es => PrompbDecode(es.head), "scala_udf")
  }
}

/** `snappy.Decode` (`/root/reference/kinesis.go:76`) as a codegen'd unary
  * expression: binary → binary, null on corrupt input. */
case class SnappyDecompress(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    RelayExpressions.snappyDecompress(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.RelayExpressions.snappyDecompress($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): SnappyDecompress =
    copy(child = newChild)
}

/** `proto.Unmarshal` of a remote-write WriteRequest
  * (`/root/reference/kinesis.go:83-88`) as a unary expression producing
  * Catalyst-internal nested data, null on corrupt input. Codegen'd like
  * [[SnappyDecompress]]: the static decoder already returns internal-format
  * `ArrayData`, so generated code is a single static call. */
case class PrompbDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = RelayExpressions.writeRequestType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    RelayExpressions.prompbDecode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.RelayExpressions.prompbDecode($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): PrompbDecode =
    copy(child = newChild)
}
