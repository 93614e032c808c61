package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native vector arithmetic for the similarity family's hot path.
  *
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, (acc,x) => acc+x)` runs
  * each lambda INTERPRETED — two closure calls per element plus an
  * intermediate 64-element array per pair. On the candidate-pair joins
  * (ANN buckets, near-dup verify) that is the dominant CPU. These
  * expressions are the compiled form: one fused loop over the input
  * arrays, no intermediate allocation, a single static call inside
  * whole-stage codegen.
  *
  * Float determinism is preserved bit-for-bit: the loop is the SAME
  * ascending-index left fold the HOF pipeline evaluated (and DuckDB's
  * `list_sum(list_transform(...))` evaluates), so every oracle hash
  * stays identical.
  */
object VectorExpressions {

  /** Static worker: Σ a[i]·b[i], ascending, sequential. NULL-faithful to
    * the HOF form it replaces (that's what lets [[VectorRewrite]] fire
    * soundly on arbitrary user code): `zip_with` pads unequal lengths with
    * nulls and `x*null`/`acc+null` propagate, so ANY length mismatch or
    * null element makes the whole fold null — return the boxed null
    * exactly then. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Static worker: Σ a[i]², ascending, sequential (no sqrt — callers
    * compose with the built-in `sqrt` so plans stay inspectable). Null
    * element ⇒ null, matching `aggregate`'s fold. */
  def sumSq(a: ArrayData): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      acc += a.getDouble(i) * a.getDouble(i)
      i += 1
    }
    acc
  }

  /** Static worker: element-wise `floor(a[i]·scale + 0.5)` — int8-style
    * scalar quantization (values land on integers, kept as doubles so
    * [[dot]] composes and stays EXACT: |q| ≤ 127 ⇒ a 64-dim quantized dot
    * ≤ 127²·64 ≈ 2²⁰ ≪ 2⁵³). `floor(v + 0.5)` rather than a half-away
    * round: it is the IDENTICAL double expression DuckDB's
    * `floor(x*scale + 0.5)` evaluates, so oracle hashes match bit-for-bit
    * (the two engines' native round() implementations disagree on
    * half-ulp edge cases). Null element ⇒ null, like the others. */
  def scaleRoundArr(a: ArrayData, scale: Double): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      out(i) = Math.floor(a.getDouble(i) * scale + 0.5)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Static worker: the array's IEEE-754 bytes, big-endian, 8 per element
    * (`doubleToLongBits`, so any NaN payload canonicalizes — equal-valued
    * vectors always pack to equal bytes). Null element ⇒ null, like the
    * folds above. The packed form exists to be DIGESTED (`md5(pack(emb))`
    * is the embedding gates' 16-byte exact-probe join key — VERDICT r17
    * #1: shuffling a 512-byte ARRAY<DOUBLE> as the join key is not the
    * 100 TB shape); equality of vectors ⇔ equality of packed bytes. */
  def packDoubles(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](8 * n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val bits = java.lang.Double.doubleToLongBits(a.getDouble(i))
      var j = 0
      while (j < 8) {
        out(i * 8 + j) = ((bits >>> (56 - 8 * j)) & 0xffL).toByte
        j += 1
      }
      i += 1
    }
    out
  }

  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sumOfSquares(a: Column): Column =
    ColumnBridge.column(SumOfSquares(ColumnBridge.expression(a)))

  def scaleRound(a: Column, scale: Column): Column =
    ColumnBridge.column(ScaleRound(ColumnBridge.expression(a), ColumnBridge.expression(scale)))

  def packDoubles(a: Column): Column =
    ColumnBridge.column(PackDoubles(ColumnBridge.expression(a)))

}

/** Dot product of two array<double> columns as a codegen'd expression.
  * Nullable even over non-null inputs: unequal lengths or null elements
  * yield null (the `zip_with` fold's semantics). */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorExpressions.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = ctx.freshName("boxedDot")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double $boxed = graft.functions.VectorExpressions.dot($a, $b);
      if ($boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $boxed.doubleValue(); }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Σx² of an array<double> column as a codegen'd expression. Nullable:
  * a null element yields null (the `aggregate` fold's semantics). */
case class SumOfSquares(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    VectorExpressions.sumSq(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = ctx.freshName("boxedSq")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Double $boxed = graft.functions.VectorExpressions.sumSq($c);
      if ($boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $boxed.doubleValue(); }""")
  }

  override protected def withNewChildInternal(newChild: Expression): SumOfSquares =
    copy(child = newChild)
}

/** Element-wise quantize of an array<double> by a per-row scale — the
  * codegen'd form of `transform(a, x -> floor(x*scale + 0.5))` (interpreted
  * HOF: one closure call per element; this: one fused loop). */
case class ScaleRound(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, s: Any): Any =
    VectorExpressions.scaleRoundArr(a.asInstanceOf[ArrayData], s.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.freshName("qarr")
    nullSafeCodeGen(ctx, ev, (a, s) => s"""
      org.apache.spark.sql.catalyst.util.ArrayData $arr =
        graft.functions.VectorExpressions.scaleRoundArr($a, $s);
      if ($arr == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $arr; }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ScaleRound =
    copy(left = newLeft, right = newRight)
}

/** Big-endian IEEE-754 bytes of an array<double> column, as a codegen'd
  * expression — the digestible form of a vector (`md5(pack(emb))` = the
  * exact-dedup join key). Nullable: a null element yields null. */
case class PackDoubles(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    VectorExpressions.packDoubles(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytes = ctx.freshName("packed")
    nullSafeCodeGen(ctx, ev, c => s"""
      byte[] $bytes = graft.functions.VectorExpressions.packDoubles($c);
      if ($bytes == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $bytes; }""")
  }

  override protected def withNewChildInternal(newChild: Expression): PackDoubles =
    copy(child = newChild)
}
