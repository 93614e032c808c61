package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

  def minhashSig(c: Column, as: Seq[Long], bs: Seq[Long], p: Long): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c), as, bs, p))

  def simhash64(c: Column, nBits: Int): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c), nBits))

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(s) — identical to
    * `conv(substring(md5(s), 1, 15), 16, 10)`: 15 hex digits = the
    * big-endian first 8 digest bytes shifted right 4. */
  private def md5Bits60(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(bytes)
    val hi = java.nio.ByteBuffer.wrap(h, 0, 8).getLong
    hi >>> 4
  }

  /** First 32 bits of md5(s) — identical to
    * `conv(substring(md5(s), 1, 8), 16, 10)`: 8 hex digits = the
    * big-endian first 4 digest bytes, unsigned. */
  private def md5Bits32(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(bytes)
    java.lang.Integer.toUnsignedLong(java.nio.ByteBuffer.wrap(h, 0, 4).getInt)
  }

  /** Static worker: k minwise values over shingles in ONE pass — one md5
    * per shingle (the HOF pipeline recomputed it per hash function) and k
    * linear transforms h_i(v) = (a_i·v + b_i) mod p. Returns null for an
    * empty shingle set (min of nothing), matching `array_min([])`. */
  def minhashSig(shingles: ArrayData, as: Array[Long], bs: Array[Long], p: Long): GenericArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val v = md5Bits32(shingles.getUTF8String(i).getBytes)
      var j = 0
      while (j < k) {
        val h = (as(j) * v + bs(j)) % p
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(v => v: Any))
  }

  /** Static worker: DISTINCT 64-bit hashes of the token n-grams of a
    * space-separated string, in one pass with no intermediate shingle
    * strings at all — each n-gram hashes as FNV-1a over its tokens' bytes
    * with a separator byte, deduped in a HashSet. For consumers that only
    * need shingle IDENTITY (inverted-index joins, df counts), not the
    * text: the q60 pipeline built 260k shingle strings, xxhash64'd them,
    * then array_distinct'd — three passes this replaces with one. Hash
    * values are engine-internal join keys (the oracle joins raw shingle
    * strings); only final pair rows must match, and 64-bit collisions at
    * corpus scale are ~N²/2⁶⁵. */
  def shingleHashes(text: UTF8String, n: Int): GenericArrayData = {
    val toks = text.toString.split(" ", -1)
    val count = toks.length - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[java.lang.Long](count * 2)
    var i = 0
    while (i < count) {
      var h = 0xcbf29ce484222325L // FNV-1a 64 offset basis
      var j = 0
      while (j < n) {
        val t = toks(i + j)
        var k = 0
        while (k < t.length) {
          h ^= t.charAt(k)
          h *= 0x100000001b3L
          k += 1
        }
        h ^= 0x20 // separator, mirrors the ' ' join
        h *= 0x100000001b3L
        j += 1
      }
      seen.add(h)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next().longValue(); idx += 1 }
    new GenericArrayData(out)
  }

  def shingleHashes(c: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(c), n))

  /** Static worker: FNV-1a hashes of every ≤`maxDeletes`-deletion variant
    * of the string, deduplicated (deleting any char of a repeated run
    * yields the same variant, so template names with digit runs collapse
    * well below the 1 + L + L(L−1)/2 ceiling). One char-skipping pass per
    * variant — no substring is ever materialized. Used by the q133 FastSS
    * blocking at k=2: two strings within edit distance k must share ≥1
    * ≤k-deletion variant (pigeonhole: each edit op touches at most one
    * position per side), hence ≥1 hash (equal strings hash equal); a
    * cross-string collision only ADDS a candidate the levenshtein verify
    * discards, so the hash width is a performance choice, not a
    * correctness one. k=1 (VERDICT r13 #8) emits only 1 + L variants —
    * O(L²) work instead of O(L³) — and keeps exact recall for the
    * lev ≤ 1 predicate (property-tested under random single edits). */
  def deletionHashes(s: UTF8String, maxLen: Int,
                     maxDeletes: Int): GenericArrayData = {
    val str = s.toString
    val len = math.min(str.length, maxLen)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    // deletion slots (j, i), 1-based, j < i, 0 = unused — the SQL form's
    // enumeration exactly; k=1 pins the second slot to "unused"
    var i = 0
    while (i <= len) {
      val jMax = if (i == 0 || maxDeletes < 2) 0 else i - 1
      var j = 0
      while (j <= jMax) {
        var h = 0xcbf29ce484222325L
        var p = 1
        while (p <= len) {
          if (p != i && p != j) {
            h ^= str.charAt(p - 1)
            h *= 0x100000001b3L
          }
          p += 1
        }
        seen.add(h)
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next().longValue(); idx += 1 }
    new GenericArrayData(out)
  }

  def deletionHashes(s: UTF8String, maxLen: Int): GenericArrayData =
    deletionHashes(s, maxLen, 2)

  def deletionHashes(c: Column): Column =
    ColumnBridge.column(DeletionHashes(ColumnBridge.expression(c)))

  def deletionHashes(c: Column, maxDeletes: Int): Column =
    ColumnBridge.column(
      DeletionHashes(ColumnBridge.expression(c), maxDeletes = maxDeletes))

  /** Static worker: first 60 md5 bits of a string's UTF-8 bytes — VALUE-
    * identical to the SQL idiom `conv(substring(md5(s), 1, 15), 16, 10)`
    * the deterministic-hash family is built on (splits, samples, arms,
    * bootstrap replicates), as one codegen call instead of hex-string
    * materialization + substring + base conversion per row. Oracles keep
    * the SQL idiom; values match bit-for-bit (property-tested). */
  def md5Hash60(s: UTF8String): Long = md5Bits60(s.getBytes)

  def md5Hash60Col(c: Column): Column =
    ColumnBridge.column(Md5Hash60(ColumnBridge.expression(c)))

  /** Static worker: nBits-bit SimHash of a space-separated string in ONE
    * pass — per token the first 60 md5 bits, ±1 per bit position, bit set
    * where the count is positive. Replaces the explode → 60-counter
    * aggregate pipeline: same value per document, but computed per-row
    * with ZERO shuffle. */
  def simhash(text: UTF8String, nBits: Int): Long = {
    val toks = text.toString.split(" ", -1)
    val counts = new Array[Int](nBits)
    var i = 0
    while (i < toks.length) {
      val v = md5Bits60(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var j = 0
      while (j < nBits) {
        if (((v >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < nBits) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  private val HexChars = "0123456789abcdef".getBytes

  /** Static worker: nBits-bit SimHash of an OPAQUE BYTE payload — fixed
    * `width`-byte windows at `stride`-byte steps, each md5'd AS ITS
    * LOWERCASE HEX STRING (16 ASCII bytes for width 8), so the value is
    * bit-identical to the SQL/DuckDB derivation over
    * `lower(hex(payload))` windows — the q208 oracle's form. One compiled
    * pass, zero allocations beyond the reused window buffer: the HOF
    * spelling of the same sketch interpreted ~2.4 B lambda evaluations at
    * the 32× corpus and timed out the probe; this is the (b)-preference
    * native-expression fix. Fewer than one window ⇒ 0L (no votes), the
    * fold identity. */
  def byteSimhash(payload: Array[Byte], nBits: Int, width: Int, stride: Int): Long = {
    val n = payload.length
    val counts = new Array[Int](nBits)
    val buf = new Array[Byte](width * 2)
    var i = 0
    while (i + width <= n) {
      var k = 0
      while (k < width) {
        val b = payload(i + k) & 0xff
        buf(2 * k) = HexChars(b >>> 4)
        buf(2 * k + 1) = HexChars(b & 0xf)
        k += 1
      }
      val v = md5Bits60(buf)
      var j = 0
      while (j < nBits) {
        if (((v >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += stride
    }
    var out = 0L
    var j = 0
    while (j < nBits) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  def byteSimhash64(c: Column, nBits: Int, width: Int = 8, stride: Int = 4): Column =
    ColumnBridge.column(ByteSimHash64(ColumnBridge.expression(c), nBits, width, stride))

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

/** Distinct token n-gram hashes of a space-separated string as one
  * codegen'd expression: string → array<long>, empty when under n tokens. */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextExpressions.shingleHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextExpressions.shingleHashes($c, $n);""")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** k-function MinHash signature of a shingle array as one codegen'd
  * expression: array<string> → array<long> of k minwise values; null for
  * an empty input (min of nothing, like `array_min`). */
case class MinHashSig(child: Expression, as: Seq[Long], bs: Seq[Long], p: Long)
    extends UnaryExpression {
  require(as.length == bs.length && as.nonEmpty, "need matching a/b coefficient lists")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private lazy val asArr = as.toArray
  private lazy val bsArr = bs.toArray

  override def nullSafeEval(input: Any): Any =
    TextExpressions.minhashSig(input.asInstanceOf[ArrayData], asArr, bsArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", asArr, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bsArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextExpressions.minhashSig($c, $asRef, $bsRef, ${p}L);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** nBits-bit SimHash of a space-separated string as one codegen'd
  * expression: string → long, zero-shuffle per-document sketch. */
case class SimHash64(child: Expression, nBits: Int) extends UnaryExpression {
  require(nBits >= 1 && nBits <= 60, s"simhash width must be in [1,60], got $nBits")
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TextExpressions.simhash(input.asInstanceOf[UTF8String], nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextExpressions.simhash($c, $nBits);""")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** nBits-bit SimHash of a BINARY payload as one codegen'd expression —
  * fixed-width byte windows at a fixed stride, hashed as their lowercase
  * hex strings (the oracle-matching form): binary → long. */
case class ByteSimHash64(child: Expression, nBits: Int, width: Int, stride: Int)
    extends UnaryExpression {
  require(nBits >= 1 && nBits <= 60, s"simhash width must be in [1,60], got $nBits")
  require(width >= 1 && stride >= 1, s"need positive window/stride, got $width/$stride")
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TextExpressions.byteSimhash(input.asInstanceOf[Array[Byte]], nBits, width, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextExpressions.byteSimhash($c, $nBits, $width, $stride);""")

  override protected def withNewChildInternal(newChild: Expression): ByteSimHash64 =
    copy(child = newChild)
}

/** All ≤`maxDeletes`-deletion variant hashes of a string as one codegen'd
  * expression: string → array<long>, deduped — the FastSS blocking key
  * builder (see [[TextExpressions.deletionHashes]]). k=2 is the q133
  * default (exact recall for lev ≤ 2); k=1 is the cheap variant (1 + L
  * signatures, exact recall for lev ≤ 1) for callers whose predicate is
  * a single edit. Strings are clamped to 128 chars: FastSS is for SHORT
  * keys (names, phones, SKUs), and the clamp bounds the O(L^(k+1))
  * per-row work; candidates from clamped strings remain a superset
  * within the clamp window. */
case class DeletionHashes(child: Expression, maxLen: Int = 128,
                          maxDeletes: Int = 2) extends UnaryExpression {
  require(maxDeletes == 1 || maxDeletes == 2,
    s"deletion-signature depth must be 1 or 2, got $maxDeletes")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextExpressions.deletionHashes(input.asInstanceOf[UTF8String], maxLen, maxDeletes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextExpressions.deletionHashes($c, $maxLen, $maxDeletes);""")

  override protected def withNewChildInternal(newChild: Expression): DeletionHashes =
    copy(child = newChild)
}

/** First 60 md5 bits of a string as one codegen'd expression — the native
  * form of the repo-wide deterministic-hash idiom
  * `conv(substring(md5(s), 1, 15), 16, 10)` (value-identical, so DuckDB
  * oracles keep the SQL spelling). string → long in [0, 2⁶⁰). */
case class Md5Hash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TextExpressions.md5Hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextExpressions.md5Hash60($c);""")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}
