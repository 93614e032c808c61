package graft.sources

/** Minimal Prometheus remote-write v1 protobuf wire codec.
  *
  * The reference decodes `prompb.WriteRequest` with gogo/protobuf
  * (`/root/reference/kinesis.go:83-88`, dep `/root/reference/go.mod:10`).
  * This environment has no protobuf runtime or `spark-protobuf` jar
  * (SURVEY.md §2.1), so we decode the wire format directly — the message
  * uses only three wire types:
  *
  *   WriteRequest.timeseries = field 1 (len-delimited, repeated)
  *     TimeSeries.labels  = field 1 (len-delimited, repeated)
  *     TimeSeries.samples = field 2 (len-delimited, repeated)
  *       Label.name  = field 1 (string), Label.value = field 2 (string)
  *       Sample.value = field 1 (fixed64 IEEE754 double)
  *       Sample.timestamp = field 2 (varint int64, epoch ms)
  *
  * Unknown fields are skipped per wire type, as a conforming decoder must.
  * The encoder exists for tests and for driving the relay from synthetic
  * data — the reference never encodes.
  */
object Prompb {

  /** Typed decode failure: truncated/corrupt bodies raise this instead of
    * ArrayIndexOutOfBounds, so callers can log-and-drop the one bad body the
    * way the reference answers 400 and keeps serving
    * (`/root/reference/kinesis.go:83-88`). */
  final class DecodeError(msg: String) extends RuntimeException(msg)

  final case class Sample(value: Double, timestamp: Long)
  /** Labels kept sorted by name: Go's `json.Marshal` on a map emits keys in
    * sorted order (`/root/reference/record.go:14` via encoding/json), so
    * sorting here makes our JSON-lines output byte-comparable. */
  final case class TimeSeries(labels: Map[String, String], samples: Seq[Sample])

  // ---------------------------------------------------------------- decode

  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasNext: Boolean = pos < end

    private def need(n: Int): Unit =
      if (n < 0 || n > end - pos)
        throw new DecodeError(s"truncated message: need $n bytes at $pos/$end")

    def readVarint(): Long = {
      var shift = 0
      var result = 0L
      while (shift < 64) {
        need(1)
        val b = buf(pos)
        pos += 1
        result |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      throw new DecodeError("malformed varint")
    }

    def readFixed64(): Long = {
      need(8)
      var v = 0L
      var i = 0
      while (i < 8) {
        v |= (buf(pos + i) & 0xffL) << (8 * i)
        i += 1
      }
      pos += 8
      v
    }

    /** A length varint, range-checked BEFORE the Long→Int narrowing: a
      * corrupt length that is a multiple of 2^32 would otherwise wrap to
      * 0 via `.toInt`, pass `need(0)`, and silently re-parse the payload
      * bytes as tags instead of raising the typed DecodeError (review
      * catch; lengths in [2^31, 2^32) only happened to be caught because
      * the narrowing went negative). */
    def readLen(): Int = {
      val len = readVarint()
      if (len < 0 || len > Int.MaxValue)
        throw new DecodeError(s"length varint out of range: $len at $pos")
      len.toInt
    }

    def readLenDelim(): Reader = {
      val len = readLen()
      need(len)
      val r = new Reader(buf, pos, pos + len)
      pos += len
      r
    }

    def readString(): String = {
      val len = readLen()
      need(len)
      val s = new String(buf, pos, len, java.nio.charset.StandardCharsets.UTF_8)
      pos += len
      s
    }

    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => need(8); pos += 8
      case 2 => val len = readLen(); need(len); pos += len
      case 5 => need(4); pos += 4
      case w => throw new DecodeError(s"unsupported wire type $w")
    }
  }

  /** Decode a WriteRequest body into its timeseries. */
  def decode(bytes: Array[Byte]): Seq[TimeSeries] = {
    val r = new Reader(bytes, 0, bytes.length)
    val out = Seq.newBuilder[TimeSeries]
    while (r.hasNext) {
      val tag = r.readVarint()
      val (field, wire) = ((tag >>> 3).toInt, (tag & 7).toInt)
      if (field == 1 && wire == 2) out += decodeTimeSeries(r.readLenDelim())
      else r.skip(wire)
    }
    out.result()
  }

  private def decodeTimeSeries(r: Reader): TimeSeries = {
    val labels = Seq.newBuilder[(String, String)]
    val samples = Seq.newBuilder[Sample]
    while (r.hasNext) {
      val tag = r.readVarint()
      ((tag >>> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => labels += decodeLabel(r.readLenDelim())
        case (2, 2) => samples += decodeSample(r.readLenDelim())
        case (_, w) => r.skip(w)
      }
    }
    // TreeMap would re-sort on every insert; one sort at the end suffices.
    TimeSeries(
      scala.collection.immutable.ListMap(labels.result().sortBy(_._1): _*),
      samples.result())
  }

  private def decodeLabel(r: Reader): (String, String) = {
    var name = ""
    var value = ""
    while (r.hasNext) {
      val tag = r.readVarint()
      ((tag >>> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => name = r.readString()
        case (2, 2) => value = r.readString()
        case (_, w) => r.skip(w)
      }
    }
    (name, value)
  }

  private def decodeSample(r: Reader): Sample = {
    var value = 0.0
    var ts = 0L
    while (r.hasNext) {
      val tag = r.readVarint()
      ((tag >>> 3).toInt, (tag & 7).toInt) match {
        case (1, 1) => value = java.lang.Double.longBitsToDouble(r.readFixed64())
        case (2, 0) => ts = r.readVarint()
        case (_, w) => r.skip(w)
      }
    }
    Sample(value, ts)
  }

  // ---------------------------------------------------------------- encode

  private final class Writer {
    private val out = new java.io.ByteArrayOutputStream()

    def writeVarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) {
        out.write(((v & 0x7f) | 0x80).toInt)
        v >>>= 7
      }
      out.write(v.toInt)
    }

    def writeTag(field: Int, wire: Int): Unit = writeVarint((field.toLong << 3) | wire)

    def writeFixed64(v: Long): Unit = {
      var i = 0
      while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
    }

    def writeBytesField(field: Int, b: Array[Byte]): Unit = {
      writeTag(field, 2); writeVarint(b.length.toLong); out.write(b)
    }

    def writeStringField(field: Int, s: String): Unit =
      writeBytesField(field, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    def bytes: Array[Byte] = out.toByteArray
  }

  def encode(series: Seq[TimeSeries]): Array[Byte] = {
    val w = new Writer
    series.foreach { ts =>
      val tsw = new Writer
      ts.labels.foreach { case (n, v) =>
        val lw = new Writer
        lw.writeStringField(1, n)
        lw.writeStringField(2, v)
        tsw.writeBytesField(1, lw.bytes)
      }
      ts.samples.foreach { s =>
        val sw = new Writer
        sw.writeTag(1, 1)
        sw.writeFixed64(java.lang.Double.doubleToRawLongBits(s.value))
        sw.writeTag(2, 0)
        sw.writeVarint(s.timestamp)
        tsw.writeBytesField(2, sw.bytes)
      }
      w.writeBytesField(1, tsw.bytes)
    }
    w.bytes
  }
}
