package graft

import graft.sources.Prompb
import graft.sources.Prompb.{Sample, TimeSeries}
import org.scalatest.funsuite.AnyFunSuite

class PrompbCodecSpec extends AnyFunSuite {

  private def roundTrip(series: Seq[TimeSeries]): Seq[TimeSeries] =
    Prompb.decode(Prompb.encode(series))

  test("round-trip: one series, one sample (README example G1)") {
    val in = Seq(TimeSeries(
      Map("__name__" -> "scrape_duration_seconds", "instance" -> "localhost:9090",
          "job" -> "prometheus", "monitor" -> "codelab-monitor"),
      Seq(Sample(0.004345524, 1513264725773L))))
    assert(roundTrip(in) == in)
  }

  test("round-trip: multi-series, multi-sample, empty samples, NaN") {
    val in = Seq(
      TimeSeries(Map("__name__" -> "a"), Seq(Sample(1.0, 1L), Sample(2.5, 2L))),
      TimeSeries(Map("__name__" -> "b"), Nil),
      TimeSeries(Map.empty, Seq(Sample(-0.0, 0L))))
    val out = roundTrip(in)
    assert(out == in)
    // NaN can't use == on the case class; check bits explicitly
    val nanIn = Seq(TimeSeries(Map("x" -> "y"), Seq(Sample(Double.NaN, 7L))))
    val nanOut = roundTrip(nanIn)
    assert(nanOut.head.samples.head.timestamp == 7L)
    assert(nanOut.head.samples.head.value.isNaN)
  }

  test("labels come back sorted by name regardless of encode order") {
    val bytes = Prompb.encode(Seq(TimeSeries(
      scala.collection.immutable.ListMap("zzz" -> "1", "aaa" -> "2", "mmm" -> "3"),
      Seq(Sample(1.0, 1L)))))
    val out = Prompb.decode(bytes)
    assert(out.head.labels.keys.toSeq == Seq("aaa", "mmm", "zzz"))
  }

  test("unknown fields are skipped") {
    // WriteRequest with an extra field 15 (varint) before the timeseries
    val base = Prompb.encode(Seq(TimeSeries(Map("k" -> "v"), Seq(Sample(3.0, 9L)))))
    val extra = Array[Byte]((15 << 3).toByte, 42) // field 15, wire 0, value 42
    val out = Prompb.decode(extra ++ base)
    assert(out == Seq(TimeSeries(Map("k" -> "v"), Seq(Sample(3.0, 9L)))))
  }

  test("varint edge values survive (negative timestamp, Long.MaxValue)") {
    val in = Seq(TimeSeries(Map("m" -> "n"),
      Seq(Sample(1.0, Long.MaxValue), Sample(2.0, -1L), Sample(3.0, 0L))))
    assert(roundTrip(in) == in)
  }

  test("a length varint of 2^32 raises DecodeError instead of wrapping to 0 " +
      "and silently re-parsing the payload (review catch)") {
    // field 1, wire 2 (the timeseries field), length = 2^32 — the old
    // `.toInt` narrowing wrapped it to 0, passed need(0), and the payload
    // bytes re-parsed as tags; now the range check rejects it typed
    val evil = Array[Byte]((1 << 3 | 2).toByte,
      0x80.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte, 0x10,
      // "payload" bytes that would otherwise decode as a valid empty series
      (1 << 3 | 2).toByte, 0)
    val e = intercept[Prompb.DecodeError](Prompb.decode(evil))
    assert(e.getMessage.contains("out of range"))
  }
}
