package graft

import graft.sources.{Prompb, RemoteWrite}
import graft.sources.Prompb.{Sample, TimeSeries}
import org.scalatest.funsuite.AnyFunSuite

/** Golden cases G1–G7 from FIXTURES.md §B: hand-built WriteRequest bytes →
  * snappy → full DataFrame pipeline → JSON lines, checked byte-for-byte
  * against the reference's output format (`/root/reference/README.rst:50-61`,
  * `record.go:9-12`).
  */
class RelayGoldenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pipeline(series: Seq[TimeSeries]): Seq[String] = {
    val body = org.xerial.snappy.Snappy.compress(Prompb.encode(series))
    val df = Seq(body).toDF("body")
    RemoteWrite.jsonLines(RemoteWrite.fromBodies(df))
      .select("json").as[String].collect().toSeq.map(_.stripSuffix("\n"))
  }

  test("G1: README documented example") {
    val got = pipeline(Seq(TimeSeries(
      Map("__name__" -> "scrape_duration_seconds", "instance" -> "localhost:9090",
          "job" -> "prometheus", "monitor" -> "codelab-monitor"),
      Seq(Sample(0.004345524, 1513264725773L)))))
    assert(got == Seq(
      """{"name":"scrape_duration_seconds","time":1513264725773,"value":0.004345524,""" +
      """"labels":{"__name__":"scrape_duration_seconds","instance":"localhost:9090",""" +
      """"job":"prometheus","monitor":"codelab-monitor"}}"""))
  }

  test("G2: one series, three samples → three lines, input order") {
    val got = pipeline(Seq(TimeSeries(Map("__name__" -> "m"),
      Seq(Sample(1.0, 10L), Sample(2.0, 20L), Sample(3.0, 30L)))))
    assert(got.size == 3)
    assert(got.map(l => "\"time\":(\\d+)".r.findFirstMatchIn(l).get.group(1)) ==
      Seq("10", "20", "30"))
  }

  test("G3: zero samples → one line with time=0, value=null") {
    val got = pipeline(Seq(TimeSeries(Map("__name__" -> "empty"), Nil)))
    assert(got == Seq("""{"name":"empty","time":0,"value":null,"labels":{"__name__":"empty"}}"""))
  }

  test("G4: NaN sample → value:null") {
    val got = pipeline(Seq(TimeSeries(Map("__name__" -> "n"),
      Seq(Sample(Double.NaN, 5L)))))
    assert(got == Seq("""{"name":"n","time":5,"value":null,"labels":{"__name__":"n"}}"""))
  }

  test("G5: labels without __name__ → name is empty string") {
    val got = pipeline(Seq(TimeSeries(Map("job" -> "x"), Seq(Sample(1.5, 1L)))))
    assert(got == Seq("""{"name":"","time":1,"value":1.5,"labels":{"job":"x"}}"""))
  }

  test("G6: 2 series × 2 samples → 4 lines, series-major order") {
    val got = pipeline(Seq(
      TimeSeries(Map("__name__" -> "a"), Seq(Sample(1.0, 1L), Sample(2.0, 2L))),
      TimeSeries(Map("__name__" -> "b"), Seq(Sample(3.0, 3L), Sample(4.0, 4L)))))
    val names = got.map(l => "\"name\":\"(\\w+)\"".r.findFirstMatchIn(l).get.group(1))
    assert(names == Seq("a", "a", "b", "b"))
    val times = got.map(l => "\"time\":(\\d+)".r.findFirstMatchIn(l).get.group(1))
    assert(times == Seq("1", "2", "3", "4"))
  }

  test("G7: ±Inf rows are dropped (Go json.Marshal error path)") {
    val got = pipeline(Seq(TimeSeries(Map("__name__" -> "inf"),
      Seq(Sample(Double.PositiveInfinity, 1L), Sample(42.0, 2L),
          Sample(Double.NegativeInfinity, 3L)))))
    assert(got == Seq("""{"name":"inf","time":2,"value":42.0,"labels":{"__name__":"inf"}}"""))
  }

  test("row-count law: rows == Σ max(1, len(samples))") {
    val series = Seq(
      TimeSeries(Map("a" -> "1"), Nil),
      TimeSeries(Map("b" -> "2"), Seq(Sample(1, 1))),
      TimeSeries(Map("c" -> "3"), (1 to 17).map(i => Sample(i.toDouble, i.toLong))))
    val body = org.xerial.snappy.Snappy.compress(Prompb.encode(series))
    val n = RemoteWrite.fromBodies(Seq(body).toDF("body")).count()
    assert(n == series.map(s => math.max(1, s.samples.size)).sum)
  }
}
