package graft

import graft.sources.{Prompb, RemoteWrite}
import graft.sources.Prompb.{Sample, TimeSeries}
import org.scalatest.funsuite.AnyFunSuite

/** Malformed-input isolation (ADVICE r1): a truncated or corrupt body must
  * be dropped alone — the reference answers 400 for that one request and
  * keeps serving (`/root/reference/kinesis.go:79,86`); our batch must not
  * fail because of it.
  */
class CorruptBodySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def goodBody: Array[Byte] =
    org.xerial.snappy.Snappy.compress(Prompb.encode(Seq(
      TimeSeries(Map("__name__" -> "up"), Seq(Sample(1.0, 42L))))))

  test("truncated protobuf raises DecodeError, not ArrayIndexOutOfBounds") {
    val full = Prompb.encode(Seq(
      TimeSeries(Map("__name__" -> "up", "job" -> "x"), Seq(Sample(1.0, 42L)))))
    for (cut <- 1 until full.length) {
      val truncated = full.take(cut)
      try Prompb.decode(truncated)
      catch {
        case _: Prompb.DecodeError => // expected for most cuts
        case e: Throwable => fail(s"cut=$cut leaked ${e.getClass.getName}")
      }
    }
  }

  test("corrupt bodies are dropped; good bodies in the same batch survive") {
    import spark.implicits._
    val corruptSnappy = Array[Byte](1, 2, 3, 4, 5)
    val corruptProto = org.xerial.snappy.Snappy.compress(
      Array[Byte](0x0a, 0x7f, 1, 2)) // field 1 len-delim claiming 127 bytes
    val df = Seq(goodBody, corruptSnappy, corruptProto).toDF("body")
    val out = RemoteWrite.fromBodies(df).collect()
    assert(out.length == 1, "exactly the one good body's row survives")
    assert(out(0).getAs[String]("name") == "up")
  }
}
