package graft

import graft.functions.RelayExpressions
import graft.sources.Prompb
import graft.sources.Prompb.{Sample, TimeSeries}
import org.scalatest.funsuite.AnyFunSuite

/** The native-expression SQL surface: register → pure-SQL decode of a
  * remote-write body, equal to the Column-API path. */
class RelayExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("snappy_decompress + prompb_decode usable from SQL") {
    import spark.implicits._
    RelayExpressions.register(spark)
    val body = org.xerial.snappy.Snappy.compress(Prompb.encode(Seq(
      TimeSeries(Map("__name__" -> "cpu", "host" -> "a"),
        Seq(Sample(0.25, 1000L), Sample(0.5, 2000L))))))
    Seq(body).toDF("body").createOrReplaceTempView("bodies")
    val rows = spark.sql(
      """SELECT s.labels['__name__'] AS name, sample.value, sample.timestamp
        |FROM bodies
        |LATERAL VIEW explode(prompb_decode(snappy_decompress(body))) t AS s
        |LATERAL VIEW explode(s.samples) u AS sample
        |ORDER BY sample.timestamp""".stripMargin).collect()
    assert(rows.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq ==
      Seq(("cpu", 0.25, 1000L), ("cpu", 0.5, 2000L)))
  }

  test("GraftExtensions injects both functions without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext) // throws on bad wiring
  }

  test("corrupt input yields NULL from SQL, not an exception") {
    import spark.implicits._
    RelayExpressions.register(spark)
    Seq(Array[Byte](9, 9, 9)).toDF("body").createOrReplaceTempView("bad_bodies")
    val r = spark.sql(
      "SELECT prompb_decode(snappy_decompress(body)) IS NULL AS dropped FROM bad_bodies")
      .collect()
    assert(r.head.getBoolean(0))
  }
}
