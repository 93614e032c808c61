package graft

import org.scalatest.funsuite.AnyFunSuite

/** Known-answer tests for the report-layer queries added in round 12:
  * mixture audit (q158), embedding dimension stats (q159), and the star
  * revenue report (q160) — each against hand-computed numbers.
  */
class ReportOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q158: shares, surplus, and the ordered KL fold match hand math") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mix").toString
    Seq(
      (0L, "a b", "en", "s", 3L),
      (1L, "c d e f", "en", "s", 7L),
      (2L, "x y z", "fr", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = operators.Pipeline.klMixtureReport(spark, dir).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(2), x.getDouble(3), x.getLong(5), x.getDouble(6)))).toMap
    // en: 6 of 9 tokens, surplus 6 - 9 div 2 = 2, kl_cum = (2/3)ln(4/3)
    assert(r("en") == ((6L, 0.666667, 2L, 0.191788)))
    // fr adds (1/3)ln(2/3): 0.191788 - 0.135155 = 0.056633
    assert(r("fr") == ((3L, 0.333333, -1L, 0.056633)))
  }

  test("q159: per-dim moments on quantized units; variance ranks dims") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dim").toString
    Seq(
      (0L, Seq(1.0f, 0.0f), 0),
      (1L, Seq(3.0f, 0.0f), 0),
      (2L, Seq(2.0f, 6.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = operators.Similarity.dimStats(spark, dir).collect()
      .map(x => x.getInt(0) -> ((x.getDouble(2), x.getDouble(3), x.getInt(4)))).toMap
    assert(r(1) == ((2.0, 1.0, 2)))
    assert(r(2) == ((2.0, 3.464102, 1)))
  }

  test("q160: QoQ growth and region share off exact cents") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rev").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    Seq(
      (1L, 10L, "F", 100.00, ts("2024-01-15"), "1-URGENT"),
      (2L, 10L, "F", 150.00, ts("2024-04-15"), "1-URGENT"),
      (3L, 20L, "F", 100.00, ts("2024-02-01"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, "cA", 1, 0.0, "BUILDING"), (20L, "cB", 2, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1, "ALPHA", 7), (2, "BETA", 7))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((7, "R1")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    val r = operators.Joins.revenueReport(spark, dir).collect()
      .map(x => (x.getString(1), x.getDate(2).toString) ->
        ((x.getDouble(4), Option(x.get(5)).map(_.asInstanceOf[Double]),
          x.getDouble(6)))).toMap
    assert(r(("ALPHA", "2024-01-01")) == ((100.0, None, 0.5)))
    assert(r(("ALPHA", "2024-04-01")) == ((150.0, Some(0.5), 1.0)))
    assert(r(("BETA", "2024-01-01")) == ((100.0, None, 0.5)))
  }
}
