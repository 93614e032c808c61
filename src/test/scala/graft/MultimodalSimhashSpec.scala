package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** q208's byte-level SimHash dedup on planted payloads: a one-byte edit
  * stays within a few Hamming bits, unrelated payloads never pair, the
  * candidate path is a banded equi-join. */
class MultimodalSimhashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def blobs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
  }

  test("a small edit in a large payload pairs at low hamming; unrelated never pair") {
    val base = Seq.tabulate(200)(i => s"w$i").mkString(" ")
    val edited = base.replace("w100", "wXXX") // one shingle neighborhood changes
    val other = Seq.tabulate(200)(i => s"z${i * 7}").mkString(" ")
    val out = operators.Multimodal.byteSimhashPairs(
      blobs((1L, base), (2L, edited), (3L, other)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.map(p => (p._1, p._2)).toSeq === Seq((1L, 2L)))
    assert(out.head._3 <= 12, s"edit distance leaked too many bits: ${out.head._3}")
  }

  test("identical payloads sketch identically (hamming 0)") {
    val p = Seq.tabulate(100)(i => s"tok$i").mkString(" ")
    val out = operators.Multimodal.byteSimhashPairs(blobs((7L, p), (9L, p)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(out === Seq((7L, 9L, 0)))
  }

  test("payloads shorter than one shingle are dropped, not crashed") {
    val out = operators.Multimodal.byteSimhashSketch(blobs((1L, "ab"), (2L, "longer than eight bytes")))
      .collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("plan: candidate generation is a banded equi-join, never NLJ/cartesian") {
    val p = SparkEntry.queries("q208_multimodal_simhash")(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
