package graft

import org.scalatest.funsuite.AnyFunSuite

/** q161 containment near-dup: the asymmetric ratio must recover a short
  * document fully embedded in a long one — exactly the pair Jaccard's
  * symmetric denominator dilutes below any usable threshold. */
class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("an embedded short doc scores containment 1.0 while jaccard stays low") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cont").toString
    val long = (1 to 50).map(i => s"w$i").mkString(" ")          // 48 shingles
    val short = (11 to 20).map(i => s"w$i").mkString(" ")        // 8 shingles ⊂ long
    val other = (100 to 120).map(i => s"x$i").mkString(" ")      // disjoint
    Seq((0L, long, "en", "s", long.length.toLong),
      (1L, short, "en", "s", short.length.toLong),
      (2L, other, "en", "s", other.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = operators.Dedup.containmentPairs(spark, dir).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> ((x.getDouble(2), x.getDouble(3))))
      .toMap
    assert(pairs.keySet == Set((0L, 1L)), s"unexpected pairs: $pairs")
    val (cont, jac) = pairs((0L, 1L))
    assert(cont == 1.0)
    assert(jac == 0.166667, s"jaccard should be 8/48: $jac") // the dilution
    // and the q60 Jaccard query at its 0.5 threshold misses this pair
    val j = operators.Dedup.ngramJaccardPairs(spark, dir).collect()
    assert(j.isEmpty, "q60 should NOT see the embedded pair")
  }
}
