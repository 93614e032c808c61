package graft

import org.scalatest.funsuite.AnyFunSuite

/** q162 c-TF-IDF cluster labeling: planted duplicate groups must surface
  * their distinguishing terms first, with shared-rarity weighting and the
  * rounded-score/token tie-break ranking. */
class ClusterLabelsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("each planted cluster is labeled by its own dominant term") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ctfidf").toString
    val a = "apple apple banana core"
    val b = "delta echo echo fox"
    Seq((0L, a, "en", "s", a.length.toLong), (1L, a, "en", "s", a.length.toLong),
      (2L, b, "en", "s", b.length.toLong), (3L, b, "en", "s", b.length.toLong),
      (4L, "lone wolf text here", "en", "s", 19L)) // unpaired: excluded
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = operators.Dedup.clusterTopTerms(spark, dir).collect()
      .map(x => (x.getLong(0), x.getInt(1)) -> ((x.getString(2), x.getLong(3), x.getDouble(4))))
      .toMap
    assert(r.keys.map(_._1).toSet == Set(0L, 2L), s"clusters: ${r.keys}")
    // cluster 0: apple tf=4 of 8, f=4, A=8 → 0.5·ln(3) = 0.549306
    assert(r((0L, 1)) == (("apple", 4L, 0.549306)))
    // banana/core tie at 0.25·ln(5) = 0.402359 → token order breaks it
    assert(r((0L, 2))._1 == "banana" && r((0L, 3))._1 == "core")
    assert(r((2L, 1)) == (("echo", 4L, 0.549306)))
  }
}
