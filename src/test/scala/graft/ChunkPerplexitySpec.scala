package graft

import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture tests for the CCNet-style perplexity bucketing (q124)
  * and RAG sliding-window chunking (q125) — the semantics the oracle can't
  * see: common-token docs MUST score lower perplexity than rare-token docs,
  * tertiles are balanced per language, and chunk boundaries/overlap land on
  * exactly the planted token indices.
  */
class ChunkPerplexitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-cp").toString
    rows.map { case (id, text, lang) => (id, text, lang, s"src$id", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q124: common-token docs score lower perplexity; tertiles balance per lang") {
    // 'common' appears 30×+ corpus-wide; rare* once each. Doc 0 is all-common
    // (lowest surprisal), docs 4-5 are all-rare (highest).
    val common = Seq.fill(10)("common").mkString(" ")
    val docs = writeDocs(Seq(
      (0L, common, "en"),
      (1L, common, "en"),
      (2L, "common common common common rare1 rare2 common common common common", "en"),
      (3L, "common common rare3 rare4 rare5 rare6 common common rare7 rare8", "en"),
      (4L, "rare9 rare10 rare11 rare12 rare13 rare14 rare15 rare16 rare17 rare18", "en"),
      (5L, "rare19 rare20 rare21 rare22 rare23 rare24 rare25 rare26 rare27 rare28", "en")))
    val r = operators.TextStats.perplexityBuckets(
      spark.read.parquet(s"$docs/documents.parquet"))
      .collect().map(x => x.getLong(0) ->
        (x.getLong(2), x.getDouble(3), x.getString(4))).toMap
    assert(r.values.forall(_._1 == 10L))
    val ppl = r.map { case (id, (_, p, _)) => id -> p }
    assert(ppl(0L) == ppl(1L))
    assert(ppl(0L) < ppl(2L) && ppl(2L) < ppl(3L) && ppl(3L) < ppl(4L))
    assert(ppl(4L) == ppl(5L)) // all-singleton docs share one surprisal
    // 6 docs → tertiles of exactly 2; ties broken by doc_id
    assert(r(0L)._3 == "head" && r(1L)._3 == "head")
    assert(r(2L)._3 == "middle" && r(3L)._3 == "middle")
    assert(r(4L)._3 == "tail" && r(5L)._3 == "tail")
  }

  test("q125: chunk boundaries, overlap, and trailing partial are exact") {
    val text = (0 until 100).map(i => s"t$i").mkString(" ")
    val dir = writeDocs(Seq((0L, text, "en")))
    val r = operators.Pipeline.ragChunks(
      spark.read.parquet(s"$dir/documents.parquet"))
      .collect().map(x => (x.getInt(1), x.getInt(2), x.getInt(3),
        x.getString(4), x.getString(5), x.getLong(6)))
    def chars(lo: Int, hi: Int) = (lo to hi).map(i => s"t$i".length.toLong).sum
    assert(r.toSeq == Seq(
      (0, 0, 64, "t0", "t63", chars(0, 63)),
      (1, 48, 52, "t48", "t99", chars(48, 99)),
      (2, 96, 4, "t96", "t99", chars(96, 99))))
  }

  test("q128: rrf equals the rank formula row-by-row and dual-list docs outrank equal singles") {
    val rows = operators.Pipeline.hybridRrf(TestSpark.spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val bm = Option(r.get(2)).map(_.asInstanceOf[Int])
      val cs = Option(r.get(3)).map(_.asInstanceOf[Int])
      val expect = bm.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        cs.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getDouble(4) - expect) < 1e-6, s"row $r")
      assert(bm.isDefined || cs.isDefined)
    }
    // ranks strictly ordered by (rrf desc, doc_id)
    val sorted = rows.sortBy(r => (-r.getDouble(4), r.getLong(1)))
    assert(sorted.map(_.getInt(0)).toSeq == (1 to 20))
  }

  test("q129: perfect co-occurrence scores pmi=1 bit, independence 0; band prunes df extremes") {
    // 20 docs: x,y together in 1-10; z in 11-20; w in 6-15; c in ALL 20
    // (df = N > 0.85N → pruned); q appears once (df < 5 → pruned).
    val docs = (1L to 20L).map { i =>
      val toks = Seq("c") ++
        (if (i <= 10) Seq("x", "y") else Seq("z")) ++
        (if (i >= 6 && i <= 15) Seq("w") else Nil) ++
        (if (i == 1) Seq("q") else Nil)
      (i, toks.mkString(" "), "en")
    }
    val dir = writeDocs(docs)
    val r = operators.TextStats.tokenPmi(
      TestSpark.spark.read.parquet(s"$dir/documents.parquet"))
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getDouble(5))).toMap
    assert(r(("x", "y")) == ((10L, 1.0)))          // log2(10·20/(10·10)) = 1
    assert(r(("w", "x")) == ((5L, 0.0)))           // log2(5·20/(10·10)) = 0
    assert(r(("w", "z")) == ((5L, 0.0)))
    assert(!r.keySet.exists(p => p._1 == "c" || p._2 == "c"), "df=N token must be pruned")
    assert(!r.keySet.exists(p => p._1 == "q" || p._2 == "q"), "df<5 token must be pruned")
    assert(!r.contains(("x", "z")) && !r.contains(("y", "z")), "never-co-occurring pair")
  }

  test("q125: a doc shorter than one chunk yields exactly one full-doc chunk") {
    val dir = writeDocs(Seq((7L, "a b c", "en")))
    val r = operators.Pipeline.ragChunks(
      spark.read.parquet(s"$dir/documents.parquet")).collect()
    assert(r.length == 1)
    val x = r.head
    assert((x.getInt(1), x.getInt(2), x.getInt(3), x.getString(4),
      x.getString(5), x.getLong(6)) == ((0, 0, 3, "a", "c", 3L)))
  }
}
