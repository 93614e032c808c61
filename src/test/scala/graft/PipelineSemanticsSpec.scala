package graft

import graft.functions.BloomPrune
import graft.operators.Pipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the training-pipeline operators — the properties the
  * sf0.01 oracle hash-match can't express: stability under corpus growth,
  * conservation, planted-contamination recall, and bloom exactness at
  * deliberately bad sizing. */
class PipelineSemanticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits.newProductEncoder
  import spark.implicits.localSeqToDatasetHolder

  private def corpus(n: Int) = (0 until n)
    .map(i => (i.toLong, s"tok$i word${i % 7} end", if (i % 2 == 0) "en" else "de", s"src${i % 3}", 20L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("hash split: growing the corpus never moves an existing doc between splits") {
    // The salted-md5 assignment depends only on the doc, not the corpus —
    // the property that keeps epoch-resumable training sets stable.
    def assignments(n: Int): Map[Long, String] = {
      val d = corpus(n)
        .withColumn("bucket", pmod(conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(":split"))), 1, 15), 16, 10).cast("long"), lit(100)))
        .withColumn("split", when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val").otherwise("test"))
      d.select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    val small = assignments(200)
    val big = assignments(400)
    small.foreach { case (id, s) => assert(big(id) == s, s"doc $id moved splits") }
  }

  test("sequence packing conserves docs and tokens; pack ids are dense per shard") {
    val packs = Pipeline.packSequences(corpus(300), budget = 64, shards = 4).collect()
    assert(packs.map(_.getLong(2)).sum == 300) // every doc in exactly one pack
    val totalTokens = corpus(300).select(sum(size(split(col("text"), " ")))).head.getLong(0)
    assert(packs.map(_.getLong(3)).sum == totalTokens)
    packs.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ids = rows.map(_.getLong(1)).sorted
      assert(ids.sameElements(ids.indices.map(_.toLong)), "pack ids not dense from 0")
    }
  }

  test("decontamination drops exactly the docs sharing a planted 5-gram") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta", "en", "bench", 30L))
    val train = Seq(
      (1L, "unrelated words that share nothing at all here", "en", "train", 40L),
      (2L, "prefix alpha beta gamma delta epsilon suffix tail", "en", "train", 40L), // contaminated
      (3L, "alpha beta gamma delta unshared tail words", "en", "train", 40L)) // only a 4-gram
    val docs = (bench ++ train).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Pipeline.decontaminate(docs, col("source") === "bench")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("en", 3L, 1L))) // 3 train docs, exactly doc 2 removed
  }

  test("profile reports nulls, distincts, and extremes exactly") {
    val df = Seq((Some(1L), Some("a")), (Some(2L), None), (None, Some("a")))
      .toDF("id", "tag")
    val out = Pipeline.profile(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))))
      .toMap
    assert(out("id") == ((2L, 2L, "1", "2")))
    assert(out("tag") == ((2L, 1L, "a", "a")))
  }

  test("incremental dedup classifies exact, near, and fresh docs correctly") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "en", "old", 40L),
      (2L, "one two three four five six seven eight nine", "en", "old", 40L))
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta", "en", "new", 40L), // exact
      (11L, "alpha beta gamma delta epsilon zeta eta CHANGED", "en", "new", 40L), // near (shares min bands)
      (12L, "completely unrelated fresh content nothing shared here", "en", "new", 50L))
    val docs = (corpus ++ batch).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.operators.Dedup.incrementalDedup(docs, col("source") === "new")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(10L) == "exact_dup")
    assert(out(11L) == "near_dup", s"got $out") // one-word suffix change keeps band mins
    assert(out(12L) == "new")
  }

  test("bloom prune + exact join stays exact even when the bloom is undersized") {
    // expectedItems=10 for 1000 keys → high fpp: MORE rows survive the
    // prune, but the exact join must still produce identical results.
    val fact = (1L to 5000L).map(i => (i, i % 1000)).toDF("row_id", "fk")
    val dim = (0L until 1000L).filter(_ % 37 == 0).map(Tuple1(_)).toDF("k")
    val plain = fact.join(dim, col("fk") === col("k")).count()
    val pruned = BloomPrune.bloomPrune(fact, col("fk"), dim, expectedItems = 10L)
      .join(dim, col("fk") === col("k")).count()
    assert(pruned == plain)
  }

  test("seeded shuffle is a permutation equal to the global single-window ranking") {
    val docs = corpus(500)
    val got = Pipeline.seededShuffle(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // exact positions 1..N, each once
    assert(got.map(_._2).sorted.toSeq == (1L to 500L).toSeq)
    // the two-phase bucketed form must reproduce the naive global ranking
    val expect = docs
      .select(col("doc_id"), graft.functions.TextExpressions.md5Hash60Col(
        concat(lit("42:"), col("doc_id").cast("string"))).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, h) => (h, id) }
      .zipWithIndex.map { case ((id, _), i) => (id, i + 1L) }
    assert(got.sortBy(_._1).toSeq == expect.sortBy(_._1).toSeq)
  }

  test("seeded shuffle: growing the corpus preserves relative order of existing docs") {
    def order(n: Int): Seq[Long] = Pipeline.seededShuffle(corpus(n)).collect()
      .sortBy(_.getLong(1)).map(_.getLong(0)).toSeq
    val small = order(200)
    val big = order(400).filter(_ < 200)
    assert(small == big) // content-addressed key: new docs interleave, never reorder
  }

  test("mixture resample fills each language budget with a stable hash-prefix") {
    val docs = corpus(400) // texts are 3 tokens each; en/de split by parity
    val targets = Map("en" -> 2800L, "de" -> 1600L)
    val rows = Pipeline.mixtureResample(docs).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val target = targets(lang)
      val sorted = rs.sortBy(_._2)
      // ranks dense from 1; cum_tok is the running sum of n_tok in rank order
      assert(sorted.map(_._2).toSeq == (1 to sorted.length).toSeq)
      assert(sorted.map(_._4).sum == sorted.last._5)
      // every selected doc started under budget; selection reaches the
      // budget, or exhausts the language (200 docs × 3 tokens = 600 here)
      assert(sorted.forall(r => r._5 - r._4 < target))
      assert(sorted.last._5 >= target || sorted.length == 200,
        s"$lang budget unfilled with docs remaining")
    }
    // prefix property: the selected set under a bigger corpus of the same
    // docs is determined per-doc by hash rank, so re-running is identical
    val again = Pipeline.mixtureResample(docs).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.sortBy(r => (r._1, r._2)).toSeq == again.sortBy(r => (r._1, r._2)).toSeq)
  }

  private def quotaRows(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(x => x.getString(0) ->
      ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))).toMap

  test("source quota: cap keeps the highest-n_chars docs; small sources keep everything") {
    val docs = ((0 until 30).map(i => (i.toLong, "t", "en", "src0", (100 + i).toLong)) ++
      (100 until 105).map(i => (i.toLong, "t", "en", "src1", 50L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = quotaRows(Pipeline.sourceQuota(docs, cap = 15, salts = 4).collect())
    // src0: 30 docs, n_chars 100..129 → top-15 are 115..129
    assert(r("src0") == ((30L, 15L, 15L,
      (100 to 129).sum.toLong, (115 to 129).sum.toLong)))
    // src1: 5 docs under the cap → all kept, nothing dropped
    assert(r("src1") == ((5L, 5L, 0L, 250L, 250L)))
  }

  test("source quota: salted two-phase selection equals the naive single window") {
    // n_chars distinct within each source (i*37 mod 199 is injective for
    // i < 199-ish per residue class) so the kept SET is unique — any
    // phase-1 shard that wrongly evicts a global-top row changes kept_chars
    val docs = (0 until 195)
      .map(i => (i.toLong, "t", "en", s"src${i % 5}", ((i * 37) % 199).toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val two = quotaRows(Pipeline.sourceQuota(docs, cap = 15, salts = 8).collect())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_chars").desc, col("doc_id"))
    val naive = docs.withColumn("rn", row_number().over(w))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("rn") <= 15, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rn") > 15, 1L).otherwise(0L)).as("n_dropped"),
        sum(col("n_chars")).as("total_chars"),
        sum(when(col("rn") <= 15, col("n_chars")).otherwise(0L)).as("kept_chars"))
      .collect()
    assert(two == quotaRows(naive))
  }

  test("filter funnel: every doc is charged to the FIRST failing rule only") {
    // d1 fails too_short AND low_alpha AND low_stopword → charged too_short;
    // d2 fails low_alpha AND low_stopword → charged low_alpha;
    // d3 fails low_stopword AND long_words → charged low_stopword;
    // d4 fails only long_words (has stopwords, high alpha, long tokens);
    // d5 passes everything.
    val d1 = "1234 5678 90"
    val d2 = Seq.fill(30)("ab12").mkString(" ")
    val d3 = Seq.fill(25)("abcde").mkString(" ")
    val d4 = (Seq.fill(3)("the") ++ Seq.fill(27)("abcdef")).mkString(" ")
    val d5 = (Seq.fill(5)("the") ++ Seq.fill(20)("abcde")).mkString(" ")
    val docs = Seq(d1, d2, d3, d4, d5).zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = graft.operators.TextStats.filterFunnel(docs).collect()
      .map(x => x.getString(1) -> x.getLong(2)).toMap
    assert(r == Map("too_short" -> 1L, "low_alpha" -> 1L,
      "low_stopword" -> 1L, "long_words" -> 1L, "kept" -> 1L))
  }

  test("bm25 recovers the hand-computed Okapi scores on a planted corpus") {
    // doc 0: tf(spark)=2, tf(join)=1, dl=4; doc 1: tf(spark)=1, dl=4;
    // doc 2: no query terms. N=3, avgdl=4 so the length norm is exactly 1
    // and score = sum_t idf(t)·tf·(k1+1)/(tf+k1), idf = ln((N-df+.5)/(df+.5)+1).
    val docs = Seq(
      (0L, "spark spark join x", "en", "s", 18L),
      (1L, "spark y y y", "en", "s", 11L),
      (2L, "z z z z", "en", "s", 7L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Pipeline.bm25TopK(docs, Seq("spark", "join")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val idfSpark = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)
    val idfJoin = math.log((3 - 1 + 0.5) / (1 + 0.5) + 1.0)
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    val s0 = r6(idfSpark * 2 * 2.2 / (2 + 1.2) + idfJoin * 1 * 2.2 / (1 + 1.2))
    val s1 = r6(idfSpark * 1 * 2.2 / (1 + 1.2))
    assert(out.toSeq == Seq((1, 0L, 2, s0), (2, 1L, 1, s1))) // doc 2 absent
  }

  test("q168: weighted sampling always takes the dominant-weight doc first; deterministic") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-aes").toString
    // one doc outweighs the rest a millionfold: its key ln(u)/w is the
    // closest to zero, so E-S selection ranks it first with near certainty
    ((0L until 100L).map(i => (i, s"doc $i", "en", "s", 50L + i)) :+
      (100L, "whale", "en", "s", 50000000000L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val docs = Tables(spark, dir, "documents")
    val top = operators.Pipeline.weightedSample(docs, k = 10).collect()
    assert(top.head.getLong(0) == 100L, s"whale not first: ${top.head}")
    // no RNG anywhere: the sample is identical under a different partitioning
    val again = operators.Pipeline.weightedSample(docs.repartition(7), k = 10)
      .collect()
    assert(top.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
  }

  test("phrase search: adjacency only — reversed and gapped occurrences never match") {
    val docs = Seq(
      (0L, "alpha beta gamma alpha beta", "en", "s", 27L), // matches at 1 and 4
      (1L, "alpha gamma beta", "en", "s", 16L),            // gapped — no match
      (2L, "beta alpha", "en", "s", 10L),                  // reversed — no match
      (3L, "zeta eta", "en", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val bi = Pipeline.phraseSearch(docs, Seq("alpha", "beta")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(bi == Map(0L -> ((2L, 1))), s"bigram: $bi")
    // the 3-chain: only the LEADING occurrence extends to the trigram
    val tri = Pipeline.phraseSearch(docs, Seq("alpha", "beta", "gamma")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(tri == Map(0L -> ((1L, 1))), s"trigram: $tri")
    // degenerate single-token phrase = plain postings lookup
    val uni = Pipeline.phraseSearch(docs, Seq("beta")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(uni == Map(0L -> ((2L, 2)), 1L -> ((1L, 3)), 2L -> ((1L, 1))), s"unigram: $uni")
  }
}
