package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** q203's BPE trainer on planted fixtures with hand-computed merges:
  * argmax + lexicographic tie-break, GREEDY LEFT-TO-RIGHT within-sequence
  * application (the capsule `replace` rule), fused tokens re-entering the
  * pair pool, and the pairs-exhausted early stop. */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("hand-computed 3-round merge table: ties lexicographic, fused tokens re-merge") {
    // round 1 pairs: (a,a)=2 [doc1 greedy], (a,b)=2, (b,c)=1 — tie on 2
    //   broken lexicographically: (a,a) < (a,b) → merge (a,a), total 5
    // doc1 'a a a b' rewrites GREEDILY: [a a][a][b] (not [a][a a][b])
    // round 2 pairs: ('a a',a)=1, (a,b)=2, (b,c)=1 → merge (a,b), total 4
    // round 3 pairs: ('a a','a b')=1, ('a b',c)=1 — tie broken on p1:
    //   'a a' < 'a b' → merge ('a a','a b'), total 2
    val out = operators.TextStats.bpeTrain(docs("a a a b", "a b c"), rounds = 3)
      .collect().toSeq
    assert(out === Seq(
      Row(1, "a", "a", 2L, 0.4),
      Row(2, "a", "b", 2L, 0.5),
      Row(3, "a a", "a b", 1L, 0.5)))
  }

  test("greedy left-to-right: four repeats merge into two fused tokens in ONE round") {
    // 'a a a a' under merge (a,a) must become [a a][a a] — round 2's top
    // pair is then ('a a','a a'), proving the round-1 rewrite produced
    // exactly two capsules (an overlap-allowing rewrite would differ)
    val out = operators.TextStats.bpeTrain(docs("a a a a", "a a a a"), rounds = 2)
      .collect().toSeq
    assert(out === Seq(
      Row(1, "a", "a", 6L, 1.0),
      Row(2, "a a", "a a", 2L, 1.0)))
  }

  test("pairs exhausted: the loop stops early and emits only realized merges") {
    // round 1 merges the only pair; round 2+ have no adjacent pairs left
    val out = operators.TextStats.bpeTrain(docs("a b"), rounds = 4).collect().toSeq
    assert(out === Seq(Row(1, "a", "b", 1L, 1.0)))
  }

  test("no realizable merge at all: empty merge table with the full schema") {
    // every doc is a single token (or empty) — round 1 realizes nothing
    val out = operators.TextStats.bpeTrain(docs("a", "bb", ""), rounds = 3)
    assert(out.columns.toSeq === Seq("step", "p1", "p2", "n_occ", "pct"))
    assert(out.collect().isEmpty)
  }

  test("bpeApply on the training corpus reproduces the trainer's final rewrite") {
    import spark.implicits._
    val d = Seq((0L, "en", "a a a b"), (1L, "en", "a b c"))
      .toDF("doc_id", "lang", "text")
    val merges = operators.TextStats.bpeTrain(d, rounds = 3)
    // doc1: m1 → [a a][a][b], m2 → [a a][a b], m3 → [a a a b] = 1 token
    // doc2: m2 → [a b][c] = 2 tokens; before = 4 + 3 = 7, after = 3
    val out = operators.TextStats.bpeApply(d, merges, rounds = 3).collect().head
    assert(out === Row("en", 2L, 7L, 3L, 0.428571))
  }

  test("bpeApply null-guards steps beyond an early-stopped merge table") {
    import spark.implicits._
    val d = Seq((0L, "en", "a b")).toDF("doc_id", "lang", "text")
    val merges = operators.TextStats.bpeTrain(d, rounds = 4) // 1 realized merge
    val out = operators.TextStats.bpeApply(d, merges, rounds = 4).collect().head
    assert(out === Row("en", 1L, 2L, 1L, 0.5))
  }

  test("delta pair counting ≡ full recount: bit-identical merge tables " +
      "on planted and real corpora (VERDICT r16 #3)") {
    val T = operators.TextStats
    // planted: early stop, ties, re-merging fused tokens, repeat runs
    val planted = docs("a a a b", "a b c", "a a a a", "x y x y x", "a b", "z")
    assert(T.bpeTrain(planted, rounds = 5).collect().toSeq
      == T.bpeTrainRecount(planted, rounds = 5).collect().toSeq)
    // real corpus at the production round count
    val real = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    assert(T.bpeTrain(real).collect().toSeq
      == T.bpeTrainRecount(real).collect().toSeq,
      "delta-maintained counts diverged from the recount on real data")
  }

  test("q209 vocab store: a gen-pinned encoder is byte-stable while gen-N+1 " +
      "publishes, reads prune to one generation, and the diff labels govern") {
    import spark.implicits._
    val T = operators.TextStats
    val corpusA = Seq((0L, "en", "a a a b"), (1L, "en", "a b c"))
      .toDF("doc_id", "lang", "text")
    // the ingest batch that grows the corpus: c-heavy, shifts the argmax
    val corpusB = corpusA.unionAll(
      Seq((2L, "en", "c c c c c c"), (3L, "en", "b c b c"))
        .toDF("doc_id", "lang", "text"))
    val vocabDir = java.nio.file.Files
      .createTempDirectory("graft-bpe-vocab-spec-").toString

    T.bpeVocabPublish(vocabDir, 1, T.bpeTrain(corpusA, rounds = 3))
    val gen1Rows = T.bpeVocabGen(spark, vocabDir, 1).collect().toSeq
    val encodedBefore =
      T.bpeApply(corpusA, T.bpeVocabGen(spark, vocabDir, 1), rounds = 3)
        .collect().toSeq

    // gen 2 trains and publishes while gen 1 serves
    T.bpeVocabPublish(vocabDir, 2, T.bpeTrain(corpusB, rounds = 3))

    // publish-once is ENFORCED, not documentation (ADVICE r17): re-publishing
    // an existing generation must fail instead of silently doubling its rows
    val dup = intercept[IllegalArgumentException] {
      T.bpeVocabPublish(vocabDir, 1, T.bpeTrain(corpusA, rounds = 3))
    }
    assert(dup.getMessage.contains("already published"))

    // pinned generation: identical rows, identical encode — a rollback is
    // nothing but reading the older generation
    val gen1After = T.bpeVocabGen(spark, vocabDir, 1)
    assert(gen1After.collect().toSeq == gen1Rows,
      "published generation mutated by a later publish")
    assert(T.bpeApply(corpusA, gen1After, rounds = 3).collect().toSeq
      == encodedBefore, "gen-pinned encoder not byte-stable across a publish")

    // the gen filter is a PARTITION filter: one generation dir scanned
    val scans = gen1After.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty &&
      scans.map(_.selectedPartitions.partitionCount).max == 1,
      "gen-pinned read scanned more than one generation partition")

    // governance diff: corpusB's c-flood must add/move/remove something
    val diff = T.bpeVocabDiff(T.bpeVocabGen(spark, vocabDir, 1),
      T.bpeVocabGen(spark, vocabDir, 2), rounds = 3).collect().toSeq
    val statuses = diff.map(_.getString(4)).toSet
    assert(statuses.subsetOf(Set("added", "removed", "rank_moved", "stable")))
    assert(statuses.contains("added") || statuses.contains("rank_moved"),
      s"ingest shifted nothing? diff=$diff")
    // every gen-1 merge appears exactly once on the old side
    assert(diff.count(r => !r.isNullAt(2)) == gen1Rows.size)
  }

  test("q211 rollout A/B: identical vocabs change nothing; a diverging vocab " +
      "moves tokens and flags exactly the re-encoded docs") {
    import spark.implicits._
    val T = operators.TextStats
    val d = Seq((0L, "en", "a a a b"), (1L, "en", "a b c"), (2L, "de", "c c"))
      .toDF("doc_id", "lang", "text")
    val vocab = T.bpeTrain(d, rounds = 3)
    // same vocab on both sides: zero changed docs, identical compression
    val same = T.bpeRolloutAb(d, vocab, vocab, rounds = 3)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(same.values.forall(_.getAs[Long]("docs_changed") == 0L))
    assert(same("en").getAs[Double]("compression_old")
      == same("en").getAs[Double]("compression_new"))
    // diverging vocab: train without doc 0 — the (a,a)-heavy doc is gone,
    // so merge ranks shift; docs re-encode and the flag counts exactly them
    val vocab2 = T.bpeTrain(d.filter(col("doc_id") =!= 0), rounds = 3)
    val ab = T.bpeRolloutAb(d, vocab, vocab2, rounds = 3)
      .collect().map(r => r.getString(0) -> r).toMap
    val enChanged = ab("en").getAs[Long]("docs_changed")
    assert(enChanged >= 1L, s"vocab shift re-encoded nothing: $ab")
    // cross-check the flag against a direct per-doc re-encode comparison
    val perDocOld = T.bpeApply(d, vocab, rounds = 3)
    val perDocNew = T.bpeApply(d, vocab2, rounds = 3)
    assert(ab("en").getAs[Long]("tok_old")
      == perDocOld.filter(col("lang") === "en").collect().head.getAs[Long]("tok_after"))
    assert(ab("en").getAs[Long]("tok_new")
      == perDocNew.filter(col("lang") === "en").collect().head.getAs[Long]("tok_after"))
  }

  test("q213 packing A/B: hand-computed pack ids; a better vocab never adds packs") {
    import spark.implicits._
    val T = operators.TextStats
    val d = Seq((0L, "en", "a b c d"), (1L, "en", "e f g"), (2L, "en", "h i"))
      .toDF("doc_id", "lang", "text")
    // empty vocab (no realizable merges) → encode is identity on both
    // sides: tok = whitespace counts [4,3,2], prefixes [0,4,7], budget 4
    // → pack ids [0,1,1] → 2 packs, zero saved
    val emptyVocab = T.bpeTrain(Seq((0L, "solo")).toDF("doc_id", "text"), rounds = 3)
    val same = T.packVocabAb(d, emptyVocab, emptyVocab,
      rounds = 3, budget = 4, shards = 1).collect().head
    assert(same.getAs[Long]("n_docs") === 3L)
    assert(same.getAs[Long]("tok_old") === 9L && same.getAs[Long]("tok_new") === 9L)
    assert(same.getAs[Long]("packs_old") === 2L && same.getAs[Long]("packs_new") === 2L)
    assert(same.getAs[Long]("packs_saved") === 0L)
    // a trained vocab strictly shrinks the token stream → packs can only
    // drop (here: merges fuse within docs, tok_new < 9)
    val trained = T.bpeTrain(d, rounds = 3)
    val ab = T.packVocabAb(d, emptyVocab, trained,
      rounds = 3, budget = 4, shards = 1).collect().head
    assert(ab.getAs[Long]("tok_new") < 9L)
    assert(ab.getAs[Long]("packs_new") <= ab.getAs[Long]("packs_old"))
    assert(ab.getAs[Long]("packs_saved")
      === ab.getAs[Long]("packs_old") - ab.getAs[Long]("packs_new"))
  }

  test("vocab retention keeps the newest N generations, survivors byte-stable, " +
      "rerun idempotent") {
    import spark.implicits._
    val T = operators.TextStats
    val vocabDir = java.nio.file.Files
      .createTempDirectory("graft-bpe-retention-spec-").toString
    (1 to 4).foreach { g =>
      T.bpeVocabPublish(vocabDir, g,
        T.bpeTrain(docs("a a a b", s"round $g a b"), rounds = 2))
    }
    val pinned = T.bpeVocabGen(spark, vocabDir, 4).collect().toSeq
    assert(T.bpeVocabRetention(vocabDir, keepLast = 2) === Seq(1, 2))
    // survivors intact and byte-stable; purged gens gone from the listing
    assert(T.bpeVocabGen(spark, vocabDir, 4).collect().toSeq === pinned)
    assert(T.bpeVocabGen(spark, vocabDir, 3).collect().nonEmpty)
    val gens = spark.read.parquet(vocabDir)
      .select(col("gen")).distinct().collect().map(_.getInt(0)).sorted.toSeq
    assert(gens === Seq(3, 4))
    // idempotent: nothing left to reclaim
    assert(T.bpeVocabRetention(vocabDir, keepLast = 2).isEmpty)
  }

  test("bpeDrift labels shared, lost and gained merges with rank displacement") {
    import spark.implicits._
    val a = Seq((1, "a", "b"), (2, "c", "d")).toDF("step", "p1", "p2")
    val b = Seq((1, "c", "d"), (2, "x", "y")).toDF("step", "p1", "p2")
    val out = operators.TextStats.bpeDrift(a, b, rounds = 2).collect().toSeq
    assert(out === Seq(
      Row("a", "b", 1, null, "only_a", null),
      Row("c", "d", 2, 1, "both", -1),
      Row("x", "y", null, 2, "only_b", null)))
  }

  test("bpeSampleAgreement separates rank-exact from membership-only agreement") {
    import spark.implicits._
    val full = Seq((1, "a", "b"), (2, "c", "d")).toDF("step", "p1", "p2")
    val sample = Seq((1, "a", "b"), (2, "e", "f"), (3, "c", "d"))
      .toDF("step", "p1", "p2")
    val out = operators.TextStats.bpeSampleAgreement(full, sample).collect().toSeq
    assert(out === Seq(
      Row(1, "a", "b", "a", "b", true, true), // rank-exact
      // full's (c,d) is NOT rank-2 in the sample but IS in its vocab
      Row(2, "c", "d", "e", "f", false, true)))
  }

  test("merged token boundaries never false-match across capsule borders") {
    // tokens ('xa','a') must NOT be rewritten by merge pair (a,a): the
    // capsule delimiters make 'xa|a' distinct from 'a|a'. Corpus below has
    // (a,a) as top pair; doc2 'xa a' must survive round 1 unmerged, so
    // round 2's pairs still include (xa,a).
    val out = operators.TextStats.bpeTrain(
      docs("a a", "a a", "xa a"), rounds = 2).collect().toSeq
    assert(out.head === Row(1, "a", "a", 2L, 0.666667))
    // round 2: remaining pairs = (xa,a) only
    assert(out(1) === Row(2, "xa", "a", 1L, 1.0))
  }
}
