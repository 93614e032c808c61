package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Known-answer tests for the LLM-pipeline operators over planted fixtures —
  * invariants the DuckDB oracle can't express (it only proves Spark ≡ same
  * algorithm in SQL; these prove the algorithm finds what it must find).
  */
class LlmOpsSemanticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Mini `documents` table with planted duplicates/near-duplicates:
    *   0 & 1: identical text (exact + near dup);
    *   2: one token changed vs 0 (near dup, high jaccard);
    *   3: unrelated text.
    */
  private lazy val docsDir: String = {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val variant = base.replace("sigma", "SIGMA")
    val other = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    val dir = java.nio.file.Files.createTempDirectory("graft-docs").toString
    Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, base, "en", "src1", base.length.toLong),
      (2L, variant, "en", "src2", variant.length.toLong),
      (3L, other, "en", "src3", other.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Mini `embeddings` table: vec 1 = 2×(vec 0) → cosine exactly 1.0 with
    * vec 0; vec 2 orthogonal to vec 0; vecs 3..9 noise off-axis. */
  private lazy val embDir: String = {
    import spark.implicits._
    def unit(axis: Int): Seq[Float] =
      (0 until 64).map(d => if (d == axis) 1.0f else 0.0f)
    val rows =
      Seq((0L, unit(0), 0), (1L, unit(0).map(_ * 2.0f), 0), (2L, unit(1), 1)) ++
        (3L to 9L).map(i =>
          (i, (0 until 64).map(d => ((i * 31 + d * 7) % 11).toFloat / 11.0f), 2))
    val dir = java.nio.file.Files.createTempDirectory("graft-emb").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("exact dedup collapses identical texts") {
    // self-union doubles everything; docs 0 & 1 share a hash → one group of
    // 4 copies; docs 2,3 → groups of 2. Per-lang: 3 unique, 5 removed.
    val r = operators.Dedup.exactDedup(spark, docsDir).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_unique") == 3L)
    assert(r(0).getAs[Long]("n_removed") == 5L)
  }

  test("minhash: identical docs have identical signatures") {
    val sig = operators.Dedup.minhashSignatures(spark, docsDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (0 until 4).map(i => r.getAs[Long](s"mh$i"))).toMap
    assert(sig(0L) == sig(1L), "identical text ⇒ identical minhash signature")
    assert(sig(0L) != sig(3L), "unrelated text ⇒ different signature")
  }

  test("LSH near-dup pairs surface the planted duplicates, ranked by jaccard") {
    val pairs = operators.Dedup.lshNearDupPairs(spark, docsDir)
      .collect().map(r => ((r.getAs[Long]("a"), r.getAs[Long]("b")),
        r.getAs[Double]("jaccard"))).toMap
    assert(pairs((0L, 1L)) == 1.0, "identical docs must have jaccard 1.0")
    val nearJ = pairs.getOrElse((0L, 2L), pairs.getOrElse((1L, 2L), 0.0))
    assert(nearJ > 0.7 && nearJ < 1.0, s"one-token change ⇒ high-but-<1 jaccard, got $nearJ")
    assert(!pairs.keySet.exists { case (a, b) => b == 3L || a == 3L },
      "unrelated doc must not pair (no shared shingle ⇒ no shared minhash)")
  }

  test("sorted-neighborhood pairs find the planted dups; sub-threshold pairs are cut") {
    // 4 docs all fall inside one w=5 window, so SNM candidates cover every
    // pair and the verify stage alone decides: (0,1) exact, (0,2)/(1,2)
    // high-but-<1, anything with doc 3 below threshold → dropped.
    val pairs = operators.Dedup.snmNearDupPairs(spark, docsDir)
      .collect().map(r => ((r.getAs[Long]("a"), r.getAs[Long]("b")),
        r.getAs[Double]("jaccard"))).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs((0L, 2L)) == pairs((1L, 2L)) && pairs((0L, 2L)) > 0.7)
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L },
      "zero-overlap doc must be cut by the jaccard threshold")
    assert(pairs.size == 3)
  }

  test("entity matching: in-block near-names pair, cross-block twins don't (blocking contract)") {
    import spark.implicits._
    val customers = Seq(
      (1L, "Customer#000000001", 1, 100.00, "AUTO"),  // pairs with 2 (1 edit)
      (2L, "Customer#000000002", 1, 103.50, "AUTO"),
      (3L, "Customer#000000001", 2, 100.00, "AUTO"),  // identical name, other block
      (4L, "Cstmr#9999",         1, 100.00, "AUTO"),  // same block, > 2 edits
      (5L, "Customer#000000012", 1, 90.00, "BUILDING")) // same nation, other segment
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val r = operators.Dedup.entityMatchPairs(customers).collect()
      .map(x => (x.getLong(2), x.getLong(3)) -> (x.getInt(4), x.getLong(5))).toMap
    assert(r == Map((1L, 2L) -> ((1, 350L))))
  }

  test("entity matching: deletion signatures bound candidates under a skewed block " +
      "and keep exact recall for shifted/substituted twins") {
    import spark.implicits._
    // One (nation, segment) block of 200 mutually-dissimilar names — the
    // r12 blocking's worst case: all 200 land in one block, 19 900
    // comparisons. Pseudo-random 10-digit tails keep any two names > 4
    // edits apart (they'd need a shared ≤2-deletion variant to become
    // candidates), so the signature join must leave the block's quadratic
    // on the floor. Planted on top: a 1-substitution twin and a 2-edit
    // SHIFTED twin (insert+delete — the case a positional/Hamming blocker
    // misses but deletion signatures provably keep).
    val noise = (0 until 200).map { i =>
      val tail = "%010d".format((i * 2654435761L + 1013904223L) % 10000000000L)
      (100L + i, s"Customer#$tail", 1, 100.0 + i, "AUTO")
    }
    val planted = Seq(
      (900L, "Customer#1234567890", 1, 10.00, "AUTO"),
      (901L, "Customer#1234567990", 1, 20.00, "AUTO"),  // 1 substitution
      (902L, "Customer#0123456789", 1, 30.00, "AUTO"))  // shift (ins+del): ed=2
    val customers = (noise ++ planted)
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val cand = operators.Dedup.entityMatchCandidates(customers)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSet
    assert(cand.contains((900L, 901L)) && cand.contains((900L, 902L)),
      s"planted twins missing from candidates: $cand")
    val allPairs = 203L * 202 / 2
    assert(cand.size < allPairs / 100,
      s"candidate set not bounded: ${cand.size} of $allPairs possible")
    val matched = operators.Dedup.entityMatchPairs(customers).collect()
      .map(x => (x.getLong(2), x.getLong(3)) -> x.getInt(4)).toMap
    assert(matched((900L, 901L)) == 1 && matched((900L, 902L)) == 2)
    assert(!matched.contains((901L, 902L)), "901 vs 902 is 3 edits, must verify away")
  }

  test("entity matching at k=1: the cheap 1-deletion blocking keeps every " +
      "single-edit twin and prunes deeper than k=2 (VERDICT r13 #8)") {
    import spark.implicits._
    // Same skewed-block shape as the k=2 test. The 1-substitution twin
    // (900, 901) MUST survive k=1 blocking by pigeonhole; the shifted
    // twin (900, 902) is ins+del, which 1-deletion variants also reach
    // (delete the inserted char on one side, the dropped one's shift on
    // the other). A 2-substitution pair (903, 904) is k=2 territory: k=1
    // blocking must leave it out — the cost/recall dial the parameter
    // exists for.
    val noise = (0 until 200).map { i =>
      val tail = "%010d".format((i * 2654435761L + 1013904223L) % 10000000000L)
      (100L + i, s"Customer#$tail", 1, 100.0 + i, "AUTO")
    }
    val planted = Seq(
      (900L, "Customer#1234567890", 1, 10.00, "AUTO"),
      (901L, "Customer#1234567990", 1, 20.00, "AUTO"), // 1 substitution
      (902L, "Customer#0123456789", 1, 30.00, "AUTO"), // shift (ins+del): ed=2
      (903L, "Customer#5555500000", 1, 40.00, "AUTO"),
      (904L, "Customer#5555511000", 1, 50.00, "AUTO")) // 2 substitutions vs 903
    val customers = (noise ++ planted)
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val cand1 = operators.Dedup.entityMatchCandidates(customers, maxEdits = 1)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSet
    assert(cand1.contains((900L, 901L)), s"single-sub twin lost at k=1: $cand1")
    assert(cand1.contains((900L, 902L)), s"ins+del twin lost at k=1: $cand1")
    assert(!cand1.contains((903L, 904L)),
      "2-substitution pair must need k=2 blocking")
    val cand2 = operators.Dedup.entityMatchCandidates(customers)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSet
    assert(cand2.contains((903L, 904L)), "k=2 blocking must keep the 2-sub pair")
    assert(cand1.subsetOf(cand2), "k=1 candidates must be a subset of k=2's")
  }

  test("q189: kappa equals the statistic hand-computed from the two " +
      "classifiers' per-doc predictions on real testdata") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir, "documents")
    val nb = operators.TextStats.nbPredictions(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val heur = operators.TextStats.langIdPerDoc(
      docs.filter(col("doc_id") % 5 === 0)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted")).toMap
    val pairs = nb.keySet.intersect(heur.keySet).toSeq.map(d => (nb(d), heur(d)))
    val n = pairs.length.toLong
    val agree = pairs.count { case (a, b) => a == b }.toLong
    val peNum = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap.map {
      case (l, rowN) => rowN * pairs.count(_._2 == l)
    }.sum
    val expectKappa = BigDecimal((agree * n - peNum).toDouble / (n * n - peNum))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = operators.TextStats.kappaAgreement(spark, dir).collect()(0)
    assert(got.getLong(0) == n && got.getLong(1) == agree, s"counts: $got")
    assert(got.getDouble(4) == expectKappa, s"kappa: $got vs $expectKappa")
    assert(n > 0 && agree <= n)
  }

  test("q196: per-segment kappa equals the per-lang hand computation, and " +
      "the segment rows reconcile with q189's pooled counts") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir, "documents")
    val nb = operators.TextStats.nbPredictions(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    val heur = operators.TextStats.langIdPerDoc(
      docs.filter(col("doc_id") % 5 === 0)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted")).toMap
    val got = operators.TextStats.kappaBySegment(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(5)) None else Some(r.getDouble(5)))))
      .toMap
    val byLang = nb.keySet.intersect(heur.keySet).toSeq
      .map(d => (nb(d)._1, nb(d)._2, heur(d))).groupBy(_._1)
    assert(got.keySet == byLang.keySet, s"segments: ${got.keySet}")
    byLang.foreach { case (lang, rows) =>
      val n = rows.length.toLong
      val agree = rows.count(r => r._2 == r._3).toLong
      val peNum = rows.groupBy(_._2).map { case (l, rs) =>
        rs.length.toLong * rows.count(_._3 == l)
      }.sum
      val expect =
        if (n * n > peNum)
          Some(BigDecimal((agree * n - peNum).toDouble / (n * n - peNum))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        else None
      assert(got(lang)._1 == n && got(lang)._2 == agree, s"$lang: ${got(lang)}")
      assert(got(lang)._3 == expect, s"$lang kappa: ${got(lang)._3} vs $expect")
    }
    // the segment rows pool back to q189's totals
    val pooled = operators.TextStats.kappaAgreement(spark, dir).collect()(0)
    assert(got.values.map(_._1).sum == pooled.getLong(0))
    assert(got.values.map(_._2).sum == pooled.getLong(1))
  }

  test("agreementReport: the textbook 2x2 gives the classic kappa value") {
    import spark.implicits._
    // Cohen's worked shape: 20 yes-yes, 5 yes-no, 10 no-yes, 15 no-no →
    // po = 35/50, pe = (25·30 + 25·20)/2500 = 0.5, κ = 0.4 exactly
    val pairs =
      Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
      Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no"))
    val r = operators.TextStats.agreementReport(
      pairs.toDF("pred_a", "pred_b")).collect()(0)
    assert((r.getLong(0), r.getLong(1)) == ((50L, 35L)))
    assert((r.getDouble(2), r.getDouble(3), r.getDouble(4)) == ((0.7, 0.5, 0.4)),
      s"got $r")
  }

  test("agreementReport: degenerate single-label agreement emits kappa NULL " +
      "(pe = 1, zero denominator), the kappaBySegment guard (review catch)") {
    import spark.implicits._
    val r = operators.TextStats.agreementReport(
      Seq.fill(7)(("x", "x")).toDF("pred_a", "pred_b")).collect()(0)
    assert((r.getLong(0), r.getLong(1)) == ((7L, 7L)))
    assert((r.getDouble(2), r.getDouble(3)) == ((1.0, 1.0)))
    assert(r.isNullAt(4), s"kappa must be NULL when pe = 1, got ${r.get(4)}")
  }

  test("fingerprint: sub-8-char docs produce NULL fp and 0 grams — Spark's " +
      "two-arg sequence auto-descends on start > stop and would otherwise " +
      "fabricate phantom 8-grams (review catch)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fp").toString
    Seq(
      (1L, "abc def", "en", "s", 7L),      // 7 chars: sequence(1,0) trap
      (2L, "exactly8", "en", "s", 8L),     // boundary: exactly one gram
      (3L, "", "en", "s", 0L))             // empty text
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = operators.TextStats.fingerprint(spark, dir)
      .collect().map(x => x.getLong(0) ->
        ((Option(x.get(1)), x.getInt(3)))).toMap
    assert(r(1L) == ((None, 0)), s"7-char doc: ${r(1L)}")
    assert(r(3L) == ((None, 0)), s"empty doc: ${r(3L)}")
    assert(r(2L)._1.isDefined && r(2L)._2 == 1, s"8-char doc: ${r(2L)}")
  }

  test("filterFunnel: a >21M-char doc classifies by 64-bit products — the " +
      "cross-multiplied Int predicates wrapped negative on exactly the " +
      "huge-junk-doc class the funnel exists to catch (review catch)") {
    import spark.implicits._
    // 25M alphabetic chars, one token: al·100 = 2.5e9 overflows Int, so the
    // unfixed low_alpha predicate saw wrapped garbage and misfiled the doc;
    // the true cascade answer is low_stopword (alpha ratio 1.0, no stopwords)
    val huge = "z" * 25000000
    val r = operators.TextStats.filterFunnel(
      Seq((1L, huge, "en", "s", huge.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .collect().map(x => (x.getString(1), x.getLong(2))).toMap
    assert(r == Map("low_stopword" -> 1L), s"got $r")
  }

  test("simhash: identical docs equal; unrelated docs differ") {
    val sh = operators.Dedup.simhash(spark, docsDir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sh(0L) == sh(1L))
    assert(sh(0L) != sh(3L))
  }

  test("brute-force cosine top-k finds the scaled twin at similarity 1.0") {
    val top = operators.Similarity.cosineTopK(spark, embDir)
      .filter(col("probe_id") === 0 && col("rn") === 1).collect()
    assert(top.length == 1)
    assert(top(0).getAs[Long]("vec_id") == 1L, "2×v is the nearest by cosine")
    assert(top(0).getAs[Double]("cos_sim") == 1.0)
  }

  test("LSH ANN: scaled twin lands in the same bucket and is retrieved") {
    // scaling by a positive constant preserves every hyperplane sign, so
    // vec 0 and vec 1 share a bucket by construction.
    val r = operators.Similarity.annLsh(spark, embDir)
      .filter(col("probe_id") === 0).collect()
    assert(r.length == 1 && r(0).getAs[Long]("vec_id") == 1L &&
      r(0).getAs[Double]("cos_sim") == 1.0)
  }

  test("IVF ANN: scaled twin shares the nearest centroid and is retrieved") {
    // cosine is scale-invariant, so vec 0 and its 2× twin rank centroids
    // identically — same inverted list — and the twin is the best match.
    val r = operators.Similarity.annIvf(spark, embDir)
      .filter(col("probe_id") === 0).collect()
    assert(r.length == 1 && r(0).getAs[Long]("vec_id") == 1L &&
      r(0).getAs[Double]("cos_sim") == 1.0)
  }

  test("quality score: lexically diverse doc outranks none here, but bounds hold") {
    val q = operators.TextStats.qualityScore(spark, docsDir).collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      val v = r.getAs[Double]("quality")
      assert(v >= 0.0 && v <= 1.0, s"quality must be in [0,1], got $v")
    }
  }

  test("n-gram Jaccard pairs: identical docs score 1.0, one-token variant scores high") {
    val pairs = operators.Dedup.ngramJaccardPairs(spark, docsDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 1L)) == 1.0, s"identical docs must score 1.0; got $pairs")
    assert(pairs.contains((0L, 2L)) && pairs((0L, 2L)) > 0.5 && pairs((0L, 2L)) < 1.0)
    assert(!pairs.keySet.exists { case (a, b) => b == 3L || a == 3L },
      "unrelated doc must not pair")
  }

  test("embedding-cosine near-dup: scaled twins and the planted 2x pair are found") {
    val pairs = operators.Similarity.cosineNearDupPairs(spark, embDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // vec 1 is the planted 2x copy of vec 0 — a natural near-dup
    assert(pairs((0L, 1L)) == 1.0, s"planted pair missing; got ${pairs.keySet}")
    // every vector's manufactured twin is found through the same bucket
    assert(pairs((0L, 1000000L)) == 1.0)
    assert(pairs.values.forall(_ >= 0.999))
  }

  test("q62 approx percentiles land within rank-error of q56's exact values") {
    // accuracy=10000 bounds the RANK error at 1/10000; translate to a value
    // tolerance by accepting any value between the exact percentiles one
    // rank-percent either side — loose enough to never flake, tight enough
    // to catch a broken sketch.
    val dir = "/root/testdata/sf0.01"
    val exactW = operators.Aggregates
      .percentiles(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = operators.Aggregates.approxPercentiles(spark, dir).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet == exactW.keySet)
    approx.foreach { case (group, Seq(p50, p90, p99)) =>
      val (e50, e90, e99) = exactW(group)
      // exact percentiles are monotone: p50 <= p90 <= p99 must also hold
      assert(p50 <= p90 && p90 <= p99, s"$group not monotone: $p50 $p90 $p99")
      // each approx within 5% relative of the exact value (rank error 1e-4
      // on a smooth distribution is far tighter than this)
      Seq((p50, e50), (p90, e90), (p99, e99)).foreach { case (a, e) =>
        assert(math.abs(a - e) <= math.max(0.05 * math.abs(e), 1e-6),
          s"$group: approx $a vs exact $e")
      }
    }
  }

  test("q66 count-min sketch estimates per-user frequencies within the ε bound") {
    // CMS guarantee: est >= true, and est <= true + ε·N with prob 1-δ
    // (ε=0.001, δ=0.01 here). Check every (event_type, user) of a sample.
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val sketches = operators.Aggregates.cmsFrequency(spark, dir).collect()
      .map(r => r.getString(0) ->
        org.apache.spark.util.sketch.CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("cms")))).toMap
    val truth = graft.Tables(spark, dir, "events")
      .groupBy(col("event_type"), col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val totals = truth.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    assert(sketches.keySet == totals.keySet)
    truth.foreach { case ((et, user), n) =>
      val est = sketches(et).estimateCount(user)
      assert(est >= n, s"$et/$user: CMS must never undercount ($est < $n)")
      assert(est <= n + math.max(1L, (0.001 * totals(et)).toLong) + 1,
        s"$et/$user: est $est vs true $n exceeds eps bound")
    }
  }

  test("q64 merged daily HLL sketches estimate weekly distincts within bound") {
    // lgConfigK=12 default ⇒ rsd ≈ 1.04/√4096 ≈ 1.6%; gate at 5%. The
    // point under test: UNION of per-day sketches equals a direct weekly
    // sketch up to sketch error — mergeability, the property that lets
    // daily sketches answer weekly questions without rescanning raw data.
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val exact = graft.Tables(spark, dir, "events")
      .withColumn("week", date_trunc("week", to_date(col("ts"))).cast("date"))
      .groupBy(col("event_type"), col("week"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2)).toMap
    val est = operators.Aggregates.hllUnionRollup(spark, dir)
      .collect().map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2)).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (k, e) =>
      val x = exact(k)
      assert(math.abs(e - x) <= math.max(2L, (0.05 * x).toLong), s"$k: est $e vs exact $x")
    }
  }

  test("q21 HLL sketch is within 3·rsd of q20's exact distinct, per group") {
    // q21 has no DuckDB oracle by design (sketches differ by impl); this is
    // its accuracy gate (VERDICT r02 next-round item 5): at rsd=0.01 the
    // standard error is 1% of the true cardinality, so a 3-sigma band
    // catches a broken sketch while never flaking (P(outside) < 0.3%).
    val dir = "/root/testdata/sf0.01"
    val exact = operators.Aggregates.aggStats(spark, dir)
      .select("event_type", "n_users").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = operators.Aggregates.aggApproxDistinct(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (group, a) =>
      val e = exact(group)
      assert(math.abs(a - e) <= math.max(1L, (3 * 0.01 * e).toLong),
        s"$group: approx $a vs exact $e exceeds 3·rsd")
    }
  }

  test("duplicated-span coverage: identical docs fully covered, variant partially") {
    // 20-token docs, k=8 → 13 windows each. Docs 0 & 1 identical → every
    // window shared → ratio 1.0. Doc 2 differs only at token 18 ('sigma'
    // case-flip): windows starting 11..13 cover it → 3 unique, 10 shared
    // → ratio 10/13. Doc 3 shares nothing → ratio 0.
    val r = operators.Dedup.dupSpanCoverage(spark, docsDir).collect()
      .map(row => row.getLong(0) ->
        (row.getLong(1), row.getLong(2), row.getDouble(3))).toMap
    assert(r.keySet == Set(0L, 1L, 2L, 3L))
    assert(r(0L) == ((13L, 13L, 1.0)))
    assert(r(1L) == ((13L, 13L, 1.0)))
    assert(r(2L)._1 == 13L && r(2L)._2 == 10L)
    assert(math.abs(r(2L)._3 - 10.0 / 13.0) < 1e-5)
    assert(r(3L) == ((13L, 0L, 0.0)))
  }

  test("duplicated-span token coverage: overlapping windows union, not sum") {
    // Docs 0 & 1: every window duplicated → all 20 tokens covered. Doc 2:
    // duplicated windows start 1..10, covering tokens 1..17 (union of
    // overlapping 8-grams — 10 windows × 8 tokens would overcount 4.7×).
    // Doc 3: nothing shared → 0 covered.
    val r = operators.Dedup.dupSpanCut(spark, docsDir).collect()
      .map(row => row.getLong(0) ->
        (row.getLong(1), row.getLong(2), row.getDouble(3))).toMap
    assert(r(0L) == ((20L, 20L, 1.0)))
    assert(r(1L) == ((20L, 20L, 1.0)))
    assert(r(2L) == ((20L, 17L, 0.85)))
    assert(r(3L) == ((20L, 0L, 0.0)))
  }

  test("semantic decontamination: threshold hits counted, clean evals report null") {
    import spark.implicits._
    // evals: 0 = x-axis, 1 = z-axis. train: 100 = 2×eval0 (cos exactly 1),
    // 101 orthogonal to both, 103 = 45° off eval0 (cos ≈ 0.707 ≥ θ=0.5),
    // 104 at cos ≈ 0.316 (below θ). eval1 has no neighbor within θ.
    val corpus = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 0f, 1f, 0f)),
      (100L, Seq(2f, 0f, 0f, 0f)), (101L, Seq(0f, 1f, 0f, 0f)),
      (103L, Seq(1f, 1f, 0f, 0f)), (104L, Seq(1f, 3f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val r = operators.Similarity
      .semanticDecontaminate(corpus, col("vec_id") < 10, theta = 0.5)
      .collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), Option(x.get(2)).map(_.asInstanceOf[Double]), x.getBoolean(3))))
      .toMap
    assert(r(0L) == ((2L, Some(1.0), true)))
    assert(r(1L) == ((0L, None, false)))
    assert(r.keySet == Set(0L, 1L), "every eval doc reports, hit or not")
  }

  test("bpe merge candidates: adjacent-pair counts, tie order, cumulative coverage") {
    import spark.implicits._
    // d0 "a b a b c" → pairs (a b)×2, (b a), (b c); d1 single-token → no
    // pairs (guards the sequence(1, size-1) edge); d2 "a b" → (a b).
    // Totals: 5 pairs; top: (a b)=3, then the 1-count tie breaks by pair asc.
    val docs = Seq((0L, "a b a b c"), (1L, "x"), (2L, "a b"))
      .map { case (i, t) => (i, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = operators.TextStats.bpeMergeCandidates(docs, topK = 10).collect()
      .map(x => (x.getInt(0), x.getString(1), x.getLong(2), x.getDouble(3), x.getDouble(4)))
    assert(r.toSeq == Seq(
      (1, "a b", 3L, 0.6, 0.6),
      (2, "b a", 1L, 0.2, 0.8),
      (3, "b c", 1L, 0.2, 1.0)))
  }

  test("kmeans recovers planted clusters with a cross-cluster init") {
    import spark.implicits.newProductEncoder
    import spark.implicits.localSeqToDatasetHolder
    // Two tight planted clusters around axis-0 and axis-1; vec 0 and vec 1
    // sit in DIFFERENT true clusters so the lowest-id init spans both.
    def v(axis: Int, eps: Float): Seq[Float] =
      (0 until 64).map(d => (if (d == axis) 1.0f else 0.0f) + (if (d == 63) eps else 0.0f))
    val rows = Seq(
      (0L, v(0, 0.0f)), (1L, v(1, 0.0f)),
      (2L, v(0, 0.1f)), (3L, v(1, 0.1f)),
      (4L, v(0, -0.1f)), (5L, v(1, -0.1f)))
    val out = operators.Similarity.kmeansTrain(
        rows.toDF("vec_id", "embedding"), k = 2, rounds = 2).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    // cluster 0 = {0,2,4} (axis-0), cluster 1 = {1,3,5} (axis-1)
    assert(out.toSeq == Seq((0, 3L, 0L, 4L), (1, 3L, 1L, 5L)))
  }

  test("pagerank on a planted 1-NN graph matches the hand-run recurrence") {
    import spark.implicits.newProductEncoder
    import spark.implicits.localSeqToDatasetHolder
    // a=e0, b=e0+0.1·e2, c=e1+0.2·e0 → 1-NN edges a→b, b→a, c→a
    // (cos(a,b)≈.995; cos(c,a)≈.196 just beats cos(c,b)≈.195).
    def base(axis: Int) = (0 until 64).map(d => if (d == axis) 1.0f else 0.0f)
    val rows = Seq(
      (0L, base(0)),
      (1L, base(0).updated(2, 0.1f)),
      (2L, base(1).updated(0, 0.2f)))
    val out = operators.Similarity.simPagerank(
        rows.toDF("vec_id", "embedding"), k = 1, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(x => x._1 -> x._2).toSeq == Seq(0L -> 2L, 1L -> 1L, 2L -> 0L))
    // hand-run the fixed-point recurrence (1e12 rank units; out-degree 1
    // everywhere in this fixture, so the integer div is a no-op)
    var r = Map(0L -> 1000000000000L / 3, 1L -> 1000000000000L / 3,
      2L -> 1000000000000L / 3)
    val in = Map(0L -> Seq(1L, 2L), 1L -> Seq(0L), 2L -> Seq.empty[Long])
    (1 to 3).foreach { _ =>
      r = in.map { case (v, srcs) =>
        v -> (math.floor((1 - 0.85) * 1e12 / 3).toLong
          + math.floor(0.85 * srcs.map(r).sum).toLong)
      }
    }
    out.foreach { case (v, _, pr) =>
      assert(math.abs(pr - r(v) / 1e12) < 1e-8, s"node $v") }
    // rank mass is conserved up to rounding: sums to 1
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-6)
  }

  test("PQ+ADC with a full-coverage shortlist reduces exactly to brute force") {
    // 10 vectors, shortlist 20 → the ADC stage shortlists every candidate,
    // so the exact-cosine rerank must reproduce q44's brute-force answer
    // verbatim — this pins the encode/LUT/join plumbing without depending
    // on quantization quality.
    val pq = operators.Similarity.pqAdc(spark, embDir).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = operators.Similarity.cosineTopK(spark, embDir).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(pq == exact, s"PQ diverged from brute force:\n$pq\nvs\n$exact")
  }

  test("IVFADC: probing all lists reduces to brute force; nprobe=1 stays in-list") {
    import spark.implicits.newProductEncoder
    import spark.implicits.localSeqToDatasetHolder
    // the kmeans fixture: two tight clusters, vec 0/1 in different ones so
    // the lowest-id coarse init spans both
    def v(axis: Int, eps: Float): Seq[Float] =
      (0 until 64).map(d => (if (d == axis) 1.0f else 0.0f) + (if (d == 63) eps else 0.0f))
    val df = Seq(
      (0L, v(0, 0.0f)), (1L, v(1, 0.0f)), (2L, v(0, 0.1f)),
      (3L, v(1, 0.1f)), (4L, v(0, -0.1f)), (5L, v(1, -0.1f)))
      .toDF("vec_id", "embedding")
    // nprobe = kc → no pruning; shortlist covers all 5 candidates → exact
    val all = operators.Similarity.ivfAdc(df, col("vec_id") < 6,
        kc = 2, nprobe = 2, kp = 4, shortlist = 10, topK = 2).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    val exact = operators.Similarity.cosineTopK(df, col("vec_id") < 6, 2).collect()
      .map(r => (r.getLong(0), r.getAs[Int]("rn")) -> r.getLong(1)).toMap
    assert(all == exact, s"unpruned IVFADC diverged:\n$all\nvs\n$exact")
    // nprobe = 1: probe 0 searches only its own coarse list {0,2,4}; its
    // in-cluster twins tie on cosine and the vec_id tiebreak picks 2
    val pruned = operators.Similarity.ivfAdc(df, col("vec_id") === 0,
      kc = 2, nprobe = 1, kp = 4, shortlist = 10, topK = 1).collect()
    assert(pruned.length == 1 && pruned.head.getLong(1) == 2L,
      s"in-list neighbor not found: ${pruned.mkString}")
  }

  test("q172: AUC is 1.0 on separable classes; midrank ties score 0.75 by hand") {
    import spark.implicits._
    def doc(id: Long, text: String, lang: String) =
      (id, text, lang, "s", text.length.toLong)
    // train: disjoint vocab. held-out: doc 0 (en) and doc 5 (fr) share the
    // SAME text — identical 'en' scores, a genuine midrank tie; doc 10 is
    // pure fr vocab, scoring lowest. Ascending ranks: doc10=1, tie at 2/3
    // (avg 2.5). AUC = (2.5 - 1)/(1*2) = 0.75.
    val dir = java.nio.file.Files.createTempDirectory("graft-auc").toString
    (Seq(
      doc(0L, "hello the world", "en"),
      doc(5L, "hello the world", "fr"),
      doc(10L, "bonjour le monde", "fr")) ++
      (1L to 4L).map(i => doc(i, "hello the world yes", "en")) ++
      (6L to 9L).map(i => doc(i, "bonjour le monde oui", "fr")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = operators.TextStats.classifierAuc(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((1L, 2L, 0.75)),
      s"unexpected AUC row: $r")

    // separable control: drop the mislabeled twin → the en doc outranks
    // both fr docs and AUC is exactly 1.0
    val dir2 = java.nio.file.Files.createTempDirectory("graft-auc2").toString
    (Seq(
      doc(0L, "hello the world", "en"),
      doc(5L, "bonjour le monde", "fr"),
      doc(10L, "bonjour le monde", "fr")) ++
      (1L to 4L).map(i => doc(i, "hello the world yes", "en")) ++
      (6L to 9L).map(i => doc(i, "bonjour le monde oui", "fr")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val r2 = operators.TextStats.classifierAuc(spark, dir2).collect().head
    assert((r2.getLong(0), r2.getLong(1), r2.getDouble(2)) == ((1L, 2L, 1.0)),
      s"unexpected separable AUC: $r2")
  }

  test("q188: the misprediction lands in the low-margin bucket with exact " +
      "micro-nat edges; high-margin buckets stay clean") {
    import spark.implicits._
    // Symmetric disjoint-vocab model (4 en / 4 fr train docs, equal token
    // counts, equal priors). Held-out: doc 0 (en, 4 en tokens → margin
    // 4·1609438 µnats, correct), doc 10 (fr, 2 fr tokens → 2·1609438,
    // correct), doc 5 (fr, one token of EACH vocab → scores exactly equal,
    // margin 0, tie predicts 'en' → WRONG). With 2 buckets the ntile puts
    // {doc5, doc10} in bucket 1 (accuracy 0.5) and {doc0} in bucket 2.
    val docs = (Seq(
      (0L, "hello world hello world", "en", "s", 23L),
      (5L, "bonjour hello", "fr", "s", 13L),
      (10L, "bonjour monde", "fr", "s", 13L)) ++
      (1L to 4L).map(i => (i, "hello world yes", "en", "s", 15L)) ++
      (6L to 9L).map(i => (i, "bonjour monde oui", "fr", "s", 17L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = 1609438L // round(ln(5/18)·1e6) − round(ln(1/18)·1e6)
    val r = operators.TextStats.calibrationTable(docs, buckets = 2).collect()
      .map(x => x.getInt(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getDouble(5)))).toMap
    assert(r == Map(
      1 -> ((2L, 1L, 0L, 2 * m, 0.5)),
      2 -> ((1L, 1L, 4 * m, 4 * m, 1.0))), s"got: $r")
  }

  test("q174: class-exclusive tokens score the hand-computed chi2; shared tokens score 0") {
    import spark.implicits._
    def doc(id: Long, text: String, lang: String) =
      (id, text, lang, "s", text.length.toLong)
    val dir = java.nio.file.Files.createTempDirectory("graft-chi").toString
    // 2 en + 2 fr train docs; 'bonjour' is fr-exclusive (a=2 b=0 c=0 d=2,
    // N=4, L=2): chi2 = 4*(2*2-0)^2/(2*2*2*2) = 4.0. 'the' is in all four
    // docs: ad = bc → chi2 = 0.
    Seq(
      doc(1L, "the hello world", "en"), doc(2L, "the hello there", "en"),
      doc(3L, "the bonjour monde", "fr"), doc(4L, "the bonjour oui", "fr"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = operators.TextStats.chiSquareFeatures(spark, dir)
      .collect().map(x => (x.getString(0), x.getInt(4)) ->
        ((x.getString(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(("fr", 1)) == (("bonjour", 2L, 4.0)), s"fr top feature: ${r(("fr", 1))}")
    assert(r(("en", 1))._3 == 4.0) // en's exclusive tokens mirror it
    val theRow = r.values.find(_._1 == "the")
    assert(theRow.forall(_._3 == 0.0), s"shared token must score 0: $theRow")
  }

  test("q167: power iteration recovers a planted single-axis component exactly") {
    import spark.implicits._
    // all mass on axis 3 (0-based idx 2), mixed signs: X^T X is rank-1, so
    // one iteration lands on e_3 with positive sign and stays there
    val dir = java.nio.file.Files.createTempDirectory("graft-pca").toString
    (0L until 20L).map { i =>
      val s = if (i % 2 == 0) 1.0f else -1.0f
      (i, (0 until 8).map(d2 => if (d2 == 2) s * (1.0f + (i % 3)) else 0.0f), 0)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = operators.Similarity.pcaPower(spark, dir).collect()
      .map(x => x.getInt(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(r.size == 8)
    assert(r(3) == ((1000000L, 1.0)), s"axis component wrong: ${r(3)}")
    (r - 3).values.foreach { case (vq, l) => assert(vq == 0L && l == 0.0, r) }
  }

  test("q167: Gram-form iterates equal the per-iteration recurrence exactly (opt r21)") {
    import spark.implicits._
    // mixed-sign, multi-axis corpus exercising negative t (HALF_UP vs
    // math.round divergence class) and the BigInt matvec: the in-test
    // reference runs the PRE-r21 recurrence s_r=⟨x_r,v⟩, t=Σ s·x in exact
    // integers — the rewrite's claim is t = G·v is the same integer vector
    def q(x: Double): Long = java.math.BigDecimal.valueOf(x * 100)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    val rnd = new scala.util.Random(42)
    val d = 6
    val rows = (0L until 50L).map { i =>
      (i, (0 until d).map(_ => (rnd.nextDouble() * 2 - 1).toFloat), 0)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-pca2").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val xq = rows.map(_._2.map(f => q(f.toDouble)).toArray)
    var v = Array.fill(d)(BigInt(math.round(1e6 / math.sqrt(d.toDouble))))
    for (_ <- 1 to 3) {
      val t = Array.tabulate(d) { dd =>
        xq.foldLeft(BigInt(0)) { (acc, x) =>
          val s = (0 until d).foldLeft(BigInt(0))((a, e) => a + BigInt(x(e)) * v(e))
          acc + s * x(dd)
        }
      }
      val n2 = t.map(ti => math.pow(ti.toDouble, 2)).sum
      v = t.map(ti => BigInt(java.math.BigDecimal
        .valueOf(ti.toDouble * 1e6 / math.sqrt(n2))
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue))
    }
    val got = operators.Similarity.pcaPower(spark, dir).collect()
      .map(x => x.getInt(0) -> x.getLong(1)).toMap
    val want = (1 to d).map(i => i -> v(i - 1).toLong).toMap
    assert(got == want, s"iterate diverged: got $got want $want")
  }

  test("q177: seen transitions score ln(3/4); unseen back off to the ln(1/3) floor") {
    import spark.implicits._
    def doc(id: Long, text: String, lang: String) =
      (id, text, lang, "s", text.length.toLong)
    // train "a b a b": c2(a b)=2, c2(b a)=1, c1(a)=2, c1(b)=1, V=2.
    // test 'x' doc "a b": ll = ln((2+1)/(2+2)) → avg_nll 0.287682
    // test 'y' doc "b b": unseen pair → ln((0+1)/(1+2)) → 1.098612
    val dir = java.nio.file.Files.createTempDirectory("graft-lm").toString
    Seq(doc(1L, "a b a b", "x"), doc(0L, "a b", "x"), doc(5L, "b b", "y"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = operators.TextStats.bigramLm(spark, dir).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r == Map(
      "x" -> ((1L, 1L, 0.287682)),
      "y" -> ((1L, 1L, 1.098612))), s"unexpected NLL: $r")
  }

  test("q176: decile boundaries land on exact integer ranks of the planted values") {
    import spark.implicits._
    // 11 vectors, dim-1 values 0..10: pos(k) = (10k div 10)+1 = k+1, so
    // decile k's boundary is exactly k; dim 2 is constant 5
    val dir = java.nio.file.Files.createTempDirectory("graft-dec").toString
    (0L to 10L).map(i => (i, Seq(i.toFloat, 5.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = operators.Similarity.dimDeciles(spark, dir).collect()
      .map(x => (x.getInt(0), x.getInt(1)) -> x.getDouble(2)).toMap
    assert(r.size == 22)
    (0 to 10).foreach { k =>
      assert(r((1, k)) == k.toDouble, s"dim1 decile $k: ${r((1, k))}")
      assert(r((2, k)) == 5.0)
    }
  }

  test("q166: NB classifier learns disjoint vocabularies; unseen tokens don't flip a doc") {
    import spark.implicits._
    // two langs with disjoint vocab; doc_ids 0/5/10 are the held-out fifth.
    // test doc 10 ('fr') carries one unseen token — smoothing must not flip it.
    def doc(id: Long, text: String, lang: String) =
      (id, text, lang, "s", text.length.toLong)
    val dir = java.nio.file.Files.createTempDirectory("graft-nb").toString
    (Seq(
      doc(0L, "bonjour le monde", "fr"),
      doc(5L, "hello the world", "en"),
      doc(10L, "bonjour le monde UNSEEN", "fr")) ++
      (1L to 4L).map(i => doc(i, "bonjour le monde oui", "fr")) ++
      (6L to 9L).map(i => doc(i, "hello the world yes", "en")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = operators.TextStats.nbLangClassifier(spark, dir).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r == Map("fr" -> ((2L, 2L, 1.0)), "en" -> ((1L, 1L, 1.0))),
      s"unexpected classification: $r")
  }
}
