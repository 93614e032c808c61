package graft

import graft.functions.{TextExpressions, VectorExpressions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-4 native expressions replaced interpreted HOF/aggregate
  * pipelines for speed; these tests pin that they compute EXACTLY the same
  * values — the equivalences the oracle hash-matches rely on. Each check
  * evaluates both forms over one generated corpus (seeded random + planted
  * edge cases: empty docs, consecutive spaces / empty tokens, short docs)
  * and compares row-for-row.
  */
class NativeExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val corpus: Seq[String] = {
    val rnd = new scala.util.Random(42)
    val edge = Seq("", " ", "  ", "one", "one two", "a  b c", " lead", "trail ",
      "x y z", "dup dup dup dup")
    val random = (1 to 200).map { _ =>
      (0 until rnd.nextInt(60)).map { _ =>
        if (rnd.nextInt(10) == 0) "" else rnd.alphanumeric.take(1 + rnd.nextInt(7)).mkString
      }.mkString(" ")
    }
    edge ++ random
  }

  private lazy val docs = {
    import spark.implicits._
    corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  test("TokenShingles == transform(sequence, concat_ws) for random docs") {
    val rows = docs.withColumn("toks", split(col("text"), " "))
      .withColumn("fast", TextExpressions.tokenShingles(col("text"), 3))
      .withColumn("slow", when(size(col("toks")) >= 3, expr(
        "transform(sequence(0, size(toks)-3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
        .otherwise(expr("array()")))
      .select(col("fast"), col("slow")).collect()
    assert(rows.length == corpus.length)
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), r))
  }

  test("MinHashSig == array_min of the transform-based universal hashes") {
    val (a0, b0, p) = (1926525167L, 12345L, 4294967311L)
    val (a1, b1) = (688951733L, 67890L)
    val rows = docs
      .withColumn("sh", TextExpressions.tokenShingles(col("text"), 3))
      .filter(size(col("sh")) > 0)
      .withColumn("fast", TextExpressions.minhashSig(col("sh"), Seq(a0, a1), Seq(b0, b1), p))
      .withColumn("slow0", array_min(expr(
        s"transform(sh, x -> ($a0 * cast(conv(substring(md5(x), 1, 8), 16, 10) as bigint) + $b0) % $p)")))
      .withColumn("slow1", array_min(expr(
        s"transform(sh, x -> ($a1 * cast(conv(substring(md5(x), 1, 8), 16, 10) as bigint) + $b1) % $p)")))
      .select(col("fast"), col("slow0"), col("slow1")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == Seq(r.getLong(1), r.getLong(2)), r)
    }
  }

  test("SimHash64 == explode + 60-counter aggregate recomposition") {
    val fast = docs
      .select(col("id"), TextExpressions.simhash64(col("text"), 60).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bitSums = (0 until 60).map(j =>
      sum(when(expr(s"(shiftright(v, $j) & 1) = 1"), 1).otherwise(-1)).as(s"b$j"))
    val recompose = (0 until 60).map(j =>
      s"(CASE WHEN b$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")
    val slow = docs
      .select(col("id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("v", expr("cast(conv(substring(md5(tok), 1, 15), 16, 10) as bigint)"))
      .groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"), expr(recompose).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast.keySet == slow.keySet && fast == slow)
  }

  test("DotProduct / SumOfSquares == aggregate(zip_with) folds, bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 100).map { _ =>
      ((0 until 16).map(_ => rnd.nextDouble * 2000 - 1000),
        (0 until 16).map(_ => rnd.nextDouble * 2000 - 1000))
    }
    val rows = pairs.toDF("a", "b")
      .withColumn("fastDot", VectorExpressions.dotProduct(col("a"), col("b")))
      .withColumn("slowDot",
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x))
      .withColumn("fastSq", VectorExpressions.sumOfSquares(col("a")))
      .withColumn("slowSq",
        aggregate(col("a"), lit(0.0), (acc, x) => acc + x * x))
      .select(col("fastDot"), col("slowDot"), col("fastSq"), col("slowSq")).collect()
    rows.foreach { r =>
      // == on Double: bit-for-bit equality is the contract (same fold order)
      assert(r.getDouble(0) == r.getDouble(1), s"dot: $r")
      assert(r.getDouble(2) == r.getDouble(3), s"sumsq: $r")
    }
  }

  test("DotProduct / SumOfSquares are null-faithful: length mismatch and null elements") {
    // zip_with pads unequal lengths with nulls and the fold propagates them
    // to a NULL total; aggregate does the same for null elements. The
    // native expressions must agree — VectorRewrite substitutes them into
    // arbitrary user plans.
    import spark.implicits._
    val df = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0, 2.0, 3.0)), // length mismatch
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)),     // null element
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)))      // clean
      .toDF("a", "b")
    val rows = df
      .withColumn("fastDot", VectorExpressions.dotProduct(col("a"), col("b")))
      .withColumn("slowDot",
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x))
      .withColumn("fastSq", VectorExpressions.sumOfSquares(col("a")))
      .withColumn("slowSq",
        aggregate(col("a"), lit(0.0), (acc, x) => acc + x * x))
      .select("fastDot", "slowDot", "fastSq", "slowSq").collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"dot nullability: $r")
      assert(r.isNullAt(2) == r.isNullAt(3), s"sumsq nullability: $r")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1), s"dot: $r")
      if (!r.isNullAt(2)) assert(r.getDouble(2) == r.getDouble(3), s"sumsq: $r")
    }
    assert(rows(0).isNullAt(0) && rows(1).isNullAt(0) && !rows(2).isNullAt(0))
    assert(rows(1).isNullAt(2) && !rows(0).isNullAt(2))
  }

  test("PackDoubles == big-endian doubleToLongBits bytes; null-faithful; " +
      "digest separates unequal vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (1 to 50).map(_ => (0 until 8).map(_ => rnd.nextDouble * 4 - 2)) ++
      Seq(Seq.empty[Double], Seq(0.0), Seq(-0.0), Seq(Double.MaxValue, Double.MinPositiveValue))
    val rows = vecs.map(v => Tuple1(v)).toDF("a")
      .withColumn("packed", VectorExpressions.packDoubles(col("a")))
      .select(col("a"), col("packed")).collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](0)
      val bb = java.nio.ByteBuffer.allocate(8 * v.length) // big-endian default
      v.foreach(x => bb.putLong(java.lang.Double.doubleToLongBits(x)))
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]](1), bb.array()),
        s"packed bytes drift for $v")
    }
    // null element => null (the other vector expressions' fold semantics)
    val nullRow = Seq(Tuple1(Seq[java.lang.Double](1.0, null))).toDF("a")
      .select(VectorExpressions.packDoubles(col("a"))).collect()(0)
    assert(nullRow.isNullAt(0))
    // the digest use: md5(pack(v)) equal iff vectors byte-equal
    val digs = Seq(Seq(1.0, 2.0), Seq(1.0, 2.0), Seq(1.0, 2.0000000001))
      .map(v => Tuple1(v)).toDF("a")
      .select(md5(VectorExpressions.packDoubles(col("a")))).collect().map(_.getString(0))
    assert(digs(0) == digs(1) && digs(0) != digs(2))
  }

  test("ScaleRound == transform(x -> floor(x*scale + 0.5)), bit-for-bit; null-faithful") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vecs = (1 to 100).map(_ => (0 until 16).map(_ => rnd.nextDouble * 4 - 2))
    val rows = vecs.toDF("a")
      .withColumn("scale", lit(127.0) / greatest(array_max(col("a")), array_min(col("a")) * -1))
      .withColumn("fast", VectorExpressions.scaleRound(col("a"), col("scale")))
      .withColumn("slow", transform(col("a"), x => floor(x * col("scale") + 0.5)))
      .select(col("fast"), col("slow")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Double](0) == r.getSeq[Double](1), s"quantize: $r")
    }
    val nulls = Seq(Seq[java.lang.Double](1.0, null)).toDF("a")
      .select(VectorExpressions.scaleRound(col("a"), lit(2.0)).as("q")).collect()
    assert(nulls(0).isNullAt(0))
  }

  test("Md5Hash60 == conv(substring(md5(s),1,15),16,10) incl. unicode and empties") {
    import spark.implicits._
    val extra = Seq("", " ", "héllo wörld", "日本語テキスト", "a" * 500,
      "1:ab", "123:bs42", "\u0000nul byte")
    val strs = (corpus ++ extra).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "s")
    val rows = strs
      .withColumn("fast", graft.functions.TextExpressions.md5Hash60Col(col("s")))
      .withColumn("slow",
        expr("cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)"))
      .select(col("fast"), col("slow")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
  }

  test("DeletionHashes == the deduped ≤2-deletion variant set, by count and equality") {
    // Scala reference: materialize all ≤2-deletion STRINGS, dedupe, count —
    // the hash set must be exactly one hash per distinct variant, and two
    // strings share a hash iff they share a variant (no observed collision
    // on the fixture — collisions would only ADD q133 candidates anyway).
    def variants(s: String): Set[String] = {
      val dels1 = (0 until s.length).map(i => s.substring(0, i) + s.substring(i + 1))
      (Seq(s) ++ dels1 ++ dels1.flatMap(d =>
        (0 until d.length).map(i => d.substring(0, i) + d.substring(i + 1)))).toSet
    }
    def hashes(s: String): Set[Long] =
      TextExpressions.deletionHashes(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), 128)
        .toLongArray().toSet
    val fixtures = Seq("Customer#000000123", "Customer#000001230", "abc", "a", "",
      "aaaaaa", "Customer#111111111")
    fixtures.foreach { s =>
      assert(hashes(s).size == variants(s).size,
        s"'$s': ${hashes(s).size} hashes vs ${variants(s).size} variants")
    }
    // shared-variant ⟺ shared-hash on an edit-distance-2 pair and a far pair
    val (a, b) = ("Customer#000000123", "Customer#000001230") // shift: ed 2
    assert((hashes(a) intersect hashes(b)).nonEmpty)
    assert(variants(a).intersect(variants(b)).nonEmpty)
    val far = "Customer#999888777"
    assert((hashes(a) intersect hashes(far)).isEmpty)
    assert(variants(a).intersect(variants(far)).isEmpty)
  }

  test("DeletionHashes k=1: one hash per distinct single-deletion variant, " +
      "exact recall under ANY single edit (VERDICT r13 #8)") {
    // k=1 pigeonhole: a delete makes t itself a 1-deletion variant of s;
    // an insert makes s a variant of t; a substitution — delete the
    // differing char from BOTH sides. 200 seeded random single edits.
    def variants1(s: String): Set[String] =
      (Seq(s) ++ (0 until s.length).map(i =>
        s.substring(0, i) + s.substring(i + 1))).toSet
    def hashes1(s: String): Set[Long] =
      TextExpressions.deletionHashes(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), 128, 1)
        .toLongArray().toSet
    Seq("Customer#000000123", "abc", "a", "", "aaaaaa").foreach { s =>
      assert(hashes1(s).size == variants1(s).size,
        s"'$s': ${hashes1(s).size} hashes vs ${variants1(s).size} variants")
    }
    val rng = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val s = (1 to 1 + rng.nextInt(20))
        .map(_ => ('a' + rng.nextInt(26)).toChar).mkString
      val pos = rng.nextInt(s.length)
      val c = ('a' + rng.nextInt(26)).toChar
      val t = rng.nextInt(3) match {
        case 0 => s.substring(0, pos) + s.substring(pos + 1)       // delete
        case 1 => s.substring(0, pos) + c + s.substring(pos)       // insert
        case _ => s.substring(0, pos) + c + s.substring(pos + 1)   // substitute
      }
      assert((hashes1(s) intersect hashes1(t)).nonEmpty,
        s"single-edit pair lost by k=1 signatures: '$s' vs '$t'")
    }
    // and a 2-substitution pair must NOT collide (that's k=2's job)
    assert((hashes1("Customer#000000123") intersect
      hashes1("Customer#000000987")).isEmpty)
  }

  test("md5_hash60's registered builder evaluates the same value as the SQL idiom") {
    // TestSpark carries no extensions (session is shared); exercise the
    // injected builder directly, like RelayExpressionsSpec's wiring test
    import org.apache.spark.sql.catalyst.expressions.Literal
    val built = graft.functions.Md5Hash60(Literal("1:ab"))
    val want = spark.sql(
      "SELECT cast(conv(substring(md5('1:ab'), 1, 15), 16, 10) as bigint) AS ref")
      .collect().head.getLong(0)
    assert(built.eval(null) == want)
  }
}
