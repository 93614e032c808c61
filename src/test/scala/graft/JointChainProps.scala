package graft

import java.nio.file.Files

import graft.operators.Dedup
import graft.streaming.{GateTable, JointTables, StreamingDedup,
  StreamingEmbeddingGate, StreamingJointGate}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Randomized soundness of the JOINT gate's multi-batch pair evolution:
  * StreamingJointGateSpec pins fixtures; this property drives random
  * batch splits of random (text, embedding) items through the REAL
  * [[JointTables.processBatch]] loop (two tables on storage, per-table
  * probe pruning and replay exclusion, one admit decision) and checks
  *   (1) every delivered joint frame equals an independent in-memory
  *       unrolled fold of the two surface rules + worst-of compose, and
  *   (2) the crash-between-appends state — batch N landed on the text
  *       table but not the vector table, reconstructed EXACTLY by
  *       deleting the second append — refuses pair maintenance and
  *       reconverges under the gate's own replay to the identical
  *       frame and identical pair contents.
  * A threading bug on either surface, in the admit decision, or in the
  * replay discipline shifts a status somewhere and fails set-equality. */
object JointChainProps extends Properties("JointChain") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(4) // each case seeds two tables + 4N classifies

  private lazy val spark = TestSpark.spark

  private val word = Gen.oneOf("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "x")
  private val text = Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, word))
    .map(_.mkString(" "))
  // last dim offset by 0.5 so no vector is all-zero (cosine-defined)
  private val vec: Gen[List[Double]] = Gen.listOfN(4, Gen.choose(-5, 5))
    .map(v => v.map(_.toDouble).init :+ (v.last.toDouble + 0.5))

  private case class Case(seed: List[(String, List[Double])],
                          batches: List[List[(String, List[Double])]])
  private val genCase: Gen[Case] = for {
    nSeed <- Gen.choose(1, 12)
    seed <- Gen.listOfN(nSeed, Gen.zip(text, vec))
    nBatches <- Gen.choose(1, 3)
    batches <- Gen.listOfN(nBatches, for {
      n <- Gen.choose(1, 5)
      fresh <- Gen.listOfN(n, Gen.zip(text, vec))
      dupTexts <- Gen.someOf(seed.map(_._1)) // text-only dups
      dupVecs <- Gen.someOf(seed.map(_._2))  // vector-only dups
      freshForT <- Gen.listOfN(dupTexts.size, vec)
      freshForV <- Gen.listOfN(dupVecs.size, text)
    } yield fresh ++ dupTexts.zip(freshForT) ++ freshForV.zip(dupVecs))
  } yield Case(seed, batches)

  private def df(items: Seq[(String, List[Double])], base: Long): DataFrame = {
    import spark.implicits._
    items.zipWithIndex.map { case ((t, v), i) => (base + i, t, v.toArray) }
      .toDF("doc_id", "text", "embedding")
  }

  private def frameSet(f: DataFrame): Set[(Long, String, String, String)] =
    f.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getString(3))).toSet

  private def tableRows(t: GateTable): Set[Seq[Any]] =
    t.read(spark).collect().map(_.toSeq.map {
      case a: Seq[_] => a.toList
      case x => x
    }: Seq[Any]).toSet

  property("N joint batches deliver the in-memory unrolled fold, and a " +
      "crash between the two appends replays to the identical pair") =
    Prop.forAll(genCase) { c =>
      val jt = JointTables(
        GateTable(StreamingDedup.descriptor,
          Files.createTempDirectory("graft-jcp-text-").toString),
        GateTable(StreamingEmbeddingGate.descriptor,
          Files.createTempDirectory("graft-jcp-vec-").toString))
      val seedDf = df(c.seed, 0L)
      jt.seed(seedDf)
      var streamed = Map.empty[Long, Set[(Long, String, String, String)]]
      c.batches.zipWithIndex.foreach { case (b, i) =>
        jt.processBatch(df(b, 1000L * (i + 1)), i.toLong,
          (f, id) => streamed += id -> frameSet(f))
      }

      // independent unrolled fold of the two surface rules + compose
      var tSigs = Dedup.gateSignatureData(
        seedDf.select(col("doc_id"), col("text"))).localCheckpoint(true)
      var vSigs = StreamingEmbeddingGate.signatureData(
        seedDf.select(col("doc_id").as("vec_id"), col("embedding")))
        .localCheckpoint(true)
      var want = Map.empty[Long, Set[(Long, String, String, String)]]
      c.batches.zipWithIndex.foreach { case (b, i) =>
        val bdf = df(b, 1000L * (i + 1))
        val docsB = bdf.select(col("doc_id"), col("text"))
        val vecsB = bdf.select(col("doc_id").as("vec_id"), col("embedding"))
        val joint = StreamingJointGate.compose(
          Dedup.gateClassifyProvenance(docsB, tSigs),
          StreamingEmbeddingGate.classify(vecsB, vSigs)).localCheckpoint(true)
        want += i.toLong -> frameSet(joint)
        val accIds = joint.filter(col("joint_status") === "new").select("doc_id")
        tSigs = tSigs.unionByName(Dedup.gateSignatureData(
          docsB.join(accIds, Seq("doc_id"), "left_semi"))).localCheckpoint(true)
        vSigs = vSigs.unionByName(StreamingEmbeddingGate.signatureData(
          vecsB.join(accIds.select(col("doc_id").as("vec_id")),
            Seq("vec_id"), "left_semi"))).localCheckpoint(true)
      }
      val foldParity = streamed == want

      // crash leg: run one more batch, then reconstruct crashed-between-
      // appends EXACTLY by deleting the second (vector) append
      val n = c.batches.size.toLong
      val bx = df(c.batches.head, 9000L)
      var preFrame = Set.empty[(Long, String, String, String)]
      jt.processBatch(bx, n, (f, _) => preFrame = frameSet(f))
      val (preText, preVec) = (tableRows(jt.text), tableRows(jt.vec))
      graft.Tfs.local.rmTree(
        graft.Tfs.child(jt.vec.sigDir, s"batch=$n"))
      spark.catalog.refreshByPath(jt.vec.sigDir)
      val refused =
        try { jt.compact(spark); false }
        catch { case e: IllegalArgumentException =>
          e.getMessage.contains("batch-misaligned") }
      var replayFrame = Set.empty[(Long, String, String, String)]
      jt.processBatch(bx, n, (f, _) => replayFrame = frameSet(f))
      val reconverged = replayFrame == preFrame &&
        tableRows(jt.text) == preText && tableRows(jt.vec) == preVec

      foldParity && refused && reconverged
    }
}
