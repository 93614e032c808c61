package graft

import java.nio.file.Files

import graft.operators.Dedup
import graft.streaming.{GateTable, StreamingDedup}
import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Randomized chain-length soundness of the gate's multi-batch state
  * evolution: q219 pins a 2-batch chain as an oracle-checked fixture;
  * this property drives RANDOM batch splits of random adversarial
  * corpora through the REAL [[GateTable.processBatch]] loop (storage,
  * probe pruning, own-partition exclusion) and compares every delivered
  * frame against an independent in-memory unrolled fold of the same
  * rule — the chain-length and split-position dimensions a fixture
  * can't cover. A threading bug (a batch seeing too much or too little
  * state) shifts statuses or provenance somewhere in the fold and fails
  * the set-equality. */
object GateChainProps extends Properties("GateChain") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6) // each case seeds a table + runs 2N classifies

  private lazy val spark = TestSpark.spark

  private val word = Gen.oneOf("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "κappa", "λambda", "x")
  private val doc = Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, word))
    .map(_.mkString(" "))

  private case class Case(seed: List[String], batches: List[List[String]])
  private val genCase: Gen[Case] = for {
    nSeed <- Gen.choose(1, 20)
    seed <- Gen.listOfN(nSeed, doc)
    nBatches <- Gen.choose(1, 4)
    batches <- Gen.listOfN(nBatches, for {
      n <- Gen.choose(1, 6)
      fresh <- Gen.listOfN(n, doc)
      dups <- Gen.someOf(seed) // bias: cross-batch and vs-seed dups
    } yield fresh ++ dups.toList)
  } yield Case(seed, batches)

  private def df(texts: Seq[String], base: Long): DataFrame = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (base + i, t) }.toDF("doc_id", "text")
  }

  private def frameSet(frame: DataFrame): Set[(Long, String, Long, Double)] =
    frame.collect().map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) -1L else r.getLong(2),
      if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toSet

  property("N GateLoop batches deliver exactly the in-memory unrolled fold") =
    Prop.forAll(genCase) { c =>
      val t = GateTable(StreamingDedup.descriptor,
        Files.createTempDirectory("graft-chain-prop-").toString)
      t.seed(df(c.seed, 0L))
      // the real loop, one frame per batch
      var streamed = Map.empty[Long, Set[(Long, String, Long, Double)]]
      c.batches.zipWithIndex.foreach { case (b, i) =>
        t.processBatch(df(b, 1000L * (i + 1)), i.toLong,
          (frame, id) => streamed += id -> frameSet(frame))
      }
      // the independent unrolled fold: accumulate signature DATA rows
      var sigs = Dedup.gateSignatureData(df(c.seed, 0L)).localCheckpoint(true)
      var want = Map.empty[Long, Set[(Long, String, Long, Double)]]
      c.batches.zipWithIndex.foreach { case (b, i) =>
        val bdf = df(b, 1000L * (i + 1))
        val frame = Dedup.gateClassifyProvenance(bdf, sigs).localCheckpoint(true)
        want += i.toLong -> frameSet(frame)
        val acc = bdf.join(
          frame.filter(org.apache.spark.sql.functions.col("status") === "new")
            .select("doc_id"), Seq("doc_id"), "left_semi")
        sigs = sigs.unionByName(Dedup.gateSignatureData(acc)).localCheckpoint(true)
      }
      streamed == want
    }
}
