package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

/** The delta-maintained BPE trainer against the full-recount reference on
  * RANDOM corpora — the fixed parity cases in BpeTrainSpec pin known
  * shapes; this hunts the shapes nobody plants: heavy repeats (merge-hit
  * fraction ~1), single-token and empty docs (no pairs), corpora that
  * exhaust before the round budget, and ties everywhere a 3-letter
  * alphabet forces them. Case count is small (Spark jobs per case) but
  * every case compares the FULL merge table bit-for-bit. */
object BpeDeltaParityProps extends Properties("BpeDeltaParity") {
  private lazy val spark = TestSpark.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val genDoc: Gen[String] =
    Gen.choose(0, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString(" ")))

  private val genCorpus: Gen[Seq[String]] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, genDoc))

  property("delta == recount merge tables on random corpora") =
    Prop.forAll(genCorpus, Gen.choose(1, 4)) { (texts, rounds) =>
      import spark.implicits._
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val delta = operators.TextStats.bpeTrain(docs, rounds).collect().toSeq
      val recount = operators.TextStats.bpeTrainRecount(docs, rounds).collect().toSeq
      val ok = delta == recount
      if (!ok) System.err.println(
        s"[BpeDeltaParity] corpus=$texts rounds=$rounds\n delta=$delta\n recount=$recount")
      ok
    }
}
