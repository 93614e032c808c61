package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Connected-components semantics for [[Dedup.dedupClusters]] — the
  * large-star/small-star contraction (round-7 rewrite). The DuckDB oracle
  * only proves Spark ≡ the recursive-CTE closure at q77's shallow graph;
  * these prove the contraction handles the shapes propagation could not:
  * deep chains converge in O(log² n) rounds instead of one round per hop.
  */
class DedupClustersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def clusters(pairs: Seq[(Long, Long)], maxIters: Int = 50): Map[Long, Long] = {
    import spark.implicits._
    Dedup.dedupClusters(pairs.toDF("a", "b"), maxIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain of 1000 converges under the default iteration cap") {
    // the adversarial diameter case: 0-1-2-...-999. Min-label propagation
    // needed 999 rounds (threw at the default cap); contraction must close
    // it well inside maxIters=50.
    val chain = (0L until 999L).map(i => (i, i + 1))
    assert(clusters(chain) === Map(0L -> 1000L))
  }

  test("mixed components: chain, star, triangle, pair, ordering") {
    val chain = (100L until 109L).map(i => (i, i + 1))       // 10 nodes
    val star = (1L to 5L).map(i => (0L, i))                  // 6 nodes, hub 0
    val triangle = Seq((200L, 201L), (201L, 202L), (200L, 202L))
    val pair = Seq((300L, 301L))
    val got = clusters(chain ++ star ++ triangle ++ pair)
    assert(got === Map(100L -> 10L, 0L -> 6L, 200L -> 3L, 300L -> 2L))
  }

  test("input orientation and duplicate edges do not matter") {
    // reversed pairs, duplicates, and a self-loop all canonicalize away
    val got = clusters(Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 3L), (7L, 6L)))
    assert(got === Map(1L -> 3L, 6L -> 2L))
  }

  test("two long chains do not merge") {
    val a = (0L until 200L).map(i => (i, i + 1))
    val b = (1000L until 1200L).map(i => (i, i + 1))
    assert(clusters(a ++ b) === Map(0L -> 201L, 1000L -> 201L))
  }

  test("a node whose only pair is a self-loop is a singleton cluster") {
    // (9,9) names a document even though it contributes no edge: it must
    // surface as {9: 1}, not vanish from the output (round-7 ADVICE — the
    // pre-fix canonicalization filtered lo != hi before deriving nodes)
    val got = clusters(Seq((1L, 2L), (9L, 9L)))
    assert(got === Map(1L -> 2L, 9L -> 1L))
  }
}
