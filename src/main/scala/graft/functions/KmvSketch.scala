package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** K-Minimum-Values distinct sketch (Bar-Yossef et al., RANDOM'02;
  * Beyer et al. SIGMOD'07 "Distinct-Value Synopses") as a typed Spark
  * [[Aggregator]] — the repo's mergeable-sketch pattern made explicit:
  * bounded O(k) state per group, associative/commutative `merge`, so Spark
  * runs it as a partial aggregate with map-side combine (each task reduces
  * its partition to ≤ k longs before anything shuffles — the property that
  * makes a sketch usable at 100 TB where `collect_list` + sort is not).
  *
  * The input is a 60-bit uniform hash (the engine-portable
  * `md5`-prefix-as-BIGINT used across the dedup family), NOT raw values:
  * keeping hashing outside the aggregate keeps the sketch deterministic
  * and lets the DuckDB oracle reproduce it bit-for-bit with a window
  * `row_number ≤ k` — a KMV estimate is a pure function of the k smallest
  * hashes. Distinct-value estimate: (k−1)·2⁶⁰ / h₍ₖ₎ (the unbiased KMV
  * estimator); a sketch holding fewer than k hashes has seen the whole
  * distinct set and IS the exact answer.
  *
  * The buffer is a sorted ascending Array[Long] of ≤ k distinct hashes —
  * insertion cost O(k) per kept row (rows ≥ the current k-th minimum are
  * rejected in O(log k)), negligible against the hash computation.
  */
final class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already present: KMV is over DISTINCT hashes
    else {
      val ins = -pos - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins < k) {
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      } else buf
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // merge two sorted distinct arrays, keep the k smallest distinct
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object KmvSketch {
  /** Column function: `kmv(k)(hashCol)` aggregates 60-bit hashes into the
    * sketch array. */
  def kmv(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KmvAgg(k), Encoders.scalaLong)
}
