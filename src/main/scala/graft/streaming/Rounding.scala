package graft.streaming

/** The ONE rounding convention for the streaming family (ADVICE r09):
  * decimal HALF_UP, matching Spark's `round()` in the batch queries each
  * streaming operator claims parity with. Before this helper the family
  * was split — `math.rint(x * 1e6) / 1e6` is banker's rounding (HALF_EVEN)
  * AND loses the decimal boundary to binary float error, so an exact
  * half-boundary rate (e.g. 0.0000005) could rank differently in
  * StreamingTopkRate than in batch q83. Every streaming operator rounds
  * through here; none may roll its own.
  */
object Rounding {
  def r2(v: Double): Double =
    BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
  def r4(v: Double): Double =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
