package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, ValueState}

/** One stream row for distribution monitoring: a `group` (event type /
  * metric) observed at event time `tsUs` with an integer measurement
  * (cents, latency µs, …). */
final case class ValueTick(group: String, tsUs: Long, cents: Long)

/** Per-group drift state: the sealed REFERENCE histogram (empty while the
  * reference day is still open) and the day it was sealed on, the open
  * day + its building histogram, and the late-row count. Size is exactly
  * 2·nBins longs + 4 scalars per group — constant, independent of
  * volume. */
final case class DriftState(refHist: Seq[Long], refDay: Long, curDay: Long,
                            curHist: Seq[Long], nLate: Long)

/** A sealed post-reference day scored against the reference distribution —
  * the streaming sibling of batch q187 (KS) and q143 (PSI). `d_stat` is
  * the binned two-sample KS statistic with an exact integer numerator;
  * `psi` the Laplace-smoothed population-stability index over the same
  * bins; `drifted` the α=0.05 KS decision. */
final case class DriftScore(group: String, day: Long, n_ref: Long,
                            n_day: Long, d_stat: Double, psi: Double,
                            drifted: Boolean)

/** Streaming distribution-drift monitoring — the continuous sibling of
  * batch q187/q143 (VERDICT r13 #5): per group, values land in `nBins`
  * FIXED integer bins over [lo, hi] (fixed edges are the price of
  * streaming: a batch pass can scan min/max first, a stream cannot — the
  * clamp keeps outliers in the edge bins, q143's `least(9, …)` rule).
  * The FIRST day to seal becomes the group's REFERENCE ECDF; every later
  * sealed day emits its KS distance and PSI against that reference, the
  * "has the input distribution moved since the model/baseline was fit"
  * monitor. Both scores derive from the same exact integer histograms:
  *
  *  - KS: D = max over bin boundaries of |cumRef·nDay − cumDay·nRef| /
  *    (nRef·nDay) — the q187 cross-multiplication rule, ONE division at
  *    the end; on binned data D is exact for the binned distributions and
  *    a lower bound for the raw ones (binning can only merge crossings).
  *    The α=0.05 decision uses the classic 1.358·√((n₁+n₂)/(n₁·n₂)).
  *  - PSI: Σ (pᵢ−qᵢ)·ln(pᵢ/qᵢ) with add-one smoothing — q143's exact
  *    recipe, so a reader can compare streamed panes with batch reports.
  *
  * State per group is 2·nBins longs (reference + open day) — bounded, no
  * raw values retained. Day sealing, micro-batch bridging, and the
  * late-row contract (a row behind the open day increments `nLate` and
  * drops) follow [[StreamingMeanShift]] exactly.
  */
object StreamingDrift {

  private val usPerDay = 86400000000L

  private final class DriftProcessor(lo: Long, hi: Long, nBins: Int,
                                     relearnDays: Option[Int], ttl: TTLConfig)
      extends StatefulProcessor[String, ValueTick, DriftScore] {
    @transient private var state: ValueState[DriftState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[DriftState]("drift",
        Encoders.product[DriftState], ttl)

    private def bin(v: Long): Int = {
      val clamped = math.max(lo, math.min(hi, v))
      math.min(nBins - 1, ((clamped - lo) * nBins / (hi - lo + 1)).toInt)
    }

    private def score(key: String, day: Long, ref: Seq[Long],
                      cur: Seq[Long]): DriftScore = {
      val nRef = ref.sum
      val nDay = cur.sum
      var cumRef = 0L; var cumDay = 0L; var dNum = 0L
      var i = 0
      while (i < nBins) {
        cumRef += ref(i); cumDay += cur(i)
        val diff = math.abs(cumRef * nDay - cumDay * nRef)
        if (diff > dNum) dNum = diff
        i += 1
      }
      val d = dNum.toDouble / (nRef.toDouble * nDay)
      val crit = 1.358 * math.sqrt((nRef + nDay).toDouble / (nRef.toDouble * nDay))
      var psi = 0.0
      i = 0
      while (i < nBins) {
        val p = (ref(i) + 1).toDouble / (nRef + nBins)
        val q = (cur(i) + 1).toDouble / (nDay + nBins)
        psi += (p - q) * math.log(p / q)
        i += 1
      }
      DriftScore(key, day, nRef, nDay, d, psi, d > crit)
    }

    override def handleInputRows(
        key: String, rows: Iterator[ValueTick],
        timers: TimerValues): Iterator[DriftScore] = {
      val zero = Seq.fill(nBins)(0L)
      var s = if (state.exists()) state.get()
              else DriftState(Seq.empty, Long.MinValue, Long.MinValue, zero, 0L)
      val out = Seq.newBuilder[DriftScore]
      rows.toArray.sortBy(_.tsUs).foreach { t =>
        val d = t.tsUs / usPerDay
        if (d < s.curDay) s = s.copy(nLate = s.nLate + 1)
        else {
          if (d > s.curDay && s.curDay != Long.MinValue) {
            // seal curDay: it becomes the reference if none exists,
            // otherwise it scores against the reference — and, with
            // relearn enabled, REPLACES the reference once the epoch is
            // relearnDays old (concept-drift-aware monitoring: the scored
            // day becomes the new normal, so a PERMANENT regime change
            // alarms once and then re-baselines instead of alarming
            // forever; choose the horizon longer than any drift you must
            // keep seeing)
            if (s.refHist.isEmpty)
              s = s.copy(refHist = s.curHist, refDay = s.curDay)
            else {
              out += score(key, s.curDay, s.refHist, s.curHist)
              if (relearnDays.exists(r => s.curDay - s.refDay >= r))
                s = s.copy(refHist = s.curHist, refDay = s.curDay)
            }
            s = s.copy(curHist = zero)
          }
          val h = s.curHist.updated(bin(t.cents), s.curHist(bin(t.cents)) + 1)
          s = s.copy(curDay = d, curHist = h)
        }
      }
      state.update(s)
      out.result().iterator
    }
  }

  /** @param ticks the group/time/value stream
    * @param lo,hi,nBins the fixed bin layout (values clamp to [lo, hi])
    * @param relearnDays re-seal the reference from the scored day once the
    *              current reference epoch is this many days old (None =
    *              the first day stays the reference forever); must exceed
    *              0 — the scored day still ALWAYS scores against the old
    *              reference before replacing it, so the regime-change
    *              alarm is never swallowed
    * @param ttl   retires idle groups; a revival re-learns its reference */
  def driftScores(ticks: Dataset[ValueTick], lo: Long, hi: Long,
                  nBins: Int = 10, relearnDays: Option[Int] = None,
                  ttl: Option[Duration] = None): Dataset[DriftScore] = {
    require(nBins >= 2 && hi > lo, "need a real bin layout")
    require(relearnDays.forall(_ > 0), "relearn horizon must be positive")
    import ticks.sparkSession.implicits._
    val ttlConf = ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)
    val timeMode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    ticks
      .groupByKey(_.group)
      .transformWithState(new DriftProcessor(lo, hi, nBins, relearnDays, ttlConf),
        timeMode, OutputMode.Append())
  }
}
