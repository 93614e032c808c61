package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, ValueState}

/** One stream row for change monitoring: a `group` (event type / metric)
  * observed at event time `tsUs`. */
final case class GroupTick(group: String, tsUs: Long)

/** Per-group monitor state: the open day + its running count, the counts of
  * the most recent ≤13 CLOSED days (newest last), and the late-row count. */
final case class MeanShiftState(curDay: Long, curCount: Long,
                                recent: Seq[Long], nLate: Long)

/** A closed day with its trailing/preceding 7-day sums — batch q144's
  * (event_type, day, n_events, s_after, s_before) row, emitted the moment
  * the day seals. Standardization (q144's zscore) needs a series-wide
  * stddev and stays a reader-side choice; the sums are exact. */
final case class ShiftWindow(group: String, day: Long, n_events: Long,
                             s_after: Long, s_before: Long)

/** Streaming mean-shift change monitoring — the continuous twin of batch
  * q144 (`WarehouseOps.changepointMeanShift`): per group, a day closes when
  * the first row of a LATER day arrives; once 14 closed days exist, the
  * sealed day emits its trailing-7 vs preceding-7 sums. State is ONE row of
  * ≤13 longs + 3 scalars per group — constant, independent of volume —
  * and the ring advances over PRESENT days exactly like the batch ROWS
  * frames, so in-order input reproduces q144's sums verbatim
  * (spec-verified on real testdata).
  *
  * Ordering contract: rows inside a micro-batch sort by tsUs; a row behind
  * the open day is counted in `nLate` and dropped (it cannot be spliced
  * into an already-sealed day).
  */
object StreamingMeanShift {

  private val usPerDay = 86400000000L

  private final class MeanShiftProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, GroupTick, ShiftWindow] {
    @transient private var state: ValueState[MeanShiftState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[MeanShiftState]("meanshift",
        Encoders.product[MeanShiftState], ttl)

    override def handleInputRows(
        key: String, rows: Iterator[GroupTick],
        timers: TimerValues): Iterator[ShiftWindow] = {
      var s = if (state.exists()) state.get()
              else MeanShiftState(Long.MinValue, 0L, Seq.empty, 0L)
      val out = Seq.newBuilder[ShiftWindow]
      rows.toArray.sortBy(_.tsUs).foreach { t =>
        val d = t.tsUs / usPerDay
        if (d < s.curDay) s = s.copy(nLate = s.nLate + 1)
        else if (d == s.curDay || s.curDay == Long.MinValue)
          s = s.copy(curDay = d, curCount = s.curCount + 1)
        else {
          // seal curDay; emit its windows once 14 closed days exist
          val closed = s.recent :+ s.curCount
          if (closed.length >= 14) {
            val last14 = closed.takeRight(14)
            out += ShiftWindow(key, s.curDay, s.curCount,
              last14.takeRight(7).sum, last14.take(7).sum)
          }
          s = MeanShiftState(d, 1L, closed.takeRight(13), s.nLate)
        }
      }
      state.update(s)
      out.result().iterator
    }
  }

  /** @param ticks the group/time stream
    * @param ttl   retires idle groups; a revival starts a fresh history */
  def shiftWindows(ticks: Dataset[GroupTick],
                   ttl: Option[Duration] = None): Dataset[ShiftWindow] = {
    import ticks.sparkSession.implicits._
    val ttlConf = ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)
    val timeMode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    ticks
      .groupByKey(_.group)
      .transformWithState(new MeanShiftProcessor(ttlConf), timeMode, OutputMode.Append())
  }
}
