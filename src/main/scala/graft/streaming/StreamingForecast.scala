package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, ValueState}

/** Per-group forecast state: the open day + count, and per weekday slot
  * the last CLOSED (epoch day, count) — 7 slots, the whole seasonal-naive
  * model. */
final case class ForecastState(curDay: Long, curCount: Long,
                               lastDay: Seq[Long], lastCount: Seq[Long],
                               nLate: Long)

/** One scored forecast: day `day` sealed with `actual` events against the
  * same-weekday prediction from exactly 7 days earlier. Emitted ONLY when
  * day−7 was itself a closed day — the same inner-join rule as batch
  * q149, so summing |err| and actual over the stream reproduces its WMAPE
  * numerator/denominator exactly. */
final case class ForecastEval(group: String, day: Long, actual: Long,
                              predicted: Long, abs_err: Long)

/** Streaming seasonal-naive forecast scoring — the continuous twin of
  * batch q149 (`WarehouseOps.forecastBacktest`): each group carries 7
  * weekday slots plus the open day (9 longs of state, volume-independent);
  * a day seals when a later day's first row arrives, scores against its
  * slot if the slot holds day−7, then takes the slot over. In-order input
  * reproduces the batch join's per-day (actual, predicted) pairs verbatim
  * minus each group's final, never-sealed day (spec-verified on real
  * testdata). Same ordering/late-row contract as [[StreamingMeanShift]].
  */
object StreamingForecast {

  private val usPerDay = 86400000000L

  private final class ForecastProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, GroupTick, ForecastEval] {
    @transient private var state: ValueState[ForecastState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[ForecastState]("forecast",
        Encoders.product[ForecastState], ttl)

    override def handleInputRows(
        key: String, rows: Iterator[GroupTick],
        timers: TimerValues): Iterator[ForecastEval] = {
      var s = if (state.exists()) state.get()
              else ForecastState(Long.MinValue, 0L, Seq.fill(7)(Long.MinValue),
                Seq.fill(7)(0L), 0L)
      val out = Seq.newBuilder[ForecastEval]
      rows.toArray.sortBy(_.tsUs).foreach { t =>
        val d = t.tsUs / usPerDay
        if (d < s.curDay) s = s.copy(nLate = s.nLate + 1)
        else if (d == s.curDay || s.curDay == Long.MinValue)
          s = s.copy(curDay = d, curCount = s.curCount + 1)
        else {
          val dow = (s.curDay % 7).toInt
          if (s.lastDay(dow) == s.curDay - 7)
            out += ForecastEval(key, s.curDay, s.curCount, s.lastCount(dow),
              math.abs(s.curCount - s.lastCount(dow)))
          s = ForecastState(d, 1L,
            s.lastDay.updated(dow, s.curDay),
            s.lastCount.updated(dow, s.curCount), s.nLate)
        }
      }
      state.update(s)
      out.result().iterator
    }
  }

  /** @param ticks the group/time stream
    * @param ttl   retires idle groups; a revival restarts the weekday model */
  def forecastEvals(ticks: Dataset[GroupTick],
                    ttl: Option[Duration] = None): Dataset[ForecastEval] = {
    import ticks.sparkSession.implicits._
    val ttlConf = ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)
    val timeMode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    ticks
      .groupByKey(_.group)
      .transformWithState(new ForecastProcessor(ttlConf), timeMode, OutputMode.Append())
  }
}
