package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, ValueState}

/** One journey event for a user; `tsUs` is event time in epoch micros. */
final case class JourneyEvent(user_id: Long, event_type: String, tsUs: Long)

/** Per-user journey cursor: the previous event type plus the (ts) high-water
  * mark and late count — all a first-order transition counter needs. */
final case class JourneyState(lastType: String, hwmUs: Long, nLate: Long)

/** One observed transition (cur → nxt), `n` occurrences within the emitting
  * micro-batch for the user. Summing `n` over the whole output stream gives
  * exactly the batch q135 counts when input arrives in event order —
  * deltas, not totals, so the sink aggregation is a plain rolling sum. */
final case class TransitionDelta(user_id: Long, cur: String, nxt: String, n: Long)

/** Streaming first-order Markov transition counting — the continuous twin
  * of batch q135 (`ProductAnalytics.eventTransitions`): each user carries
  * ONE previous event type; every in-order arrival emits the (prev → cur)
  * transition it completes. State is O(active users) × one string, the
  * smallest state any sequence analytics can carry.
  *
  * Ordering contract (as the rest of the streaming family): rows inside a
  * micro-batch are sorted by (tsUs, event_type); rows behind the user's
  * high-water mark cannot be spliced into an already-consumed sequence —
  * counted in `n_late` via the state, dropped from the deltas. In-order
  * input reproduces the batch lead() transition multiset exactly
  * (spec-verified against q135 on real testdata).
  */
object StreamingTransitions {

  private final class TransitionProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, JourneyEvent, TransitionDelta] {
    @transient private var state: ValueState[JourneyState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[JourneyState]("journey",
        Encoders.product[JourneyState], ttl)

    override def handleInputRows(
        key: Long, rows: Iterator[JourneyEvent],
        timers: TimerValues): Iterator[TransitionDelta] = {
      val batch = rows.toArray.sortBy(e => (e.tsUs, e.event_type))
      var s = if (state.exists()) state.get() else JourneyState(null, Long.MinValue, 0L)
      val counts = scala.collection.mutable.LinkedHashMap.empty[(String, String), Long]
      batch.foreach { e =>
        if (e.tsUs < s.hwmUs) {
          s = s.copy(nLate = s.nLate + 1)
        } else {
          if (s.lastType != null) {
            val k = (s.lastType, e.event_type)
            counts(k) = counts.getOrElse(k, 0L) + 1L
          }
          s = JourneyState(e.event_type, e.tsUs, s.nLate)
        }
      }
      state.update(s)
      counts.iterator.map { case ((cur, nxt), n) => TransitionDelta(key, cur, nxt, n) }
    }
  }

  /** @param events the journey stream (watermark upstream)
    * @param ttl    idle-user cursor eviction; a revisit after eviction
    *               starts a fresh sequence (no cross-gap transition) */
  def transitionDeltas(events: Dataset[JourneyEvent],
                       ttl: Option[Duration] = None): Dataset[TransitionDelta] = {
    import events.sparkSession.implicits._
    val ttlConf = ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)
    val timeMode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    events
      .groupByKey(_.user_id)
      .transformWithState(new TransitionProcessor(ttlConf),
        timeMode, OutputMode.Append())
  }
}
