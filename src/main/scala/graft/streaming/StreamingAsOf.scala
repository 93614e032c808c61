package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stream-stream AS-OF join — the streaming twin of the first-class batch
  * operator ([[graft.plans.AsOfJoin]], q63): for every left event, attach
  * the value of the LATEST right event with the same key and
  * `right.ts <= left.ts`. Spark's built-in stream-stream joins express
  * interval containment ([[StreamStreamJoinSpec]]) but not "latest prior
  * per key" — that needs ordered per-key state, which is exactly what
  * `flatMapGroupsWithState` provides.
  *
  * Mechanics: both inputs are normalized onto one event schema, unioned,
  * watermarked once, and co-processed per key (the classic two-input
  * connect pattern). A left emits only after the watermark passes its
  * timestamp — at that point no admissible right with `rts <= lts` can
  * still arrive, so the answer is final (same reason the batch operator
  * can sort-merge). Results are append-mode and exact modulo late data
  * beyond the watermark delay, which is dropped like in any watermarked op.
  *
  * BOUNDED STATE — the 100 TB-forever argument, per key:
  *   - pending lefts: only those above the watermark (≤ delay window);
  *   - rights above the watermark: ≤ delay window;
  *   - rights at or below the watermark: COLLAPSED to the single latest
  *     one — any future left has `lts >= wm`, so among sub-watermark
  *     rights only the latest can ever be its as-of match. That collapse
  *     is what an interval join cannot do (it must keep the whole
  *     interval) and why as-of state is O(delay-window + 1), not O(lookback).
  *   - idle keys: once no lefts are pending, an event-time timeout at
  *     `wm + idleTtlMs` fully evicts the key's state. A key must re-earn
  *     its sub-watermark right after eviction, trading a possible
  *     unmatched left after `idleTtlMs` of silence for hard state bounds
  *     on high-churn key spaces (set it large for stable key sets).
  */
object StreamingAsOf {

  /** One normalized event on either side of the join. `ts` stays a
    * timestamp all the way to the stateful operator: it is the watermarked
    * event-time column, and projecting it away (e.g. to epoch millis)
    * strips the watermark the EventTimeTimeout needs. */
  private[streaming] case class Ev(key: Long, ts: Timestamp, isLeft: Boolean,
                                   id: Long, v: Double)

  /** Per-key state: `belowTs/belowV/hasBelow` is the collapsed latest
    * sub-watermark right; `rights`/`lefts` hold events above it. */
  private[streaming] case class St(belowTs: Long, belowV: Double, hasBelow: Boolean,
                                   rights: List[(Long, Double)],
                                   lefts: List[(Long, Long)])

  /** key, left id, left event time, value of the latest right at-or-before
    * it (None = no prior right known). */
  case class Out(key: Long, id: Long, ts: Timestamp, asof: Option[Double])

  /** @param left      streaming DF with `leftKey`, `leftTs`, `leftId`
    * @param right     streaming DF with `rightKey`, `rightTs`, `rightVal`
    * @param delay     watermark delay for BOTH sides (e.g. "10 seconds")
    * @param idleTtlMs evict a key's state this long (event time) after its
    *                  last pending left resolves */
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, leftTs: String, leftId: String,
           rightKey: String, rightTs: String, rightVal: String,
           delay: String, idleTtlMs: Long = 3600L * 1000): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    require(left.isStreaming && right.isStreaming,
      "both sides must be streaming; use graft.plans.AsOf.join for batch")
    require(idleTtlMs > 0,
      "idleTtlMs must be positive: the eviction timeout is set to wm + idleTtlMs " +
        "and EventTimeTimeout requires a timestamp strictly above the watermark")
    val l = left.select(col(leftKey).cast("long").as("key"), col(leftTs).as("ts"),
      lit(true).as("isLeft"), col(leftId).cast("long").as("id"), lit(0.0).as("v"))
    val r = right.select(col(rightKey).cast("long").as("key"), col(rightTs).as("ts"),
      lit(false).as("isLeft"), lit(0L).as("id"), col(rightVal).cast("double").as("v"))
    val events = l.unionByName(r)
      .withWatermark("ts", delay)
      .select(col("key"), col("ts"), col("isLeft"), col("id"), col("v"))
      .as[Ev]

    events.groupByKey(_.key)
      .flatMapGroupsWithState[St, Out](OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(process(idleTtlMs))
      .toDF()
  }

  private def process(idleTtlMs: Long)(
      key: Long, rows: Iterator[Ev], state: GroupState[St]): Iterator[Out] = {
    val wm = state.getCurrentWatermarkMs()
    var st = state.getOption.getOrElse(St(0L, 0.0, false, Nil, Nil))
    rows.foreach { e =>
      if (e.isLeft) st = st.copy(lefts = (e.ts.getTime, e.id) :: st.lefts)
      else st = st.copy(rights = (e.ts.getTime, e.v) :: st.rights)
    }
    // finalize lefts the watermark has passed: every admissible right is in
    val (done, pending) = st.lefts.partition(_._1 <= wm)
    val out = done.sortBy(identity).map { case (lms, id) =>
      val cands = st.rights.filter(_._1 <= lms) ++
        (if (st.hasBelow && st.belowTs <= lms) List((st.belowTs, st.belowV)) else Nil)
      // deterministic tie-break on equal timestamps: larger value wins
      val best = if (cands.isEmpty) None else Some(cands.max)
      Out(key, id, new Timestamp(lms), best.map(_._2))
    }
    // collapse rights the watermark has passed down to the latest one
    val (below, above) = st.rights.partition(_._1 <= wm)
    val allBelow = below ++ (if (st.hasBelow) List((st.belowTs, st.belowV)) else Nil)
    val newBelow = if (allBelow.isEmpty) None else Some(allBelow.max)
    st = St(newBelow.map(_._1).getOrElse(0L), newBelow.map(_._2).getOrElse(0.0),
      newBelow.isDefined, above, pending)

    if (pending.isEmpty && above.isEmpty && !st.hasBelow) {
      state.remove()
    } else if (state.hasTimedOut && pending.isEmpty && above.isEmpty) {
      // idle TTL elapsed with nothing in flight: evict the collapsed right
      state.remove()
    } else {
      state.update(st)
      // wake exactly when the oldest pending left becomes final, or after
      // the idle TTL to evict; both are strictly above the current wm as
      // EventTimeTimeout requires (pending lefts survived `<= wm` above)
      state.setTimeoutTimestamp(
        if (pending.nonEmpty) pending.map(_._1).min else wm + idleTtlMs)
    }
    out.iterator
  }
}
