package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** One token occurrence tagged with its ingest batch (the streaming
  * analogue of batch q200's `doc_id div 50` batch key — any monotone
  * ingest-batch id works: file number, hour bucket, loader run id). */
final case class VocabArrival(group: String, batch: Long, token: String)

/** Per-(group, ingest batch) novelty readout: distinct types seen in the
  * batch, how many were corpus-first, the cumulative vocabulary, and
  * whether the tracker is saturated (estimates become upper bounds). */
final case class VocabNoveltyRow(group: String, batch: Long, n_types: Long,
                                 n_new: Long, cum_vocab: Long, saturated: Boolean)

/** Streaming VOCABULARY NOVELTY — batch q200's continuous twin (the
  * tokenizer-drift monitor): per ingest batch, how many token types appear
  * for the FIRST time in the corpus, and the cumulative vocabulary — the
  * Heaps'-law curve a tokenizer-training pipeline watches to decide when
  * the vocab has saturated and a BPE retrain (q203's trainer) is due.
  *
  * State is ONE MapState entry per tracked token (token → first-seen
  * batch) with the [[StreamingHeavyHitters]] capacity discipline: EXACT
  * while the group's vocabulary fits `capacity` (every answer equals
  * q200's batch answer — spec-pinned parity); past capacity the tracker
  * stops admitting tokens and keeps an overflow counter instead, so
  * `n_new`/`cum_vocab` become UPPER BOUNDS (an untracked re-arrival
  * re-counts as new across micro-batches) and every emitted row carries
  * `saturated = true` — the honest degraded mode; the bounded-sketch
  * alternative at genuinely unbounded vocabularies is the q141-twin KMV
  * pane (estimate cum_vocab as a distinct-count delta). Within one
  * micro-batch the overlay set keeps even the saturated path exact.
  *
  * Scale: state is O(groups × min(vocab, capacity)) regardless of stream
  * length; each micro-batch pre-aggregates to its DISTINCT (batch, token)
  * pairs before touching state, so state reads/writes are O(distinct
  * tokens in the micro-batch), never O(capacity). Multiple ingest batches
  * landing in one micro-batch are processed in ascending batch order; a
  * LATE token (arriving under a lower batch id than its recorded
  * first-seen) lowers the stored first-seen for downstream reads but never
  * retro-edits already-emitted rows (Update-mode semantics, same contract
  * as StreamingGrowth's daily panes). RocksDB-backed like every
  * transformWithState operator; state survives checkpointed restarts
  * (spec-pinned). */
object StreamingVocabNovelty {

  private final class FirstSeenProcessor(capacity: Int)
      extends StatefulProcessor[String, VocabArrival, VocabNoveltyRow] {
    @transient private var firstSeen: MapState[String, Long] = _
    @transient private var nTracked: ValueState[Long] = _
    @transient private var nOverflow: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      firstSeen = getHandle.getMapState[String, Long](
        "first_seen", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      nTracked = getHandle.getValueState[Long](
        "n_tracked", Encoders.scalaLong, TTLConfig.NONE)
      nOverflow = getHandle.getValueState[Long](
        "n_overflow", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        group: String, rows: Iterator[VocabArrival],
        timers: TimerValues): Iterator[VocabNoveltyRow] = {
      // micro-batch-local distinct per ingest batch, batches in order
      val batches = scala.collection.mutable.TreeMap
        .empty[Long, scala.collection.mutable.TreeSet[String]]
      rows.foreach(r => batches.getOrElseUpdate(r.batch,
        scala.collection.mutable.TreeSet.empty[String]).add(r.token))
      var tracked = if (nTracked.exists()) nTracked.get() else 0L
      var overflow = if (nOverflow.exists()) nOverflow.get() else 0L
      // overlay: untracked-but-counted tokens of THIS micro-batch, so the
      // saturated path never double-counts within one micro-batch
      val overlay = scala.collection.mutable.HashSet.empty[String]
      val out = Seq.newBuilder[VocabNoveltyRow]
      batches.foreach { case (b, toks) =>
        var nNew = 0L
        toks.foreach { t =>
          if (firstSeen.containsKey(t)) {
            // late arrival: first-seen is min(batch) for downstream reads
            if (b < firstSeen.getValue(t)) firstSeen.updateValue(t, b)
          } else if (overlay.contains(t)) {
            () // counted earlier in this micro-batch, still untracked
          } else if (tracked < capacity) {
            firstSeen.updateValue(t, b); tracked += 1; nNew += 1
          } else {
            overlay.add(t); overflow += 1; nNew += 1
          }
        }
        out += VocabNoveltyRow(group, b, toks.size.toLong, nNew,
          tracked + overflow, tracked >= capacity)
      }
      nTracked.update(tracked)
      nOverflow.update(overflow)
      out.result().iterator
    }
  }

  /** @param tokens   keyed token arrivals (pre-tokenized corpus stream)
    * @param capacity tracked tokens per group — the memory/exactness knob:
    *                 vocab ≤ capacity ⇒ bit-exact q200 parity */
  def curve(tokens: Dataset[VocabArrival], capacity: Int): Dataset[VocabNoveltyRow] = {
    require(capacity >= 1, s"capacity must be positive, got $capacity")
    import tokens.sparkSession.implicits._
    tokens
      .groupByKey(_.group)
      .transformWithState(new FirstSeenProcessor(capacity),
        TimeMode.None(), OutputMode.Update())
  }
}
