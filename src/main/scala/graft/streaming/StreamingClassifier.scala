package graft.streaming

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.udf

/** Model SERVING over a document stream — the continuous twin of q166's
  * trained naive-Bayes classifier, in the shape production quality/language
  * filters actually run (a fastText-style linear model broadcast to
  * executors, scored map-side): fit once in batch ([[fit]] collects the
  * q166 model frames), then classify every arriving document with a
  * STATELESS per-row function — no shuffle, no watermark, no state store,
  * so the classifier composes freely with downstream stateful ops (the
  * StreamingCorpus gate/dedup chain) and a restart has nothing to recover.
  *
  * The score arithmetic is q166's bit for bit: quantized integer micro-nat
  * log-likelihoods summed per token (order-independent), prior added, ties
  * broken by lexicographically smallest language — `StreamingClassifierSpec`
  * pins exact prediction parity with the batch scorer on real testdata.
  *
  * Scale notes: the model is vocab × langs longs — tens of MB at web scale,
  * an explicit [[org.apache.spark.SparkContext.broadcast]] (one copy per
  * executor, not per task). Inference cost is O(tokens) per row with zero
  * exchange, so classifier throughput scales with source parallelism.
  */
object StreamingClassifier {

  /** Fitted model: token log-likelihoods keyed "lang\u0000tok", per-lang
    * unseen-token default and log-prior, languages sorted for the
    * deterministic argmax tie-break. */
  case class NbModel(ll: Map[String, Long], dflt: Map[String, Long],
                     prior: Map[String, Long], langs: Seq[String]) {
    def predict(text: String): String = {
      val toks = text.split(" ").filter(_.nonEmpty)
      var bestLang: String = null
      var bestScore = Long.MinValue
      for (lang <- langs) { // sorted: first win = smallest lang on a tie
        val d = dflt(lang)
        var s = prior(lang)
        for (t <- toks) s += ll.getOrElse(lang + "\u0000" + t, d)
        if (s > bestScore) { bestScore = s; bestLang = lang }
      }
      bestLang
    }
  }

  /** Collect q166's model frames into serveable maps (driver-side; the
    * frames themselves are computed distributed). */
  def fit(docs: DataFrame): NbModel =
    collectModel(graft.operators.TextStats.nbModelFrames(docs))

  /** Fit from a testdata dir through the snapshot-keyed [[graft.operators.Materialize]]
    * registry (VERDICT r14 #1): the training pass is shared with the six
    * batch consumers instead of re-run per stream start. */
  def fit(spark: org.apache.spark.sql.SparkSession, dir: String): NbModel =
    collectModel(graft.operators.TextStats.nbModelFramesCached(spark, dir))

  private def collectModel(frames: (DataFrame, DataFrame)): NbModel = {
    val (model, stats) = frames
    val ll = model.collect()
      .map(r => r.getString(0) + "\u0000" + r.getString(1) -> r.getLong(2)).toMap
    val st = stats.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    NbModel(ll, st.map { case (k, v) => k -> v._1 },
      st.map { case (k, v) => k -> v._2 }, st.keys.toSeq.sorted)
  }

  /** Prediction column over a broadcast model — usable on static frames
    * and streams alike (stateless). */
  def predictCol(model: Broadcast[NbModel], text: Column): Column = {
    val f = udf { t: String => model.value.predict(t) }
    f(text)
  }

  /** doc stream (doc_id, text, ...) → (doc_id, pred_lang). */
  def predictions(stream: DataFrame, model: Broadcast[NbModel]): DataFrame = {
    import org.apache.spark.sql.functions.col
    stream.select(col("doc_id"), predictCol(model, col("text")).as("pred_lang"))
  }
}
