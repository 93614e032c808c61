package graft

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** Structural guard against silent encoder-codegen regressions.
  *
  * Spark's `CodeGeneratorWithInterpretedFallback` logs
  * "Expr codegen error and falling back to interpreter mode" at WARN and
  * then runs the projection interpreted — functionally correct, so tests
  * keep passing while every state (de)serialization on a streaming hot
  * path quietly drops out of codegen (the r16 `StreamingGapFill`
  * plain-`private` state class did exactly this: 17 interpreter-fallback
  * warnings buried in six minutes of suite output). This helper captures
  * those warnings via a scoped log4j2 appender so a spec can FAIL on them
  * instead of relying on a human reading the log. */
object CodegenFallbackGuard {
  private val Marker = "falling back to interpreter mode"

  private final class Capture extends AbstractAppender(
      "graft-codegen-fallback-guard", null, null, false, Property.EMPTY_ARRAY) {
    val hits = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    override def append(ev: LogEvent): Unit = {
      val m = ev.getMessage.getFormattedMessage
      if (m.contains(Marker)) hits.add(s"[${ev.getLoggerName}] $m")
    }
  }

  /** Runs `body` with the capture appender attached to the root logger;
    * returns the result and every interpreter-fallback warning emitted. */
  def capture[A](body: => A): (A, Seq[String]) = {
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    val app = new Capture
    app.start()
    cfg.getRootLogger.addAppender(app, Level.WARN, null)
    ctx.updateLoggers()
    try {
      val r = body
      (r, app.hits.toArray(Array.empty[String]).toSeq)
    } finally {
      cfg.getRootLogger.removeAppender(app.getName)
      app.stop()
      ctx.updateLoggers()
    }
  }

  /** Runs `body` and throws if any encoder-codegen fallback was logged. */
  def assertNone[A](body: => A): A = {
    val (r, hits) = capture(body)
    if (hits.nonEmpty) throw new AssertionError(
      s"encoder codegen fell back to interpreter mode ${hits.size} time(s) " +
        s"— a product type is likely plain-private (use private[pkg]); " +
        s"first: ${hits.head}")
    r
  }
}
