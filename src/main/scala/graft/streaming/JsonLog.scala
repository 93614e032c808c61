package graft.streaming

/** Reference-parity structured JSON logging — the LAST unmapped row of
  * the relay surface (`main.go:32-54`: a zap production logger with
  * `MessageKey "msg"`, `TimeKey "time"` ISO8601-encoded, `LevelKey
  * "level"` capital-encoded, JSON to stdout). What matters for parity is
  * the log SHAPE — one JSON object per line with those exact keys — the
  * contract downstream log pipelines (CloudWatch metric filters, jq
  * dashboards) parse; reproducing it keeps a reference deployment's log
  * tooling working unchanged against the relay.
  *
  * Zero dependencies: the relay emits flat string fields only, so the
  * encoder is a hand-rolled escape + fixed key order
  * (`level`,`time`,`msg`, then fields in call order — stable for exact
  * assertions). `out` is injectable for tests and defaults to stdout
  * like the reference's `OutputPaths: ["stdout"]`. */
object JsonLog {

  @volatile private[streaming] var out: java.io.PrintStream = System.out

  /** Run `body` with log output captured into the returned buffer —
    * test hook (the reference swaps OutputPaths the same way). */
  def withCapture[A](body: => A): (A, String) = {
    val buf = new java.io.ByteArrayOutputStream()
    val ps = new java.io.PrintStream(buf, true, "UTF-8")
    val prev = out
    out = ps
    try {
      val a = body
      ps.flush()
      (a, buf.toString("UTF-8"))
    } finally out = prev
  }

  def debug(msg: String, fields: (String, String)*): Unit = write("DEBUG", msg, fields)
  def info(msg: String, fields: (String, String)*): Unit = write("INFO", msg, fields)
  def warn(msg: String, fields: (String, String)*): Unit = write("WARN", msg, fields)
  def error(msg: String, fields: (String, String)*): Unit = write("ERROR", msg, fields)

  /** Shared with [[KinesisFileSink.writeKeys]] — the keys sidecar and the
    * log stream are both one-JSON-value-per-line formats and must escape
    * identically (ADVICE r19: the sidecar emitted raw control characters,
    * corrupting line/entry correspondence). */
  private[streaming] def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def write(level: String, msg: String,
                    fields: Seq[(String, String)]): Unit = {
    val time = java.time.OffsetDateTime.now()
      .format(java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME)
    val tail = fields.map { case (k, v) => s""","${esc(k)}":"${esc(v)}"""" }
      .mkString
    out.println(
      s"""{"level":"$level","time":"${esc(time)}","msg":"${esc(msg)}"$tail}""")
  }
}
