package graft

import graft.streaming.JsonLog
import org.scalatest.funsuite.AnyFunSuite

/** [[JsonLog]] — the zap-parity structured logger (`main.go:32-54`):
  * one JSON object per line with the reference encoder's exact keys
  * (`level` capital, `time` ISO8601, `msg`, then flat string fields),
  * so a reference deployment's log pipelines parse the relay's lines
  * unchanged. */
class JsonLogSpec extends AnyFunSuite {

  private def parse(line: String): Map[String, String] = {
    // strict tiny parser for the flat-string-object shape JsonLog emits —
    // independent of the encoder's own string building
    val inner = line.trim.stripPrefix("{").stripSuffix("}")
    val kv = """"((?:[^"\\]|\\.)*)":"((?:[^"\\]|\\.)*)"""".r
    kv.findAllMatchIn(inner).map { m =>
      def un(s: String) = s.replace("\\\"", "\"").replace("\\\\", "\\")
      un(m.group(1)) -> un(m.group(2))
    }.toMap
  }

  test("reference key shape: level/time/msg + fields, ISO8601 time, " +
      "capital level, one line per event") {
    val ((), log) = JsonLog.withCapture {
      JsonLog.info("starting prometheus_remote_kinesis",
        "stream-name" -> "metrics")
      JsonLog.warn("shutting down")
      JsonLog.error("send failed", "error" -> "boom")
    }
    val lines = log.trim.split("\n").toSeq
    assert(lines.size === 3)
    val first = parse(lines.head)
    assert(first("level") === "INFO")
    assert(first("msg") === "starting prometheus_remote_kinesis")
    assert(first("stream-name") === "metrics")
    // zap's ISO8601TimeEncoder shape (offset or Z suffix both parse)
    java.time.OffsetDateTime.parse(first("time"))
    assert(parse(lines(1))("level") === "WARN")
    assert(parse(lines(1))("msg") === "shutting down")
    val err = parse(lines(2))
    assert(err("level") === "ERROR" && err("error") === "boom")
    // key ORDER is the encoder config's: level, time, msg, fields
    assert(lines.head.startsWith("""{"level":"INFO","time":""""))
  }

  test("quotes, backslashes and control characters escape to valid JSON") {
    val ((), log) = JsonLog.withCapture {
      JsonLog.info("a \"quoted\" msg\nwith newline", "k" -> "v\\w")
    }
    val line = log.trim
    assert(!line.contains("\n")) // control chars escaped: still ONE line
    assert(line.contains("a \\\"quoted\\\" msg\\u000awith newline"))
    assert(line.contains("\"k\":\"v\\\\w\""))
  }
}
