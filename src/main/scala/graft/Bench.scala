package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Bench harness: times every declared query at SPARK_GRAFT_SF_DIR.
  *
  * Emits ONE JSON line on stdout AND writes it to bench_out.json — sbt
  * prefixes stdout with "[info] " which broke the driver's parse in round 1
  * (BENCH_r01.json "parsed": null), so the file is the machine-readable
  * channel and the stdout line is best-effort.
  *
  * A full warmup pass runs first: JVM + codegen + parquet footer caches
  * otherwise fold ~5 s of session startup into whichever query runs first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink: forces FULL computation of every column. count() would let
    // Catalyst prune projections (md5/minhash/json work) on non-aggregating
    // queries and report fantasy timings. A failing query is RECORDED (null
    // timing + "errors" list), never silently folded into the total.
    // clearCache() scopes any query-internal persist (q42's signature
    // table) to one run — no leak, no double-cache warning on the timed
    // pass. It runs OUTSIDE the timed window: only the noop-sink write is
    // measured (ADVICE r03 — teardown was inflating cache-using queries).
    def run(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Option[Throwable]) = {
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable => Some(e) }
      val secs = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      (secs, err)
    }
    // Optional focus mode for A/B measurements: SPARK_GRAFT_BENCH_QUERIES is a
    // comma-separated substring filter, SPARK_GRAFT_BENCH_REPS repeats each
    // query's TIMED pass N times (min of reps reported — the steady-state
    // number, robust to page-cache / CPU-steal spikes on this shared box).
    // Default 3: a single cold pass on this box drifts up to ±2× per query
    // (the round-7 snapshot read 3–7× high on the heaviest scans and cried
    // regression), so every unconfigured run — including the driver's
    // per-round snapshot — reports min-of-3 warm.
    val filter = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.toInt).getOrElse(3)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => filter.forall(_.exists(name.contains)) }
    ordered.foreach { case (_, fn) => run(fn) }
    val results = ordered.map { case (name, fn) =>
      val runs = (1 to reps).map(_ => run(fn))
      val (secs, err) = runs.minBy { case (s, e) => (e.isDefined, s) }
      if (reps > 1)
        System.err.println(s"[bench] $name reps: " + runs.map(r => f"${r._1}%.3f").mkString(" "))
      (name, secs, err)
    }
    results.foreach { case (name, _, err) =>
      err.foreach(e => System.err.println(s"[bench] $name FAILED: ${e.getMessage}"))
    }
    val qs = results.map { case (k, v, err) =>
      "\"" + k + "\":" + (if (err.isDefined) "null" else v.toString)
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(_)) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, None) => v }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    // SPARK_GRAFT_BENCH_OUT redirects filtered/spot runs to a scratch file
    // so the committed full-suite baseline in bench_out.json survives A/B
    // measurements (round-7 ADVICE: a single-query run overwrote it).
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    Files.writeString(Paths.get(outPath), line + "\n")
    println(line)
    spark.stop()
  }
}
