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
    def buildSession(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    // SPARK_GRAFT_BENCH_COLD=1 (VERDICT r14 #6): fresh SparkContext per
    // query, no warmup pass, reps forced to 1, and the Materialize
    // registry reset before each query — the measured in-repo counterpart
    // of the driver's first-rep cold numbers. What it CANNOT reset on an
    // unprivileged box: the OS page cache and JVM JIT state (documented;
    // a root-owned `echo 3 > drop_caches` harness would close that gap).
    // Never diff cold snapshots against warm ones.
    val cold = sys.env.get("SPARK_GRAFT_BENCH_COLD").contains("1")
    var spark = buildSession()
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
    val reps = if (cold) 1 else sys.env.get("SPARK_GRAFT_BENCH_REPS") match {
      case None => 3
      case Some(s) => s.toIntOption.filter(_ >= 1).getOrElse {
        System.err.println(
          s"[bench] SPARK_GRAFT_BENCH_REPS='$s' is not a positive int")
        sys.exit(2)
      }
    }
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => filter.forall(_.exists(name.contains)) }
    if (!cold) ordered.foreach { case (_, fn) => run(fn) }
    // Adaptive re-reps (VERDICT r15 #6, default ON — the driver sets no
    // env, so its per-round snapshot inherits this): when a query's
    // min-of-reps still exceeds its committed-snapshot time by >1.5x AND
    // >0.15 s, run 2 extra reps before reporting. BENCH_r15 shipped 16
    // spurious ≥1.5x flags that were pure box noise the judge had to
    // re-measure by hand; extra reps converge exactly those one-off
    // GC/codegen/page-cache spikes, so driver snapshots self-clean. The
    // baseline is the newest committed FULL-SUITE snapshot
    // (bench/bench_r<N>[a-z].json — cohort/cold side-files excluded, the
    // gate.sh PREV rule); no baseline (fresh clone) = no re-reps. Opt out
    // with SPARK_GRAFT_BENCH_ADAPTIVE=0 (A/B runs that want raw reps).
    // (only the serial branch consults it; concurrent wall-time runs are
    // a different regime and never re-rep)
    val adaptive = !cold &&
      sys.env.get("SPARK_GRAFT_BENCH_ADAPTIVE").forall(_ != "0")
    val baseline: Map[String, Double] = if (!adaptive) Map.empty else {
      val rx = "bench_r([0-9]+)([a-z]?)\\.json".r
      val snaps = Option(new java.io.File("bench").listFiles()).toSeq.flatten
        .flatMap { f =>
          f.getName match {
            case rx(n, s) => Some(((n.toInt, s), f))
            case _ => None
          }
        }
      snaps.sortBy(_._1).lastOption match {
        case Some((_, f)) =>
          val txt = Files.readString(f.toPath)
          val q = """"(q[0-9][^"]*)":([0-9.eE+-]+)""".r
          val m = q.findAllMatchIn(txt)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
          // visible in the bench log (ADVICE r16): a silently-disabled
          // adaptive pass (format drift, wrong cwd) is otherwise invisible
          System.err.println(s"[bench] adaptive baseline: ${f.getPath} " +
            s"(${m.size} query timings)")
          if (m.isEmpty) System.err.println(
            s"[bench] WARNING: baseline ${f.getPath} parsed to 0 timings " +
              "— adaptive re-reps are effectively OFF (format drift?)")
          m
        case None =>
          System.err.println("[bench] no bench/bench_r*.json baseline " +
            "found (cwd=" + new java.io.File(".").getAbsolutePath +
            ") — adaptive re-reps disabled")
          Map.empty
      }
    }
    // SPARK_GRAFT_BENCH_CONCURRENCY=N (opt-in, default 1 = the serial path
    // every gate and driver snapshot uses) times the suite with N queries
    // IN FLIGHT on the shared scheduler — the multi-tenant regime a real
    // cluster runs, where the figure of merit is WALL throughput, not
    // per-query latency (contended per-query numbers are recorded but not
    // comparable to serial ones; "value" becomes wall seconds). reps is
    // forced to 1: min-of-N is a latency denoiser and has no meaning when
    // queries contend. Note clearCache() is global — concurrent runs can
    // evict each other's query-internal caches; correctness is unaffected
    // (recompute), and the eviction pressure is part of the regime being
    // measured.
    // Validated, not bare .toInt (ADVICE r12): a typo'd value must produce
    // an actionable message, not a NumberFormatException stack.
    val conc = sys.env.get("SPARK_GRAFT_BENCH_CONCURRENCY") match {
      case None => 1
      case Some(s) => s.toIntOption.filter(_ >= 1).getOrElse {
        System.err.println(
          s"[bench] SPARK_GRAFT_BENCH_CONCURRENCY='$s' is not a positive int")
        sys.exit(2)
      }
    }
    if (cold && conc > 1) {
      System.err.println("[bench] SPARK_GRAFT_BENCH_COLD and " +
        "SPARK_GRAFT_BENCH_CONCURRENCY are mutually exclusive (a shared " +
        "contended context is the opposite of a cold start)")
      sys.exit(2)
    }
    val (results, wallOverride) =
      if (conc <= 1) {
        val rs = ordered.map { case (name, fn) =>
          if (cold) {
            spark.stop()
            graft.operators.Materialize.reset()
            spark = buildSession()
          }
          var runs = (1 to reps).map(_ => run(fn))
          val minOk = runs.collect { case (s, None) => s }.minOption
          (baseline.get(name), minOk) match {
            case (Some(base), Some(cur))
                if adaptive && cur > base * 1.5 && cur - base > 0.15 =>
              System.err.println(
                f"[bench] $name adaptive: min $cur%.3f vs snapshot $base%.3f — 2 extra reps")
              runs = runs ++ (1 to 2).map(_ => run(fn))
            case _ => ()
          }
          val (secs, err) = runs.minBy { case (s, e) => (e.isDefined, s) }
          if (runs.size > 1)
            System.err.println(s"[bench] $name reps: " + runs.map(r => f"${r._1}%.3f").mkString(" "))
          (name, secs, err)
        }
        (rs, None)
      } else {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(conc)
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        try {
          val t0 = System.nanoTime()
          val futs = ordered.map { case (name, fn) =>
            Future { val (secs, err) = run(fn); (name, secs, err) }
          }
          val rs = futs.map(Await.result(_, Duration.Inf))
          val wall = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[bench] concurrency=$conc wall: $wall%.3f s")
          (rs, Some(wall))
        } finally pool.shutdown()
      }
    results.foreach { case (name, _, err) =>
      err.foreach(e => System.err.println(s"[bench] $name FAILED: ${e.getMessage}"))
    }
    val qs = results.map { case (k, v, err) =>
      "\"" + k + "\":" + (if (err.isDefined) "null" else v.toString)
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(_)) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = wallOverride.getOrElse(results.collect { case (_, v, None) => v }.sum)
    val mode = (if (conc <= 1) "" else s""","concurrency":$conc""") +
      (if (cold) ""","cold":true""" else "")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs$mode,"sf":"$sfDir"}"""
    // SPARK_GRAFT_BENCH_OUT redirects filtered/spot runs to a scratch file
    // so the committed full-suite baseline in bench_out.json survives A/B
    // measurements (round-7 ADVICE: a single-query run overwrote it).
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    Files.writeString(Paths.get(outPath), line + "\n")
    println(line)
    spark.stop()
  }
}
