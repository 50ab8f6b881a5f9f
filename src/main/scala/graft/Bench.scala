package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Incremental, kill-surviving writer for the bench artifact (VERDICT
  * r14 wrong #1: the round's one hard failure was `rc: 124, parsed:
  * null` — the old harness printed/wrote the JSON line only after ALL
  * sections, so the driver's wall-clock kill during the final leg lost
  * every completed measurement).
  *
  * Contract: the artifact is a single JSON object whose top-level
  * fields are fixed at construction, in order. After EVERY completed
  * section the full line is re-serialized and atomically replaces
  * `bench_result.json` (tmp-write + ATOMIC_MOVE), so a kill at any
  * point leaves the last consistent artifact on disk. A JVM shutdown
  * hook ([[installShutdownHook]]) additionally stamps every
  * still-pending section `{"killed":true}`, flips the top-level
  * `"killed"` field to true, rewrites the file, and PRINTS the line —
  * the driver's bounded-stdout-tail parse then succeeds even on
  * rc 124. SIGKILL (no hooks) still finds the incrementally-written
  * file. BenchSpec pins both paths (in-JVM and a real SIGTERM against
  * [[tools.BenchKillProbe]]).
  */
final class BenchEmitter(
    outPath: Path, initial: Seq[(String, String)], sectionKeys: Set[String]) {
  private val Pending = """{"pending":true}"""
  private val fields = scala.collection.mutable.LinkedHashMap[String, String](initial: _*)
  require(sectionKeys.subsetOf(fields.keySet), "sectionKeys must be declared fields")
  sectionKeys.foreach(k => fields(k) = Pending)
  require(fields.contains("killed"), "emitter needs a top-level killed field")
  private val finished = new java.util.concurrent.atomic.AtomicBoolean(false)

  def set(key: String, json: String): Unit = synchronized {
    require(fields.contains(key), s"unknown bench field: $key")
    fields(key) = json
    writeFile()
  }

  def line(): String = synchronized {
    fields.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
  }

  // ---- compact summary line (round 15): the DRIVER parses the bench
  // from a ~2000-char stdout tail, and the full line outgrew it rounds
  // ago — BENCH_r4..r14 all carry `parsed: null` even on rc 0 (only r3,
  // whose line was still short, ever parsed). The full line keeps every
  // detail (and bench_result.json holds it on disk); stdout ENDS with
  // this compact headline line, small enough that the tail's last line
  // always parses.
  private val compact = scala.collection.mutable.LinkedHashMap[String, String]()

  /** Add a headline scalar to the compact summary line. */
  def setCompact(key: String, json: String): Unit = synchronized {
    compact(key) = json
    ()
  }

  /** The ≤1900-char trailer: top-level scalars mirrored from the full
    * artifact plus the headline fields sections registered. */
  def compactLine(): String = synchronized {
    val mirrored = Seq("metric", "value", "unit", "killed", "bench_seq_today")
      .flatMap(k => fields.get(k).map(v => s""""$k":$v"""))
    val hs = compact.map { case (k, v) => s""""$k":$v""" }
    val l = (mirrored ++ hs ++ Seq(""""detail":"bench_result.json""""))
      .mkString("{", ",", "}")
    // the whole point is fitting the driver's tail — never exceed it
    require(l.length <= 1900, s"compact bench line grew past the driver tail: ${l.length} chars")
    l
  }

  private def writeFile(): Unit = {
    val tmp = outPath.resolveSibling(outPath.getFileName.toString + ".tmp")
    Files.writeString(tmp, line() + "\n")
    Files.move(tmp, outPath,
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  /** Normal completion: silence the kill hook, persist, return the line
    * for the caller to print (after spark.stop(), so no further logging
    * can push it out of the driver's bounded stdout tail). */
  def finish(): String = synchronized {
    finished.set(true)
    writeFile()
    line()
  }

  def installShutdownHook(): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => onKill(), "bench-emitter-kill"))

  /** The kill path, package-visible so BenchSpec can drive it without a
    * subprocess: stamp pending sections, persist, print. Idempotent and
    * silent after [[finish]]. */
  private[graft] def onKill(): Unit = {
    if (finished.compareAndSet(false, true)) {
      val (l, c) = synchronized {
        fields.keys.toSeq.filter(sectionKeys).foreach { k =>
          if (fields(k) == Pending) fields(k) = """{"killed":true}"""
        }
        fields("killed") = "true"
        writeFile()
        // the hook must never die half-printed: an overgrown trailer
        // (loud in tests via compactLine's require) degrades to a
        // minimal-but-parseable one here
        val trailer = scala.util.Try(compactLine()).getOrElse(
          """{"metric":"total","killed":true,"detail":"bench_result.json"}""")
        (line(), trailer)
      }
      println(l)
      println(c) // LAST: the line the driver's bounded tail parses
    }
  }
}

/** Benchmark harness (SURVEY A6): times every registry query at the given
  * SF dir and emits ONE JSON line `{"metric":"total","value":…,"queries":…}`.
  *
  * Failure contract (VERDICT r1, wrong #4): a failing query is NOT
  * swallowed — it is recorded with a negative time, listed under "errors",
  * and flips the process exit code to 1, so a regression can't be silently
  * timed as a success.
  *
  * Delivery contract (VERDICT r14 wrong #1): the artifact must survive
  * the DRIVER's wall clock. Three structural defenses:
  *  - [[BenchEmitter]] rewrites `bench_result.json` after every section
  *    and a SIGTERM hook prints the line with `{"killed":true}` stamps;
  *  - the BASELINE-comparable core (registry + kernel_1m) runs FIRST —
  *    the graph-slope leg's old run-first rationale (fork sees a
  *    near-idle host) is served by the per-section canaries now;
  *  - an internal budget (`GRAFT_BENCH_BUDGET_S`, default 2400 s):
  *    after the core, each diagnostic leg checks remaining budget
  *    before launching and stamps `{"skipped":"budget"}` when short, so
  *    a degraded day still publishes the headlines within budget.
  */
object Bench {

  private def f3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  /** Run one scale leg in a FRESH JVM via [[tools.BenchFork]] and return
    * its JSON body. The child inherits this JVM's full argument list
    * (heap size, --add-opens, -D flags — sbt forked us, so
    * `java.class.path` is the real application classpath) plus the
    * environment (SPARK_GRAFT_* knobs). Stdout is scanned for the single
    * `BENCHFORK_JSON` line; stderr passes through. On any failure the
    * in-session `fallback` runs instead, stamped
    * `"suspect_session_age":true` so a JSON consumer can tell a clean
    * fresh-JVM point from a heap-aged one (VERDICT r11 next #2).
    * `timeoutS` bounds the child's wall clock — sized to the REMAINING
    * internal budget, not the old fixed 45 min, so one hung leg can no
    * longer eat every later section's slot (r14 wrong #1). */
  private def forked(mode: String, timeoutS: Long, fallback: () => String): String =
    try {
      import scala.jdk.CollectionConverters._
      val javaBin = java.nio.file.Paths.get(
        System.getProperty("java.home"), "bin", "java").toString
      val jvmArgs = java.lang.management.ManagementFactory
        .getRuntimeMXBean.getInputArguments.asScala.toSeq
      val cmd = Seq(javaBin) ++ jvmArgs ++
        Seq("-cp", System.getProperty("java.class.path"), "graft.tools.BenchFork", mode)
      val pb = new ProcessBuilder(cmd.asJava)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val p = pb.start()
      // drain stdout on its OWN thread (stderr is inherited, so this is
      // the only pipe that could deadlock on a full buffer) while the
      // MAIN thread owns the timeout: a hung child never reaches EOF,
      // and a blocking readLine here would make waitFor's bound dead
      // code — the whole bench would hang with it
      val lines = java.util.Collections.synchronizedList(
        new java.util.ArrayList[String]())
      val drain = new Thread(() => {
        val out = new java.io.BufferedReader(
          new java.io.InputStreamReader(p.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
        try {
          var ln = out.readLine()
          while (ln != null) { lines.add(ln); ln = out.readLine() }
        } catch { case _: java.io.IOException => () } // stream closed by destroy
      }, s"benchfork-$mode-drain")
      drain.setDaemon(true)
      drain.start()
      val done = p.waitFor(timeoutS, java.util.concurrent.TimeUnit.SECONDS)
      if (!done) { p.destroyForcibly(); sys.error(s"fork $mode timed out after ${timeoutS}s") }
      drain.join(60000)
      // a still-alive drain means the pipe never reached EOF: fail the
      // fork explicitly rather than iterate a list the drain thread may
      // still be appending to (CME risk / missed BENCHFORK_JSON line —
      // ADVICE r12); the snapshot below additionally holds the list's
      // own lock so even this read is safe against a racing writer
      if (drain.isAlive) sys.error(s"fork $mode stdout drain did not finish")
      if (p.exitValue() != 0) sys.error(s"fork $mode exited ${p.exitValue()}")
      import scala.jdk.CollectionConverters.ListHasAsScala
      val snapshot = lines.synchronized(lines.asScala.toVector)
      snapshot.reverseIterator
        .collectFirst { case l if l.startsWith("BENCHFORK_JSON ") =>
          l.stripPrefix("BENCHFORK_JSON ") }
        .getOrElse(sys.error(s"fork $mode printed no BENCHFORK_JSON line"))
    } catch {
      case e: Throwable =>
        System.err.println(
          s"[bench] fork $mode failed (${e.getMessage}) — in-session fallback, stamped suspect")
        val j = fallback()
        if (j.startsWith("{")) """{"suspect_session_age":true,""" + j.drop(1) else j
    }

  def main(args: Array[String]): Unit = {
    val benchStart = System.nanoTime()
    def elapsedS: Double = (System.nanoTime() - benchStart) / 1e9
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Internal wall-clock budget (VERDICT r14 next #2), sized to the
    // driver's observed window. The BASELINE-comparable core (registry
    // + kernel_1m) always runs; each diagnostic leg checks remaining
    // budget against its clean-day estimate before launching.
    val budgetS = sys.env.get("GRAFT_BENCH_BUDGET_S").flatMap(_.toDoubleOption)
      .getOrElse(2400.0)
    def remainingS: Double = budgetS - elapsedS
    // Section filter for BUILDER-SIDE validation runs (VERDICT r12 next
    // #2: one FULL bench per host-day for publication — targeted
    // re-validation must not burn the day's budget):
    // GRAFT_BENCH_SKIP=registry,kernel,cold,graphslope,float4m,full2m
    // skips the named sections, each publishing {"skipped":true} so the
    // artifact is self-describing. The driver never sets this.
    val skip = sys.env.get("GRAFT_BENCH_SKIP")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    // Host-state self-description (VERDICT r12 wrong #2): back-to-back
    // FULL benches accumulate host-day slowdown that fresh JVMs and
    // drop_caches do NOT remove. The artifact records which run of the
    // host-day it is — 1 is the day's reference run.
    val benchSeqToday =
      try {
        val f = Paths.get(s"/tmp/graft_bench_seq_${java.time.LocalDate.now()}")
        val prior = if (Files.exists(f)) Files.readString(f).trim.toInt else 0
        // only a FULL bench consumes a host-day sequence number: a
        // skip-gated validation run costs a fraction of the load the
        // stamp exists to account for
        if (skip.isEmpty) { Files.writeString(f, (prior + 1).toString); prior + 1 }
        else prior + 1 // what a full bench started NOW would stamp
      } catch { case _: Throwable => -1 }

    // ---- artifact skeleton: every top-level field declared up front,
    // sections incrementally filled (VERDICT r14 next #1)
    val sections = Seq("queries", "kernel_1m_384", "kernel_cold_scan",
      "graph_build_slope", "kernel_2m_384", "kernel_4m_384")
    val emitter = new BenchEmitter(
      Paths.get("bench_result.json"),
      Seq(
        "metric" -> "\"total\"",
        "value" -> "-1.000",
        "unit" -> "\"sec\"",
        "killed" -> "false",
        "bench_seq_today" -> benchSeqToday.toString,
        "budget_s" -> f3(budgetS),
        "canary_reference" -> KernelBench.canaryReferenceJson,
        "registry_canaries" -> "null",
        "queries" -> "null",
        "kernel_1m_384" -> "null",
        "kernel_cold_scan" -> "null",
        "graph_build_slope" -> "null",
        "kernel_2m_384" -> "null",
        "kernel_4m_384" -> "null",
        "errors" -> "{}",
        "sf" -> jstr(sfDir)),
      sections.toSet)
    emitter.installShutdownHook()

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def publishErrors(): Unit = {
      emitter.set("errors",
        errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}"))
      emitter.setCompact("n_err", errors.size.toString)
    }

    // scalar extraction from a completed section's JSON body — the
    // forked legs compute their numbers in a child JVM, so the compact
    // trailer picks its headlines back out of the JSON text
    def pick(json: String, key: String): Option[String] =
      ("\"" + java.util.regex.Pattern.quote(key) + "\":(-?[0-9.]+)").r
        .findFirstMatchIn(json).map(_.group(1))
    def compactFrom(json: String, legPrefix: String, keys: (String, String)*): Unit =
      if (json.contains("\"skipped\"")) emitter.setCompact(legPrefix, "\"skip\"")
      else if (json.contains("\"killed\"") || json.contains("\"error\""))
        emitter.setCompact(legPrefix, "\"err\"")
      else keys.foreach { case (from, to) =>
        pick(json, from).foreach(v => emitter.setCompact(s"$legPrefix$to", v))
      }

    def skipped(name: String): Boolean = skip.contains(name)
    def runSection(field: String, skipKey: String)(body: => String): String = {
      val json = if (skipped(skipKey)) """{"skipped":true}""" else body
      emitter.set(field, json)
      json
    }
    // Diagnostic legs only — the core never budget-skips. Estimates are
    // clean-day wall-clock with headroom; a leg whose estimate exceeds
    // the remaining budget self-describes instead of risking the kill
    // that lost r14's whole artifact.
    def budgetGated(field: String, skipKey: String, estS: Double)(body: => String): String =
      runSection(field, skipKey) {
        if (remainingS < estS)
          s"""{"skipped":"budget","estimated_s":${f3(estS)},"remaining_s":${f3(remainingS)}}"""
        else body
      }

    // fraction 0.75 (not the 0.6 default): the bench is the one entry
    // point that holds multi-GB block caches while building more of
    // them — see GraftSession.build's sizing note
    val spark = GraftSession.build(cpus,
      Some(sys.env.getOrElse("SPARK_GRAFT_MEM_FRACTION", "0.75")))
    // Warm-up: JVM/codegen/scheduler start-up must not be billed to the
    // first timed query (it was inflating it ~10×).
    spark.range(1000000L).selectExpr("sum(id)").collect()

    // ---- CORE section 1: the registry suite, canary-bracketed
    // (VERDICT r14 next #4: start+end triples so a consumer can see
    // mid-section pollution arrival)
    runSection("queries", "registry") {
      val start = KernelBench.canaryTriple()
      val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          name -> (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
            System.err.println(s"[bench] $name FAILED: ${errors(name)}")
            name -> -1.0
        }
      }
      val end = KernelBench.canaryTriple()
      emitter.set("registry_canaries", s"{${KernelBench.canaryBracketJson(start, end)}}")
      emitter.setCompact("reg_can_r", f3(KernelBench.canaryRatios(start.singleMs, start.scanMs)._1))
      emitter.setCompact("reg_can_sh_r", f3(KernelBench.canaryShuffleRatio(start.shuffleMs)))
      emitter.setCompact("reg_can_end_sh_r", f3(KernelBench.canaryShuffleRatio(end.shuffleMs)))
      emitter.set("value",
        f3(results.collect { case (_, v) if v >= 0 => v }.sum))
      publishErrors()
      // Keep the line SHORT: the driver parses it from a bounded stdout
      // tail (r2's full-precision line overflowed the buffer).
      results.map { case (k, v) => s"${jstr(k)}:${f3(v)}" }.mkString("{", ",", "}")
    }

    // ---- CORE section 2: the 1M×384 kernel ladder — the like-for-like
    // BASELINE.md comparison. Runs immediately after the registry
    // (VERDICT r14 next #2: core first; the graph-slope leg's old
    // run-first slot is served by its canary bracket now).
    runSection("kernel_1m_384", "kernel") {
      try {
        spark.catalog.clearCache() // drop query-suite caches before the 1.5 GB corpus
        System.gc()
        // start the section the way BenchFork starts every fork: sync +
        // drop the page cache, and stamp whether that worked (VERDICT
        // r12 wrong #1: the old in-session 1M section read its bin
        // headline 9× wrong after the registry churn, silently)
        val kernelCacheDropped = operators.ColdScan.dropPageCache()
        val start = KernelBench.canaryTriple()
        val r = KernelBench.run(spark)
        val f4 = (v: Double) => String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
        // held-out queries (r6 advice): recall varies with nProbe; the
        // sweep proves the speed/recall dial is real at 1M scale
        val sweep = r.annRecallByProbe
          .map { case (np, rc) => s""""$np":${f4(rc)}""" }.mkString("{", ",", "}")
        val pqSweep = r.pqSweep
          .map(l => s""""${l.ef}":${f4(l.recall10)}""").mkString("{", ",", "}")
        val sqSweep = r.sqSweep
          .map(l => s""""${l.ef}":${f4(l.recall10)}""").mkString("{", ",", "}")
        val graphSweep = r.graphSweep
          .map(l => s""""${l.ef}":${f4(l.recall10)}""").mkString("{", ",", "}")
        val binSweep = r.binSweep
          .map(l => s""""${l.ef}":${f4(l.recall10)}""").mkString("{", ",", "}")
        // close the report loop at bench scale (r6 next #7): write the
        // per-method reports the engine just measured, read them back
        // through the 005-compare pipeline, quote the speedup column
        val reportsDir =
          s"/tmp/graft_reports_${ProcessHandle.current().pid()}/kernel1m"
        KernelBench.writeReports(spark, KernelBench.Default, r, reportsDir, "19700101000000")
        val compared = graft.sources.Report.compare(spark, s"$reportsDir/*/")
          .collect()
          .map(row => s""""${row.getAs[String]("method")}":${f3(
            row.getAs[Double]("speedup_vs_bf"))}""")
          .mkString("{", ",", "}")
        val end = KernelBench.canaryTriple()
        // compact-trailer headlines: the BASELINE-comparable scalars the
        // driver's 2000-char tail can actually hold
        val f4c = (v: Double) => String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
        Seq(
          "bf_ms" -> f3(r.bfMsPerQuery), "bf_base_ms" -> "699.43",
          "ivf_ms" -> f3(r.annMsPerQuery), "ivf_r" -> f4c(r.annRecallVsExact),
          "sq_ms" -> f3(r.sqMsPerQuery), "sq_r" -> f4c(r.sqRecallVsExact),
          "pq_ms" -> f3(r.pqMsPerQuery), "pq_r" -> f4c(r.pqRecallVsExact),
          "bin_ms" -> f3(r.binMsPerQuery), "bin_op_ms" -> f3(r.binOpMsPerQuery),
          "bin_op_r10" -> f4c(r.binOpHoldRecall),
          "g_ms" -> f3(r.graphMsPerQuery), "g_build_s" -> f3(r.graphBuildSec),
          "ivf_build_s" -> f3(r.annBuildSec), "pq_build_s" -> f3(r.pqBuildSec),
          "k1m_can_r" -> f3(KernelBench.canaryRatios(start.singleMs, start.scanMs)._1),
          "k1m_can_sh_r" -> f3(KernelBench.canaryShuffleRatio(start.shuffleMs)),
          "k1m_can_end_sh_r" -> f3(KernelBench.canaryShuffleRatio(end.shuffleMs))
        ).foreach { case (k, v) => emitter.setCompact(k, v) }
        def passes(ts: Seq[Double]): String = ts.map(f3).mkString("[", ",", "]")
        val medians = s""""ms_per_query_median":{"bf":${f3(r.bfMsPerQueryMedian)},"ivf":${f3(r.annMsPerQueryMedian)},"sq":${f3(r.sqMsPerQueryMedian)},"pq":${f3(r.pqMsPerQueryMedian)},"bin":${f3(r.binMsPerQueryMedian)}}"""
        s"""{"n":${KernelBench.N},"dim":${KernelBench.Dim},${KernelBench.canaryBracketJson(start, end)},"latency_stat":"min_over_same_dial_passes",$medians,"page_cache_dropped":$kernelCacheDropped,"pass_sec":{"bf":${passes(r.bfPassSec)},"ivf":${passes(r.annPassSec)},"sq":${passes(r.sqPassSec)},"pq":${passes(r.pqPassSec)},"bin":${passes(r.binPassSec)}},"ms_per_query":${f3(r.bfMsPerQuery)},"qps":${f3(r.bfQps)},"baseline_ms_per_query":699.43,"ann_build_sec":${f3(r.annBuildSec)},"ann_ms_per_query":${f3(r.annMsPerQuery)},"ann_qps":${f3(r.annQps)},"ann_recall_vs_exact":${f4(r.annRecallVsExact)},"ann_recall_sweep":$sweep,"pq_build_sec":${f3(r.pqBuildSec)},"pq_ms_per_query":${f3(r.pqMsPerQuery)},"pq_qps":${f3(r.pqQps)},"pq_recall_vs_exact":${f4(r.pqRecallVsExact)},"pq_recall_sweep":$pqSweep,"pq_bytes_per_doc":${KernelBench.Dim / KernelBench.PqSubDim},"pq_nprobe":${KernelBench.NProbe},"pq_train_iters":${KernelBench.PqTrainIters},"sq_build_sec":${f3(r.sqBuildSec)},"sq_ms_per_query":${f3(r.sqMsPerQuery)},"sq_qps":${f3(r.sqQps)},"sq_recall_vs_exact":${f4(r.sqRecallVsExact)},"sq_recall_sweep":$sqSweep,"sq_bytes_per_doc":${KernelBench.Dim},"bin_build_sec":${f3(r.binBuildSec)},"bin_ms_per_query":${f3(r.binMsPerQuery)},"bin_qps":${f3(r.binQps)},"bin_recall_vs_exact":${f4(r.binRecallVsExact)},"bin_rescore_sweep":$binSweep,"bin_operating_point":{"pool":${r.binOpPool},"target":${KernelBench.BinOpTarget},"tune_recall_10":${f4(r.binOpTuneRecall)},"heldout_recall_10":${f4(r.binOpHoldRecall)},"ms_per_query":${f3(r.binOpMsPerQuery)}},"bin_bytes_per_doc":${(KernelBench.Dim + 7) / 8},"graph_build_sec":${f3(r.graphBuildSec)},"graph_ms_per_query":${f3(r.graphMsPerQuery)},"graph_recall_sweep":$graphSweep,"graph_k":${KernelBench.Default.graphK},"baseline_ann_ms_per_query":0.46,"baseline_ann_recall_pct_of_bf":0.918,"report_speedup_vs_bf":$compared}"""
      } catch {
        case e: Throwable =>
          errors("kernel_1m_384") = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          publishErrors()
          "null"
      }
    }

    // ---- diagnostic legs, budget-gated in priority order. COLD-SCAN
    // first (VERDICT r14 next #7: it was the kill's casualty and the
    // bytes-per-doc IO story has no r14 data point), then the
    // graph-slope adjudication leg, then the 2M/4M scale rungs. The
    // forked legs (VERDICT r11 next #2) each run in a FRESH JVM with
    // the parent blocked idle; fork timeout is the remaining budget.
    spark.catalog.clearCache()
    System.gc()

    val coldJson = budgetGated("kernel_cold_scan", "cold", estS = 300.0) {
      try {
        spark.catalog.clearCache()
        val start = KernelBench.canaryTriple()
        val cfgC = KernelBench.Default
        // root carries an encode-cfg fingerprint so a changed cfg can
        // never reuse stale artifacts behind _COLD_READY (ADVICE r10)
        val rootC = operators.ColdScan.artifactRoot("/tmp/graft_coldscan", cfgC)
        val c = operators.ColdScan.run(spark, cfgC, rootC, passes = 3)
        val end = KernelBench.canaryTriple()
        c.tiers.foreach { t =>
          emitter.setCompact(s"cold_${t.name}_ms",
            f3(t.passSec.min * 1000.0 / cfgC.nQueries))
        }
        emitter.setCompact("cold_can_end_sh_r",
          f3(KernelBench.canaryShuffleRatio(end.shuffleMs)))
        def f1(v: Double): String = String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
        val tiers = c.tiers.map { t =>
          s""""${t.name}":{"mb_disk":${f1(t.bytesDisk / 1e6)},"mb_read":${f1(t.bytesRead.min / 1e6)},"ms_per_query":${f3(t.passSec.min * 1000.0 / cfgC.nQueries)},"pass_sec":[${t.passSec.map(f3).mkString(",")}]}"""
        }.mkString(",")
        s"""{"n":${cfgC.n},"dim":${cfgC.dim},${KernelBench.canaryBracketJson(start, end)},"page_cache_dropped":${c.pageCacheDropped},$tiers}"""
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] kernel_cold_scan failed (non-fatal): ${e.getMessage}")
          s"""{"error":${jstr(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))}}"""
      }
    }

    // cold section registers its compacts inline; the skip path here
    if (coldJson.contains("\"skipped\"")) emitter.setCompact("cold", "\"skip\"")

    def forkTimeoutS: Long = math.max(120L, remainingS.toLong + 120L)
    val slopeJson = budgetGated("graph_build_slope", "graphslope", estS = 600.0) {
      forked("graphslope", forkTimeoutS, () => {
        spark.catalog.clearCache(); System.gc()
        BenchLegs.graphSlope(spark)
      })
    }
    compactFrom(slopeJson, "slope",
      "slope_loglog" -> "_loglog",
      "canary_shuffle_ratio" -> "_can_sh_r", "canary_end_shuffle_ratio" -> "_can_end_sh_r")
    val json2m = budgetGated("kernel_2m_384", "full2m", estS = 360.0) {
      forked("full2m", forkTimeoutS, () => {
        spark.catalog.clearCache(); System.gc()
        BenchLegs.full2m(spark)
      })
    }
    compactFrom(json2m, "m2",
      "ms_per_query" -> "_bf_ms", "ann_ms_per_query" -> "_ivf_ms",
      "pq_ms_per_query" -> "_pq_ms")
    val json4m = budgetGated("kernel_4m_384", "float4m", estS = 600.0) {
      forked("float4m", forkTimeoutS, () => {
        spark.catalog.clearCache(); System.gc()
        BenchLegs.float4m(spark)
      })
    }
    compactFrom(json4m, "m4",
      "ms_per_query" -> "_bf_ms", "ann_ms_per_query" -> "_ivf_ms",
      "pq_ms_per_query" -> "_pq_ms")

    publishErrors()
    val line = emitter.finish()
    val trailer = emitter.compactLine()
    spark.stop() // stop BEFORE printing so no further logging can push the
    println(line) // JSON lines out of the driver's bounded stdout tail
    println(trailer) // LAST LINE: small enough that the tail's parse succeeds
    if (errors.nonEmpty) sys.exit(1)
  }
}
