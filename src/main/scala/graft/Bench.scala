package graft

import java.nio.file.{Files, Paths}

/** Benchmark harness (SURVEY A6): times every registry query at the given
  * SF dir and emits ONE JSON line `{"metric":"total","value":…,"queries":…}`.
  *
  * Failure contract (VERDICT r1, wrong #4): a failing query is NOT
  * swallowed — it is recorded with a negative time, listed under "errors",
  * and flips the process exit code to 1, so a regression can't be silently
  * timed as a success. The JSON line is also written to bench_result.json
  * (cwd) because sbt's logger may prefix stdout.
  */
object Bench {

  /** Run one scale leg in a FRESH JVM via [[tools.BenchFork]] and return
    * its JSON body. The child inherits this JVM's full argument list
    * (heap size, --add-opens, -D flags — sbt forked us, so
    * `java.class.path` is the real application classpath) plus the
    * environment (SPARK_GRAFT_* knobs). Stdout is scanned for the single
    * `BENCHFORK_JSON` line; stderr passes through. On any failure the
    * in-session `fallback` runs instead, stamped
    * `"suspect_session_age":true` so a JSON consumer can tell a clean
    * fresh-JVM point from a heap-aged one (VERDICT r11 next #2). */
  private def forked(mode: String, fallback: () => String): String =
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
      // and a blocking readLine here would make waitFor's 45-minute
      // bound dead code — the whole bench would hang with it
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
      val done = p.waitFor(45, java.util.concurrent.TimeUnit.MINUTES)
      if (!done) { p.destroyForcibly(); sys.error(s"fork $mode timed out") }
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
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Section filter for BUILDER-SIDE validation runs (VERDICT r12 next
    // #2: one FULL bench per host-day for publication — targeted
    // re-validation must not burn the day's budget):
    // GRAFT_BENCH_SKIP=registry,kernel,cold,graphslope,float4m,full2m
    // skips the named sections, each publishing {"skipped":true} so the
    // artifact is self-describing. The driver never sets this.
    val skip = sys.env.get("GRAFT_BENCH_SKIP")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    def unlessSkipped(name: String)(body: => String): String =
      if (skip.contains(name)) """{"skipped":true}""" else body
    // fraction 0.75 (not the 0.6 default): the bench is the one entry
    // point that holds multi-GB block caches while building more of
    // them — see GraftSession.build's sizing note
    val spark = GraftSession.build(cpus,
      Some(sys.env.getOrElse("SPARK_GRAFT_MEM_FRACTION", "0.75")))
    // Warm-up: JVM/codegen/scheduler start-up must not be billed to the
    // first timed query (it was inflating it ~10×).
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // Host-state self-description (VERDICT r12 wrong #2): back-to-back
    // FULL benches accumulate host-day slowdown that fresh JVMs and
    // drop_caches do NOT remove (measured: the day's third run read the
    // 1M graph rung 1.8× its first-run value, recalls identical). The
    // artifact records which run of the host-day it is, so a consumer
    // can weigh it — 1 is the day's reference run.
    val benchSeqToday =
      try {
        val f = Paths.get(s"/tmp/graft_bench_seq_${java.time.LocalDate.now()}")
        val prior = if (Files.exists(f)) Files.readString(f).trim.toInt else 0
        // only a FULL bench consumes a host-day sequence number: a
        // skip-gated validation run costs a fraction of the load the
        // stamp exists to account for, and counting it would make the
        // driver's real artifact look later-in-day than it is
        if (skip.isEmpty) { Files.writeString(f, (prior + 1).toString); prior + 1 }
        else prior + 1 // what a full bench started NOW would stamp
      } catch { case _: Throwable => -1 }
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // host-state canary BEFORE each timed section (VERDICT r13 next #4):
    // bench_seq_today flags a polluted host-day; per-section canary_ms
    // lets a consumer NORMALIZE it from the artifact alone
    val registryCanary =
      if (skip.contains("registry")) -1.0 else KernelBench.canaryMs()
    val registryCanaryScan =
      if (skip.contains("registry")) -1.0 else KernelBench.canaryScanMs()
    val results =
      if (skip.contains("registry")) Seq.empty[(String, Double)]
      else SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
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
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    // Keep the line SHORT: the driver parses it from a bounded stdout tail
    // (r2's full-precision line overflowed the buffer -> "parsed": null).
    def f3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // a skipped registry self-describes like every other section, and
    // its total is -1 (the per-query error convention), never a 0.000 a
    // consumer could mistake for a measured zero-second suite
    val qs =
      if (skip.contains("registry")) """{"skipped":true}"""
      else results.map { case (k, v) => s"${jstr(k)}:${f3(v)}" }.mkString("{", ",", "}")
    val total =
      if (skip.contains("registry")) -1.0
      else results.collect { case (_, v) if v >= 0 => v }.sum
    // kNN-graph BUILD slope (VERDICT r11 next #5) — runs FIRST among the
    // kernel sections: unlike the 2M/4M float legs (in-JVM corpora,
    // compute-bound), the graph build is shuffle-heavy, so its fork is
    // sensitive to how much page cache the HOST has left — and the
    // parent's 1M-section residents (31g heap) are exactly what squeezed
    // it when this leg ran last (measured 250k 10.6 / 1M 51.1 in-bench
    // vs 5.4 / 38.9 standalone, even with the fork's own drop_caches).
    // Before the parent has allocated anything big, the fork sees a
    // near-idle host.
    spark.catalog.clearCache()
    System.gc()
    val graphSlope = unlessSkipped("graphslope")(forked("graphslope", () => {
      spark.catalog.clearCache(); System.gc()
      BenchLegs.graphSlope(spark)
    }))
    // Headline: brute-force search at the reference's own scale (1M × 384,
    // 100 queries, top-100) for a like-for-like BASELINE.md comparison.
    val kernel = unlessSkipped("kernel") {
      try {
        spark.catalog.clearCache() // drop query-suite caches before the 1.5 GB corpus
        System.gc()
        // the in-session 1M section was the last bench leg with NO
        // host-state hygiene or self-description (VERDICT r12 wrong #1:
        // its bin headline read 9× wrong after the registry suite's
        // churn, with nothing in the JSON saying so). Start it the way
        // BenchFork starts every fork: sync + drop the page cache, and
        // stamp whether that worked.
        val kernelCacheDropped = operators.ColdScan.dropPageCache()
        val kernelCanary = KernelBench.canaryMs()
        val kernelCanaryScan = KernelBench.canaryScanMs()
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
        def passes(ts: Seq[Double]): String = ts.map(f3).mkString("[", ",", "]")
        val medians = s""""ms_per_query_median":{"bf":${f3(r.bfMsPerQueryMedian)},"ivf":${f3(r.annMsPerQueryMedian)},"sq":${f3(r.sqMsPerQueryMedian)},"pq":${f3(r.pqMsPerQueryMedian)},"bin":${f3(r.binMsPerQueryMedian)}}"""
        s"""{"n":${KernelBench.N},"dim":${KernelBench.Dim},${KernelBench.canaryFieldsJson(kernelCanary, kernelCanaryScan)},"latency_stat":"min_over_same_dial_passes",$medians,"page_cache_dropped":$kernelCacheDropped,"pass_sec":{"bf":${passes(r.bfPassSec)},"ivf":${passes(r.annPassSec)},"sq":${passes(r.sqPassSec)},"pq":${passes(r.pqPassSec)},"bin":${passes(r.binPassSec)}},"ms_per_query":${f3(r.bfMsPerQuery)},"qps":${f3(r.bfQps)},"baseline_ms_per_query":699.43,"ann_build_sec":${f3(r.annBuildSec)},"ann_ms_per_query":${f3(r.annMsPerQuery)},"ann_qps":${f3(r.annQps)},"ann_recall_vs_exact":${f4(r.annRecallVsExact)},"ann_recall_sweep":$sweep,"pq_build_sec":${f3(r.pqBuildSec)},"pq_ms_per_query":${f3(r.pqMsPerQuery)},"pq_qps":${f3(r.pqQps)},"pq_recall_vs_exact":${f4(r.pqRecallVsExact)},"pq_recall_sweep":$pqSweep,"pq_bytes_per_doc":${KernelBench.Dim / KernelBench.PqSubDim},"pq_nprobe":${KernelBench.NProbe},"pq_train_iters":${KernelBench.PqTrainIters},"sq_build_sec":${f3(r.sqBuildSec)},"sq_ms_per_query":${f3(r.sqMsPerQuery)},"sq_qps":${f3(r.sqQps)},"sq_recall_vs_exact":${f4(r.sqRecallVsExact)},"sq_recall_sweep":$sqSweep,"sq_bytes_per_doc":${KernelBench.Dim},"bin_build_sec":${f3(r.binBuildSec)},"bin_ms_per_query":${f3(r.binMsPerQuery)},"bin_qps":${f3(r.binQps)},"bin_recall_vs_exact":${f4(r.binRecallVsExact)},"bin_rescore_sweep":$binSweep,"bin_operating_point":{"pool":${r.binOpPool},"target":${KernelBench.BinOpTarget},"tune_recall_10":${f4(r.binOpTuneRecall)},"heldout_recall_10":${f4(r.binOpHoldRecall)},"ms_per_query":${f3(r.binOpMsPerQuery)}},"bin_bytes_per_doc":${(KernelBench.Dim + 7) / 8},"graph_build_sec":${f3(r.graphBuildSec)},"graph_ms_per_query":${f3(r.graphMsPerQuery)},"graph_recall_sweep":$graphSweep,"graph_k":${KernelBench.Default.graphK},"baseline_ann_ms_per_query":0.46,"baseline_ann_recall_pct_of_bf":0.918,"report_speedup_vs_bf":$compared}"""
      } catch {
        case e: Throwable =>
          errors("kernel_1m_384") = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          "null"
      }
    }
    // Scale rungs (VERDICT r9 next #8 / r8 next #8) — each runs in a
    // FRESH FORKED JVM (VERDICT r11 next #2): multi-GB float-scan
    // throughput decays with JVM session age on this host (measured 4M
    // bf 40 ms/query fresh -> ~150 late-session, residency verified,
    // GC/THP/unpersist ruled out — STATUS r10 #8), so two rounds of
    // published 2M/4M points measured heap age, not scaling. The parent
    // blocks idle while each fork runs (the bench-truth keep-host-idle
    // rule); on fork failure the leg runs in-session with a
    // machine-readable "suspect_session_age":true stamp. Leg bodies and
    // heap gates live in BenchLegs; failures stay non-fatal (diagnostic
    // legs, exit code untouched).
    // free the parent's 1M-section residents before the forks launch —
    // a blocked-idle parent should also be as memory-quiet as possible
    spark.catalog.clearCache()
    System.gc()
    val kernel4m = unlessSkipped("float4m")(forked("float4m", () => {
      spark.catalog.clearCache(); System.gc()
      BenchLegs.float4m(spark)
    }))
    val kernel2m = unlessSkipped("full2m")(forked("full2m", () => {
      spark.catalog.clearCache(); System.gc()
      BenchLegs.full2m(spark)
    }))
    // COLD-SCAN leg (VERDICT r9 next #1): the compression ladder's
    // bytes-per-doc claim measured IO-bound — each tier's packed
    // artifact re-read from parquet per pass, page cache dropped before
    // every pass, bytes-read (syscall-level) + ms/query per tier.
    // Failure is inline-reported, non-fatal (diagnostic leg).
    val cold = unlessSkipped("cold") {
      try {
        spark.catalog.clearCache()
        val coldCanary = KernelBench.canaryMs()
        val coldCanaryScan = KernelBench.canaryScanMs()
        val cfgC = KernelBench.Default
        // root carries an encode-cfg fingerprint so a changed cfg can
        // never reuse stale artifacts behind _COLD_READY (ADVICE r10)
        val rootC = operators.ColdScan.artifactRoot("/tmp/graft_coldscan", cfgC)
        val c = operators.ColdScan.run(spark, cfgC, rootC, passes = 3)
        def f1(v: Double): String = String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
        val tiers = c.tiers.map { t =>
          s""""${t.name}":{"mb_disk":${f1(t.bytesDisk / 1e6)},"mb_read":${f1(t.bytesRead.min / 1e6)},"ms_per_query":${f3(t.passSec.min * 1000.0 / cfgC.nQueries)},"pass_sec":[${t.passSec.map(f3).mkString(",")}]}"""
        }.mkString(",")
        s"""{"n":${cfgC.n},"dim":${cfgC.dim},${KernelBench.canaryFieldsJson(coldCanary, coldCanaryScan)},"page_cache_dropped":${c.pageCacheDropped},$tiers}"""
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] kernel_cold_scan failed (non-fatal): ${e.getMessage}")
          s"""{"error":${jstr(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))}}"""
      }
    }
    // serialize errors only now — the kernel benchmark above may add one
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val line =
      {
        val (regR1, regR2) = KernelBench.canaryRatios(registryCanary, registryCanaryScan)
        s"""{"metric":"total","value":${f3(total)},"unit":"sec","bench_seq_today":$benchSeqToday,"canary_reference":${KernelBench.canaryReferenceJson},"registry_canary_ms":${f3(registryCanary)},"registry_canary_scan_ms":${f3(registryCanaryScan)},"registry_canary_ratio":${f3(regR1)},"registry_canary_scan_ratio":${f3(regR2)},"queries":$qs,"kernel_1m_384":$kernel,"kernel_cold_scan":$cold,"kernel_2m_384":$kernel2m,"kernel_4m_384":$kernel4m,"graph_build_slope":$graphSlope,"errors":$errJson,"sf":"$sfDir"}"""
      }
    Files.writeString(Paths.get("bench_result.json"), line + "\n")
    spark.stop() // stop BEFORE printing so no further logging can push the
    println(line) // JSON line out of the driver's bounded stdout tail
    if (errors.nonEmpty) sys.exit(1)
  }
}
