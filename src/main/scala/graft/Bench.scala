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
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // fraction 0.75 (not the 0.6 default): the bench is the one entry
    // point that holds multi-GB block caches while building more of
    // them — see GraftSession.build's sizing note
    val spark = GraftSession.build(cpus,
      Some(sys.env.getOrElse("SPARK_GRAFT_MEM_FRACTION", "0.75")))
    // Warm-up: JVM/codegen/scheduler start-up must not be billed to the
    // first timed query (it was inflating it ~10×).
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
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
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    // Keep the line SHORT: the driver parses it from a bounded stdout tail
    // (r2's full-precision line overflowed the buffer -> "parsed": null).
    def f3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => s"${jstr(k)}:${f3(v)}" }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // Headline: brute-force search at the reference's own scale (1M × 384,
    // 100 queries, top-100) for a like-for-like BASELINE.md comparison.
    val kernel =
      try {
        spark.catalog.clearCache() // drop query-suite caches before the 1.5 GB corpus
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
        s"""{"n":${KernelBench.N},"dim":${KernelBench.Dim},"ms_per_query":${f3(r.bfMsPerQuery)},"qps":${f3(r.bfQps)},"baseline_ms_per_query":699.43,"ann_build_sec":${f3(r.annBuildSec)},"ann_ms_per_query":${f3(r.annMsPerQuery)},"ann_qps":${f3(r.annQps)},"ann_recall_vs_exact":${f4(r.annRecallVsExact)},"ann_recall_sweep":$sweep,"pq_build_sec":${f3(r.pqBuildSec)},"pq_ms_per_query":${f3(r.pqMsPerQuery)},"pq_qps":${f3(r.pqQps)},"pq_recall_vs_exact":${f4(r.pqRecallVsExact)},"pq_recall_sweep":$pqSweep,"pq_bytes_per_doc":${KernelBench.Dim / KernelBench.PqSubDim},"pq_nprobe":${KernelBench.NProbe},"pq_train_iters":${KernelBench.PqTrainIters},"sq_build_sec":${f3(r.sqBuildSec)},"sq_ms_per_query":${f3(r.sqMsPerQuery)},"sq_qps":${f3(r.sqQps)},"sq_recall_vs_exact":${f4(r.sqRecallVsExact)},"sq_recall_sweep":$sqSweep,"sq_bytes_per_doc":${KernelBench.Dim},"bin_build_sec":${f3(r.binBuildSec)},"bin_ms_per_query":${f3(r.binMsPerQuery)},"bin_qps":${f3(r.binQps)},"bin_recall_vs_exact":${f4(r.binRecallVsExact)},"bin_rescore_sweep":$binSweep,"bin_operating_point":{"pool":${r.binOpPool},"target":${KernelBench.BinOpTarget},"tune_recall_10":${f4(r.binOpTuneRecall)},"heldout_recall_10":${f4(r.binOpHoldRecall)},"ms_per_query":${f3(r.binOpMsPerQuery)}},"bin_bytes_per_doc":${(KernelBench.Dim + 7) / 8},"graph_build_sec":${f3(r.graphBuildSec)},"graph_ms_per_query":${f3(r.graphMsPerQuery)},"graph_recall_sweep":$graphSweep,"graph_k":${KernelBench.Default.graphK},"baseline_ann_ms_per_query":0.46,"baseline_ann_recall_pct_of_bf":0.918,"report_speedup_vs_bf":$compared}"""
      } catch {
        case e: Throwable =>
          errors("kernel_1m_384") = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          "null"
      }
    // 4M rung (VERDICT r9 next #8): the third point of the scale-slope
    // fit — FLOAT LADDERS ONLY (bf + IVF). The all-tiers 4M working set
    // is past the reliable single-JVM envelope (KernelBench.runFloat's
    // scaladoc has the measured envelope; compressed-tier slopes publish
    // at the 2M rung where every tier stays resident).
    val kernel4m =
      if (Runtime.getRuntime.maxMemory < 28L * 1024 * 1024 * 1024 * 96 / 100)
        s"""{"skipped":"heap ${Runtime.getRuntime.maxMemory >> 20} MiB < 28g"}"""
      else try {
        spark.catalog.clearCache()
        // runs DIRECTLY after the 1M section, before the cold-scan and
        // 2M churn: large-array scan throughput degrades as this JVM's
        // heap ages even fully memory-resident (measured 4M bf 40
        // ms/query fresh -> 66 after the 1M section -> 150 after the
        // full bench; GC, blocking unpersists and THP all ruled out) —
        // section order is the one lever that keeps the published rung
        // close to the standalone number. STATUS round-10 notes carry
        // the full measurement set.
        System.gc()
        val cfg4 = KernelBench.Default.copy(
          n = 4000000, sweepProbes = Seq(KernelBench.Default.nProbe), graphK = 0)
        val r4 = KernelBench.runFloat(spark, cfg4)
        val f4 = (v: Double) => String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
        s"""{"n":${cfg4.n},"dim":${cfg4.dim},"float_only":true,"ms_per_query":${f3(r4.bfMsPerQuery)},"ann_build_sec":${f3(r4.annBuildSec)},"ann_ms_per_query":${f3(r4.annMsPerQuery)},"ann_recall_vs_exact":${f4(r4.annRecallVsExact)}}"""
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] kernel_4m_384 failed (non-fatal): ${e.getMessage}")
          s"""{"error":${jstr(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))}}"""
      }
    // Scale-slope section (VERDICT r8 next #8): the same four scan
    // ladders at 2× the reference scale, trimmed to one sweep level and
    // no kNN graph (its cluster-scoped cost is n²-scaled). A 2M failure
    // (e.g. memory on a smaller host) reports inline WITHOUT flipping
    // the exit code — the slope probe is diagnostic, not a gate.
    // (ordering: both scale rungs run before the cold-scan leg — the
    // aged-heap scan penalty documented at the 4M section hits the big
    // resident float ladders; the cold leg is IO-dominated with small
    // per-pass structures and measures the same either way)
    val kernel2m =
      if (Runtime.getRuntime.maxMemory < 14L * 1024 * 1024 * 1024 * 96 / 100)
        // an executor-task OOM at this scale kills the JVM past any
        // catch (measured at 12g) — skip rather than risk the whole run
        s"""{"skipped":"heap ${Runtime.getRuntime.maxMemory >> 20} MiB < 14g"}"""
      else try {
        spark.catalog.clearCache()
        System.gc() // old-gen compaction between sections (see 4M note)
        val cfg2 = KernelBench.Default.copy(
          n = 2000000, sweepProbes = Seq(KernelBench.Default.nProbe), graphK = 0)
        val r2 = KernelBench.run(spark, cfg2)
        val f4 = (v: Double) => String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
        s"""{"n":${cfg2.n},"dim":${cfg2.dim},"ms_per_query":${f3(r2.bfMsPerQuery)},"ann_build_sec":${f3(r2.annBuildSec)},"ann_ms_per_query":${f3(r2.annMsPerQuery)},"ann_recall_vs_exact":${f4(r2.annRecallVsExact)},"sq_build_sec":${f3(r2.sqBuildSec)},"sq_ms_per_query":${f3(r2.sqMsPerQuery)},"sq_recall_vs_exact":${f4(r2.sqRecallVsExact)},"pq_build_sec":${f3(r2.pqBuildSec)},"pq_ms_per_query":${f3(r2.pqMsPerQuery)},"pq_recall_vs_exact":${f4(r2.pqRecallVsExact)}}"""
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] kernel_2m_384 failed (non-fatal): ${e.getMessage}")
          s"""{"error":${jstr(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))}}"""
      }
    // COLD-SCAN leg (VERDICT r9 next #1): the compression ladder's
    // bytes-per-doc claim measured IO-bound — each tier's packed
    // artifact re-read from parquet per pass, page cache dropped before
    // every pass, bytes-read (syscall-level) + ms/query per tier.
    // Failure is inline-reported, non-fatal (diagnostic leg).
    val cold =
      try {
        spark.catalog.clearCache()
        val cfgC = KernelBench.Default
        // root carries an encode-cfg fingerprint so a changed cfg can
        // never reuse stale artifacts behind _COLD_READY (ADVICE r10)
        val rootC = operators.ColdScan.artifactRoot("/tmp/graft_coldscan", cfgC)
        val c = operators.ColdScan.run(spark, cfgC, rootC, passes = 3)
        def f1(v: Double): String = String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
        val tiers = c.tiers.map { t =>
          s""""${t.name}":{"mb_disk":${f1(t.bytesDisk / 1e6)},"mb_read":${f1(t.bytesRead.min / 1e6)},"ms_per_query":${f3(t.passSec.min * 1000.0 / cfgC.nQueries)},"pass_sec":[${t.passSec.map(f3).mkString(",")}]}"""
        }.mkString(",")
        s"""{"n":${cfgC.n},"dim":${cfgC.dim},"page_cache_dropped":${c.pageCacheDropped},$tiers}"""
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] kernel_cold_scan failed (non-fatal): ${e.getMessage}")
          s"""{"error":${jstr(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))}}"""
      }
    // serialize errors only now — the kernel benchmark above may add one
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"kernel_1m_384":$kernel,"kernel_cold_scan":$cold,"kernel_2m_384":$kernel2m,"kernel_4m_384":$kernel4m,"errors":$errJson,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("bench_result.json"), line + "\n")
    spark.stop() // stop BEFORE printing so no further logging can push the
    println(line) // JSON line out of the driver's bounded stdout tail
    if (errors.nonEmpty) sys.exit(1)
  }
}
