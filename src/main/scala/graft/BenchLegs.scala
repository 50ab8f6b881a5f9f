package graft

import org.apache.spark.sql.SparkSession

/** The scale-rung bench legs, factored out of [[Bench]] so they can run
  * EITHER in-session or in a fresh forked JVM ([[tools.BenchFork]]).
  *
  * Why forking exists (VERDICT r10 next #1 / r11 next #2): multi-GB
  * float-scan throughput on this host decays with JVM session age — the
  * same fully-memory-resident 4M×384 scan measured ~40 ms/query in a
  * fresh JVM vs ~150 late in a full bench session, with residency
  * verified and GC/THP/unpersist effects ruled out (STATUS r10 #8). Two
  * rounds published the polluted in-session numbers; the fix is to run
  * each big-float rung in its own JVM, so the published 2M/4M points
  * measure SCALING, not heap age. Each leg returns the SAME JSON body it
  * always published, plus `"forked":true` when run via BenchFork; the
  * in-session fallback stamps `"suspect_session_age":true` so a JSON
  * consumer can never mistake a polluted number for a clean one.
  */
object BenchLegs {

  private[graft] def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  private def f3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
  private def f4(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))

  private def err(e: Throwable): String =
    s"""{"error":${jstr(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))}}"""

  /** The REGISTRY suite as a forkable leg (round 15): every registry
    * query timed once at `sfDir`, canary-bracketed. Runs in a
    * RIGHT-SIZED (12g) fork rather than the parent's 31g JVM: on this
    * host, supplying fresh pages to a guest JVM collapses as its
    * resident set grows (8g pre-touch 4 s, 31g 105 s — measured r15),
    * so the suite's shuffle-heavy queries read 3-18× slow inside the
    * big-heap bench JVM on a degraded host-day (q79: 77.7 s warm at
    * 31g vs 7.6 s at 8g, same host, same minute) while the queries
    * themselves are shape-clean. The scale rungs need the big heap;
    * the registry does not.
    *
    * Returns `{"value":…, <canary bracket>, "queries":{…}, "errors":{…}}`
    * — the parent decomposes it into the artifact's canonical fields. */
  def registry(spark: SparkSession, sfDir: String): String = {
    spark.catalog.clearCache() // no-op in a fresh fork; real in the fallback
    // JVM/codegen/scheduler start-up must not be billed to the first
    // timed query (measured ~10× inflation)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    warmIoPaths(spark)
    val start = KernelBench.canaryTriple()
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
    val end = KernelBench.canaryTriple()
    val qs = results.map { case (k, v) => s"${jstr(k)}:${f3(v)}" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    s"""{"value":${f3(total)},${KernelBench.canaryBracketJson(start, end)},"queries":$qs,"errors":$errJson}"""
  }

  /** Warm the parquet-reader / shuffle-exchange / broadcast-join code
    * paths on THROWAWAY synthetic data (round 16): the suite's first
    * timed query was additionally billed the one-time class-init of the
    * vectorized parquet reader, codecs and exchange machinery — q01
    * measured 7.1 s wall against 5.3 s of executor time on 6 tasks at
    * sf0.1, i.e. several seconds of driver-side first-use cost. The
    * fixture parquet itself is deliberately NOT read here: warming is
    * code-path-only, never input-page-cache. */
  private[graft] def warmIoPaths(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions.broadcast
    val dir = s"/tmp/graft_warm_${ProcessHandle.current().pid()}"
    try {
      spark.range(0, 10000)
        .selectExpr("id", "cast(id % 7 as string) k", "cast(id as double) v")
        .write.mode("overwrite").parquet(dir)
      val back = spark.read.parquet(dir)
      val agg = back.groupBy("k").count()
      agg.join(broadcast(agg.limit(3).withColumnRenamed("count", "c2")), Seq("k"))
        .orderBy("k")
        .collect()
      ()
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] IO warm-up failed (non-fatal): ${e.getMessage}")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  /** The 1M×384 kernel ladder as a forkable leg (round 15) — the
    * like-for-like BASELINE.md comparison, right-sized to a 16g fork
    * for the same page-supply reason as [[registry]] (the ladder's
    * cached structures are ~4-5 GB; 16g holds them without entering
    * the degraded big-resident regime whose build phases read 3× on
    * bad days — r14 pq_build 43.9 s vs ~13 clean). Returns the section
    * JSON [[graft.Bench]] always published, or `{"error":…}`. */
  def kernel1m(spark: SparkSession): String =
    try {
      spark.catalog.clearCache()
      val kernelCacheDropped = graft.operators.ColdScan.dropPageCache()
      val start = KernelBench.canaryTriple()
      val r = KernelBench.run(spark)
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
      def passes(ts: Seq[Double]): String = ts.map(f3).mkString("[", ",", "]")
      val medians = s""""ms_per_query_median":{"bf":${f3(r.bfMsPerQueryMedian)},"ivf":${f3(r.annMsPerQueryMedian)},"sq":${f3(r.sqMsPerQueryMedian)},"pq":${f3(r.pqMsPerQueryMedian)},"bin":${f3(r.binMsPerQueryMedian)}}"""
      s"""{"n":${KernelBench.N},"dim":${KernelBench.Dim},${KernelBench.canaryBracketJson(start, end)},"latency_stat":"min_over_same_dial_passes",$medians,"leg_cache_dropped":$kernelCacheDropped,"pass_sec":{"bf":${passes(r.bfPassSec)},"ivf":${passes(r.annPassSec)},"sq":${passes(r.sqPassSec)},"pq":${passes(r.pqPassSec)},"bin":${passes(r.binPassSec)}},"ms_per_query":${f3(r.bfMsPerQuery)},"qps":${f3(r.bfQps)},"baseline_ms_per_query":699.43,"ann_build_sec":${f3(r.annBuildSec)},"ann_ms_per_query":${f3(r.annMsPerQuery)},"ann_qps":${f3(r.annQps)},"ann_recall_vs_exact":${f4(r.annRecallVsExact)},"ann_recall_sweep":$sweep,"pq_build_sec":${f3(r.pqBuildSec)},"pq_ms_per_query":${f3(r.pqMsPerQuery)},"pq_qps":${f3(r.pqQps)},"pq_recall_vs_exact":${f4(r.pqRecallVsExact)},"pq_recall_sweep":$pqSweep,"pq_bytes_per_doc":${KernelBench.Dim / KernelBench.PqSubDim},"pq_nprobe":${KernelBench.NProbe},"pq_train_iters":${KernelBench.PqTrainIters},"sq_build_sec":${f3(r.sqBuildSec)},"sq_ms_per_query":${f3(r.sqMsPerQuery)},"sq_qps":${f3(r.sqQps)},"sq_recall_vs_exact":${f4(r.sqRecallVsExact)},"sq_recall_sweep":$sqSweep,"sq_bytes_per_doc":${KernelBench.Dim},"bin_build_sec":${f3(r.binBuildSec)},"bin_ms_per_query":${f3(r.binMsPerQuery)},"bin_qps":${f3(r.binQps)},"bin_recall_vs_exact":${f4(r.binRecallVsExact)},"bin_rescore_sweep":$binSweep,"bin_operating_point":{"pool":${r.binOpPool},"target":${KernelBench.BinOpTarget},"tune_recall_10":${f4(r.binOpTuneRecall)},"heldout_recall_10":${f4(r.binOpHoldRecall)},"ms_per_query":${f3(r.binOpMsPerQuery)}},"bin_bytes_per_doc":${(KernelBench.Dim + 7) / 8},"graph_build_sec":${f3(r.graphBuildSec)},"graph_build_telemetry":${r.graphBuildTelemetry},"graph_ms_per_query":${f3(r.graphMsPerQuery)},"graph_recall_sweep":$graphSweep,"graph_k":${KernelBench.Default.graphK},"baseline_ann_ms_per_query":0.46,"baseline_ann_recall_pct_of_bf":0.918,"report_speedup_vs_bf":$compared}"""
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] kernel_1m_384 failed: ${e.getMessage}")
        err(e)
    }

  /** COLD-SCAN leg (VERDICT r9 next #1, forkable since r15): the
    * compression ladder's bytes-per-doc claim measured IO-bound — each
    * tier's packed artifact re-read from parquet per pass, page cache
    * dropped before every pass, bytes-read (syscall-level) + ms/query
    * per tier. Right-sized fork (16g): the encode phase writes ~2 GB of
    * tier artifacts (allocation-heavy) and the measurement must not be
    * distorted by big-resident page-supply degradation. */
  def coldScan(spark: SparkSession): String =
    try {
      val start = KernelBench.canaryTriple()
      val cfgC = KernelBench.Default
      // root carries an encode-cfg fingerprint so a changed cfg can
      // never reuse stale artifacts behind _COLD_READY (ADVICE r10)
      val rootC = graft.operators.ColdScan.artifactRoot("/tmp/graft_coldscan", cfgC)
      val c = graft.operators.ColdScan.run(spark, cfgC, rootC, passes = 3)
      val end = KernelBench.canaryTriple()
      def f1(v: Double): String = String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
      val tiers = c.tiers.map { t =>
        s""""${t.name}":{"mb_disk":${f1(t.bytesDisk / 1e6)},"mb_read":${f1(t.bytesRead.min / 1e6)},"ms_per_query":${f3(t.passSec.min * 1000.0 / cfgC.nQueries)},"pass_sec":[${t.passSec.map(f3).mkString(",")}]}"""
      }.mkString(",")
      s"""{"n":${cfgC.n},"dim":${cfgC.dim},${KernelBench.canaryBracketJson(start, end)},"leg_cache_dropped":${c.pageCacheDropped},$tiers}"""
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] kernel_cold_scan failed (non-fatal): ${e.getMessage}")
        err(e)
    }

  /** One full-ladder scale rung (bf + IVF + SQ8 + PQ + binary, one
    * sweep level, no kNN graph): the JSON body shared by the 2M and 4M
    * legs. Every tier carries its recall-vs-exact, so the compression
    * ladder's scale-slope story is complete at each rung (VERDICT r13
    * next #5: the 100 TB argument is exactly that the compressed tiers'
    * slope holds where float's breaks). `canary_ms` is the host-state
    * reference kernel measured immediately before the rung's timed
    * sections — the in-artifact normalizer for a polluted host-day. */
  private def ladderRung(spark: SparkSession, n: Int): String = {
    spark.catalog.clearCache()
    val canaryStart = KernelBench.canaryTriple()
    // the BINARY dial scales with n (r14, from the first 4M ladder run:
    // pool 3000 read recall 0.74 at 4M vs 0.98 at 1M): Hamming pre-rank
    // quality at a fixed 48-byte code degrades as the corpus grows, and
    // the tier's declared dial is exactly "recall is bought with exact
    // rescore depth" — holding R/n constant holds recall while the
    // rescore cost stays linear in n, the 100 TB slope claim this rung
    // exists to measure. The scaled pool is published beside the recall.
    val scale = math.max(1, n / KernelBench.Default.n)
    // the 4M rung runs min-of-2 timed passes (VERDICT r15 next #4): on
    // this host epoch the 31g-resident leg pays degraded page supply
    // throughout, and 2 passes at fixed dials keep it inside degraded-
    // day budgets where 3 overran (r15: 1031 s and unfinished)
    val cfg = KernelBench.Default.copy(
      n = n, sweepProbes = Seq(KernelBench.Default.nProbe), graphK = 0,
      binRescore = KernelBench.Default.binRescore * scale,
      binSweepPools = KernelBench.Default.binSweepPools.map(_ * scale),
      timedPasses = if (n >= 4000000) 2 else 3)
    val r = KernelBench.run(spark, cfg)
    val canaryEnd = KernelBench.canaryTriple()
    s"""{"n":${cfg.n},"dim":${cfg.dim},${KernelBench.canaryBracketJson(canaryStart, canaryEnd)},"ms_per_query":${f3(r.bfMsPerQuery)},"ann_build_sec":${f3(r.annBuildSec)},"ann_ms_per_query":${f3(r.annMsPerQuery)},"ann_recall_vs_exact":${f4(r.annRecallVsExact)},"sq_build_sec":${f3(r.sqBuildSec)},"sq_ms_per_query":${f3(r.sqMsPerQuery)},"sq_recall_vs_exact":${f4(r.sqRecallVsExact)},"pq_build_sec":${f3(r.pqBuildSec)},"pq_ms_per_query":${f3(r.pqMsPerQuery)},"pq_recall_vs_exact":${f4(r.pqRecallVsExact)},"bin_build_sec":${f3(r.binBuildSec)},"bin_ms_per_query":${f3(r.binMsPerQuery)},"bin_recall_vs_exact":${f4(r.binRecallVsExact)},"bin_rescore_pool":${cfg.binRescore}}"""
  }

  /** 4M FULL-LADDER rung (VERDICT r13 next #5 — was float-only): the
    * compressed tiers at 4M are cheaper than the float leg this rung
    * already measured, and they complete the ladder's scale slope.
    * Heap-gated at 28g (2× the 2M rung's measured-sufficient 14g) —
    * an executor-task OOM kills the JVM past any catch. */
  def float4m(spark: SparkSession): String =
    if (Runtime.getRuntime.maxMemory < 28L * 1024 * 1024 * 1024 * 96 / 100)
      s"""{"skipped":"heap ${Runtime.getRuntime.maxMemory >> 20} MiB < 28g"}"""
    else try ladderRung(spark, 4000000)
    catch {
      case e: Throwable =>
        System.err.println(s"[bench] kernel_4m_384 failed (non-fatal): ${e.getMessage}")
        err(e)
    }

  /** 2M full-ladder rung: the middle compressed-tier slope point.
    * Heap-gated at 14g. */
  def full2m(spark: SparkSession): String =
    if (Runtime.getRuntime.maxMemory < 14L * 1024 * 1024 * 1024 * 96 / 100)
      s"""{"skipped":"heap ${Runtime.getRuntime.maxMemory >> 20} MiB < 14g"}"""
    else try ladderRung(spark, 2000000)
    catch {
      case e: Throwable =>
        System.err.println(s"[bench] kernel_2m_384 failed (non-fatal): ${e.getMessage}")
        err(e)
    }

  /** Measured kNN-graph BUILD slope (VERDICT r11 next #5): the graph is
    * the one index build whose cost is cluster-scoped n²
    * (`(gp/C)·n²·m` byte-ops — [[operators.VectorBlocks.pqKnnGraph]]'s
    * documented bound), 54× the IVF build at 1M, and until now the
    * claim had no measured point. The rungs time EXACTLY what the 1M
    * section bills: prerequisite structures built untimed, then
    * `pqKnnGraph(...).collect()` inside the window.
    *
    * An OPPORTUNISTIC 2M rung (round 16): the SQ8 probe-row shuffle cut
    * the 1M rung to ~45 s/pass, which brings a 2M point (projected
    * ~2.5 min with prereqs) inside reach — but only on days whose
    * budget allows. The leg receives its own wall allowance from the
    * parent (argv(1) of the fork), projects the 2M cost FROM ITS OWN
    * same-run fit (`t_2M = t_1M_min · 2^slope` plus ~2.2× the measured
    * 1M prereq build), and runs a single telemetry-bracketed pass only
    * when `elapsed + projected + margin` fits the allowance —
    * publishing `rung_2m` as data or as a self-describing skip stamp
    * with the projection it declined. The canonical 3-rung
    * `slope_loglog` stays comparable across rounds; when the 2M point
    * exists, `slope_loglog_ext` publishes the 4-rung, 8×-span fit.
    *
    * Measured history (fresh JVM, warmed kernel, min-of-2 passes):
    * the pre-r12 FULL-SCAN kernel read 250k 23.4–33.5 s, 500k
    * 71.1–75.2 s (slope ≈ 1.6, local slope ≈ 2 past 500k, 1M
    * graph_build_sec ~290-360 s) — the quadratic code-streaming term
    * plus a per-(prober, list) LUT build dominated. The round-12
    * two-stage kernel (Hamming-nominated pool via counting-select +
    * exact-ADC rescore of the pool, see
    * [[operators.VectorBlocks.pqKnnGraph]]) cut the same rungs 7–8×:
    * 250k 4.2 s, 500k 12.3 s, 1M 42.4 s — cheap enough that the 1M
    * rung (formerly ~5 min/pass, out of budget) is now published too,
    * with the 1M recall sweep unchanged to three decimals. The
    * remaining slope ≈ 1.7 is the benched workload's FIXED C=64
    * (members/list grows with n, so the per-pair Hamming term is
    * n²·(dim/64)/C); a deployment following the engine's own rebalance
    * guidance scales C with n and keeps members/list — and therefore
    * the build — linear. The rungs keep timing the build so any future
    * kernel change re-measures itself. */
  def graphSlope(spark: SparkSession, wallBudgetS: Option[Double] = None): String =
    try {
      val legT0 = System.nanoTime()
      def legElapsedS: Double = (System.nanoTime() - legT0) / 1e9
      val canaryStart = KernelBench.canaryTriple()
      // UNTIMED warm-up build first: in the full bench the ADC scan
      // kernel is C2-compiled long before the graph section (the PQ
      // searches share it); a graph-only fresh JVM would bill rung 1
      // for JIT instead (measured: 250k read 131.9 s cold vs the n²
      // fit's ~22 — the slope came out NEGATIVE)
      graphBuildOnly(spark, KernelBench.Default.copy(n = 100000))
      // min-of-2 passes per rung (the bench's min-of-3 discipline, one
      // pass cheaper): even warmed, a single first pass at a rung has
      // measured up to 4× over its own repeat in-bench (135.7 s vs the
      // 35.6 s standalone at 250k) — per-pass times publish alongside
      // the min so the spread is never hidden
      // a 1M rung was unaffordable under the full-scan kernel (~300 s
      // per pass); the round-12 nominated kernel brought it to ~30 s,
      // so the published slope now spans a full 4× — fit = log-log
      // least squares over all rungs, not a 2-point ratio
      // the 1M rung gets a third pass: it is the leg's biggest shuffle
      // job and measures the widest spread (79.5/64.6 in one run vs
      // 38.9 standalone, with the small rungs clean in both) — one more
      // sample on the noisiest point costs ~40 s and tightens the min
      val rungs = Seq(250000 -> 2, 500000 -> 2, 1000000 -> 3)
      val secs = rungs.map { case (n, p) =>
        spark.catalog.clearCache()
        (n, graphBuildOnly(spark, KernelBench.Default.copy(n = n), passes = p))
      }
      def fitSlope(pts: Seq[(Int, Double)]): Double = {
        val xs = pts.map { case (n, _) => math.log(n.toDouble) }
        val ys = pts.map { case (_, s) => math.log(s) }
        val xm = xs.sum / xs.length
        val ym = ys.sum / ys.length
        xs.zip(ys).map { case (x, y) => (x - xm) * (y - ym) }.sum /
          xs.map(x => (x - xm) * (x - xm)).sum
      }
      val canonical = secs.map { case (n, (_, ps)) => n -> ps.map(_.sec).min }
      val slope = fitSlope(canonical)
      // Per-pass evidence (VERDICT r15 next #3): every pass publishes a
      // canary triple measured right after it plus the window's Spark
      // stage telemetry, so a slow rung names its cause — bytes/stages
      // unchanged with run-vs-cpu inflated = environmental stall class;
      // bytes or stage counts grown = code. The rung's own start triple
      // brackets the first pass.
      def pointJson(n: Int, prereqS: Double, ps: Seq[GraphPass]): String = {
        val passes = ps.map { p =>
          s"""{"sec":${f3(p.sec)},"telemetry":${p.telemetry},""" +
            s""""canary_after":{${KernelBench.canaryStemJson("canary", p.canaryAfter)}}}"""
        }.mkString("[", ",", "]")
        s""""$n":{"sec":${f3(ps.map(_.sec).min)},"pass_sec":[${ps.map(p => f3(p.sec)).mkString(",")}],"prereq_s":${f3(prereqS)},"passes":$passes}"""
      }
      val points = secs.map { case (n, (pre, ps)) => pointJson(n, pre, ps) }
        .mkString("{", ",", "}")
      // ---- opportunistic 2M rung: projected from THIS run's fit
      val prereq1m = secs.last._2._1
      val t1mMin = canonical.last._2
      val projected2m = Bench.ForkPolicy.slope2mProjectedS(prereq1m, t1mMin, slope)
      // stamps use "declined"/"rung_2m_error", NEVER "skipped"/"error":
      // the parent's compactFrom scans the whole leg JSON for those
      // literals to classify the SECTION — a nested stamp must not make
      // three measured rungs read as a skipped or errored leg
      val rung2m: String = wallBudgetS match {
        case Some(budget)
            if Bench.ForkPolicy.slope2mAffordable(budget, legElapsedS, projected2m) =>
          // optional work: a crash here (e.g. the 16g heap under a
          // degraded day's page supply) must not lose the canonical data
          try {
            spark.catalog.clearCache()
            val (pre2m, ps2m) =
              graphBuildOnly(spark, KernelBench.Default.copy(n = 2000000), passes = 1)
            val ext = fitSlope(canonical :+ (2000000 -> ps2m.map(_.sec).min))
            s"""{"sec":${f3(ps2m.map(_.sec).min)},"prereq_s":${f3(pre2m)},"projected_s":${f3(projected2m)},"slope_loglog_ext":${f3(ext)},"passes":${
              ps2m.map { p =>
                s"""{"sec":${f3(p.sec)},"telemetry":${p.telemetry},""" +
                  s""""canary_after":{${KernelBench.canaryStemJson("canary", p.canaryAfter)}}}"""
              }.mkString("[", ",", "]")}}"""
          } catch {
            case e: Throwable =>
              System.err.println(s"[bench] 2M rung failed (canonical rungs intact): ${e.getMessage}")
              s"""{"rung_2m_error":${jstr(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))},"projected_s":${f3(projected2m)}}"""
          }
        case Some(budget) =>
          s"""{"declined":"leg_budget","projected_s":${f3(projected2m)},"wall_budget_s":${f3(budget)},"elapsed_s":${f3(legElapsedS)}}"""
        case None =>
          s"""{"declined":"no_wall_budget","projected_s":${f3(projected2m)}}"""
      }
      val canaryEnd = KernelBench.canaryTriple()
      s"""{${KernelBench.canaryBracketJson(canaryStart, canaryEnd)},"points":$points,"slope_loglog":${f3(slope)},"rung_2m":$rung2m,"graph_k":${KernelBench.Default.graphK},"gp":2}"""
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] graph_build_slope failed (non-fatal): ${e.getMessage}")
        err(e)
    }

  /** One timed pass's full evidence record (VERDICT r15 next #3). */
  final case class GraphPass(
      sec: Double, telemetry: String, canaryAfter: KernelBench.CanaryTriple)

  /** One timed graph build at cfg.n: same prerequisites as
    * [[KernelBench.run]] (packed blocks, trained coarse quantizer,
    * assignment, residual-PQ index), none of it billed to the graph
    * window — the window is the pqKnnGraph job + the driver collect,
    * exactly what the 1M section times. Each pass is wrapped in
    * [[BenchTelemetry.measure]] and followed by a canary triple.
    * @return (prereq build seconds, timed passes) — the prereq time
    *         feeds the opportunistic 2M rung's cost projection */
  private def graphBuildOnly(
      spark: SparkSession, cfg: KernelBench.Cfg, passes: Int = 1): (Double, Seq[GraphPass]) = {
    import spark.implicits._
    import graft.operators.VectorBlocks
    val preT0 = System.nanoTime()
    val bcCfg = cfg
    val corpus = spark.range(cfg.n.toLong)
      .map(id => (id, KernelBench.vec(bcCfg, id)))
      .toDF("id", "vec")
      .as[(Long, Array[Float])]
    val blocks = VectorBlocks.pack(corpus, cfg.dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    blocks.count()
    val cents = KernelBench.trainCoarse(cfg)
    val indexed = VectorBlocks.assign(blocks, cents)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    indexed.count()
    val codebook = KernelBench.trainPqCodebook(cfg, cents)
    val encoded = VectorBlocks.encodePqResidual(indexed, cents, codebook, cfg.pqSubDim)
    val pqIndex = VectorBlocks
      .buildPqIndex(indexed, encoded, cfg.centroids, cfg.pqCodebook, cfg.pqSubDim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pqIndex.count()
    val prereqS = (System.nanoTime() - preT0) / 1e9
    val secs = (1 to passes).map { _ =>
      // flush dirty writeback OUT of the timed window: the window's own
      // shuffle writes must not queue behind a prior rung's (or a prior
      // bench leg's) pending pages
      try new ProcessBuilder("sync").start().waitFor()
      catch { case _: Throwable => () }
      val (sec, tel) = BenchTelemetry.measure(spark.sparkContext) {
        val t0 = System.nanoTime()
        val edges = VectorBlocks
          .pqKnnGraph(indexed, pqIndex, cents, codebook, cfg.pqSubDim, cfg.graphK, gp = 2)
          .collect()
        require(edges.length > 0, "graph build produced no adjacency rows")
        (System.nanoTime() - t0) / 1e9
      }
      GraphPass(sec, tel, KernelBench.canaryTriple())
    }
    blocks.unpersist(blocking = true)
    indexed.unpersist(blocking = true)
    pqIndex.unpersist(blocking = true)
    (prereqS, secs)
  }
}
