package graft

import org.apache.spark.sql.SparkSession

import graft.operators.VectorBlocks
import graft.sources.Report

/** Brute-force search benchmark at the REFERENCE's own scale — 1M docs ×
  * 384 dims, 100 queries, top-100 (README:63-71; BASELINE.md brute force
  * = 699.43 ms/query, 1.43 QPS) — so the engine's throughput is directly
  * comparable to the published baseline rather than FLOP-extrapolated
  * from the tiny fixture. Vectors are generated deterministically
  * executor-side (LCG per (id, component)); generation/caching is the
  * analog of the reference's precomputed-embeddings load and is NOT part
  * of the timed search, exactly like the reference times only
  * `batch_brute_force_search` (`002:200-228`).
  *
  * Every scale knob lives in [[Cfg]] so the same end-to-end harness runs
  * at 1M×384 from [[Bench]] and at fixture scale from KernelBenchSpec.
  * The run CLOSES the report loop at bench scale (VERDICT r6 next #7):
  * [[writeReports]] emits the reference-shaped per-method reports
  * (`performance` / `recall` / `precision` / `mrr` / `build_latency` /
  * `ef_sensitivity`) through [[Report.buildValues]], and
  * [[Report.compare]] — the same `005-compare_benchmarks.py` pipeline
  * q19 runs on committed fixtures — reads them back for the speedup
  * table.
  */
object KernelBench {

  /** One kernel-bench scale. `sweepProbes` drives the nProbe recall
    * sweep; PQ fields mirror the FAISS IVFPQ shape (`pqSubDim`-dim
    * subspaces, `pqCodebook` trained codewords, ADC top-`pqRescore`
    * exact rescore). */
  final case class Cfg(
      n: Int,
      dim: Int,
      nQueries: Int,
      k: Int,
      centroids: Int,
      nProbe: Int,
      sweepProbes: Seq[Int],
      pqSubDim: Int,
      pqCodebook: Int,
      pqRescore: Int,
      pqTrainSample: Int,
      pqTrainIters: Int,
      coarseTrainSample: Int = 16384,
      coarseTrainIters: Int = 5,
      sqRescore: Int = 64,
      graphK: Int = 8,
      binRescore: Int = 3000,
      binSweepPools: Seq[Int] = Seq(100, 300, 1000, 3000),
      // interleaved timed passes per method (min wins). 3 is the bench
      // discipline; the 4M rung runs 2 so it fits degraded host-days
      // (VERDICT r15 next #4) — min-of-2 at fixed dials loses almost
      // nothing vs min-of-3, absence of the rung loses the slope point
      timedPasses: Int = 3)

  /** The reference's published scale: 1M × 384, 100 queries, top-100.
    * PQ: 384 dims = 96 subspaces × 4 dims, 256 k-means-TRAINED codewords
    * per subspace ([[operators.PqTrain]]) → 96 B/doc (16× compression;
    * subDim 4 buys ~4 quantization levels per dim, which this
    * noise-ranked synthetic corpus needs for recall).
    *
    * `pqRescore` is PER-PARTITION: 64 × 32 partitions ≈ 2k exact-dot
    * rescores per query — 20× k. r7's 500 made the rescore touch most of
    * each partition's float rows in RANDOM order (~2.4 GB/pass, more
    * traffic than the exact scan it is meant to beat); the measured
    * rCand grid at bench scale (tools/PqProbe): 16→0.9894 recall,
    * 32→0.9993, 64→0.9995 (= nProbe-8 IVF's own ceiling) with ms/query
    * 2.5/2.1/2.2 — 64 keeps full recall at ~9× brute-force speed. */
  val Default: Cfg = Cfg(
    n = 1000000,
    dim = 384,
    nQueries = 100,
    k = 100,
    centroids = 64,
    nProbe = 8,
    sweepProbes = Seq(1, 2, 4, 8, 16, 32),
    pqSubDim = 4,
    pqCodebook = 256,
    pqRescore = 64,
    pqTrainSample = 16384,
    pqTrainIters = 10)

  // headline constants quoted in Bench's JSON line
  val N: Int = Default.n
  val Dim: Int = Default.dim
  val NQueries: Int = Default.nQueries
  val K: Int = Default.k
  val Centroids: Int = Default.centroids
  val NProbe: Int = Default.nProbe
  val SweepProbes: Seq[Int] = Default.sweepProbes
  val PqSubDim: Int = Default.pqSubDim
  val PqTrainIters: Int = Default.pqTrainIters

  /** Recall@10 target the binary tier's declared operating point is
    * selected against (tune half) and quoted at (held-out half). */
  val BinOpTarget: Double = 0.95

  // ------------------------------------------------- host-state canary

  // resident corpus for [[canaryMs]]: built once per JVM so repeated
  // calls time COMPUTE against a warm structure, not allocation
  private lazy val canaryCorpus: Array[Float] = {
    val a = new Array[Float](100000 * 384)
    var state = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < a.length) {
      state = state * 6364136223846793005L + 1442695040888963407L
      a(i) = ((state >>> 40).toInt & 0xFFFF) / 65536.0f - 0.5f
      i += 1
    }
    a
  }
  @volatile private var canarySink = 0.0f

  /** Host-state CANARY (VERDICT r13 next #4): a fixed-cost,
    * single-threaded, fully-resident dot-product microkernel — 10
    * queries × 100k docs × 384 dims, min of 3 passes after one untimed
    * JIT warm-up — measured immediately BEFORE each timed bench section
    * and published as that section's `canary_ms`. `bench_seq_today`
    * tells a consumer the host-day was polluted; the canary lets them
    * NORMALIZE from the artifact alone: a section whose canary reads
    * 2× the day's reference canary carries ~that much host-state
    * inflation on its own compute-bound numbers (r13's "4M float 188 ms
    * vs ~53-58 clean" question becomes answerable without memory of
    * clean runs). Deliberately immune to Spark/page-cache state — it
    * isolates the CPU/memory-bandwidth component of host pollution. */
  def canaryMs(): Double = {
    val n = 100000; val dim = 384; val nq = 10
    val c = canaryCorpus
    val q = new Array[Float](nq * dim)
    var state = 0x2545F4914F6CDD1DL
    var i = 0
    while (i < q.length) {
      state = state * 6364136223846793005L + 1442695040888963407L
      q(i) = ((state >>> 40).toInt & 0xFFFF) / 65536.0f - 0.5f
      i += 1
    }
    def pass(): Double = {
      val t0 = System.nanoTime()
      var acc = 0.0f
      var qi = 0
      while (qi < nq) {
        var best = Float.NegativeInfinity
        val qoff = qi * dim
        var d = 0
        while (d < n) {
          var s = 0.0f
          val doff = d * dim
          var j = 0
          while (j < dim) { s += q(qoff + j) * c(doff + j); j += 1 }
          if (s > best) best = s
          d += 1
        }
        acc += best
        qi += 1
      }
      canarySink = acc // defeat dead-code elimination
      (System.nanoTime() - t0) / 1e6
    }
    pass() // untimed warm-up
    math.min(pass(), math.min(pass(), pass()))
  }

  @volatile private var canaryScanSink = 0.0

  /** PARALLEL-SCAN canary: 16 threads each streaming a freshly-allocated
    * resident 96 MB float slab (1.5 GB total — the 1M corpus size),
    * min-of-3 wall times after an untimed warm-up pass. Complements
    * [[canaryMs]]: the documented host-day pollution hits
    * multi-threaded large-array scan THROUGHPUT (the 4M float leg's
    * 53 → 188 ms/query class) while small resident kernels stay clean —
    * a single-threaded canary can read flat across a day whose scan
    * numbers moved 3×. This one exercises the polluted kernels'
    * resource (aggregate bandwidth under thread parallelism, over
    * freshly first-touched pages — the allocation-state component
    * rides along deliberately), so the ratio of a section's
    * canary_scan_ms to a clean-day reference approximates the
    * inflation of that section's scan-bound numbers. The slabs are
    * allocated per call and dropped after it: a persistent 1.5 GB
    * static would permanently shrink the bench JVM's tuned storage
    * budget, which is itself a measured slowdown mode. */
  def canaryScanMs(): Double = {
    val slabs: Array[Array[Float]] = Array.tabulate(16) { t =>
      val a = new Array[Float](24 * 1024 * 1024) // 96 MB
      var state = 0x9E3779B97F4A7C15L ^ (t.toLong << 32)
      var i = 0
      while (i < a.length) {
        state = state * 6364136223846793005L + 1442695040888963407L
        a(i) = ((state >>> 40).toInt & 0xFFFF) / 65536.0f - 0.5f
        i += 1
      }
      a
    }
    def pass(): Double = {
      val t0 = System.nanoTime()
      val acc = new java.util.concurrent.atomic.DoubleAdder
      val threads = slabs.map { slab =>
        val t = new Thread(() => {
          var s = 0.0f
          var i = 0
          while (i < slab.length) { s += slab(i) * slab(i); i += 1 }
          acc.add(s.toDouble)
        })
        t.start(); t
      }
      threads.foreach(_.join())
      canaryScanSink = acc.sum() // defeat dead-code elimination
      (System.nanoTime() - t0) / 1e6
    }
    pass() // untimed warm-up
    math.min(pass(), math.min(pass(), pass()))
  }

  @volatile private var canaryShuffleSink = 0L

  /** SHUFFLE canary (VERDICT r14 next #4): r14 proved BOTH existing
    * canaries blind to the pollution class that moved the graph/PQ
    * builds 2.5-3.3× — multi-GB SHUFFLE-heavy Spark jobs slowed while
    * the resident compute kernel and the parallel scan read clean
    * (graph-slope section stamped canary ratios 1.03/1.01 around a
    * 243 s pass whose clean value is ~40 s). This third canary
    * exercises what a Spark shuffle actually does, at fixed row count
    * with FRESH allocations every call: 8 threads each generate 2M
    * keys (16 MB, fresh), hash-scatter them into 32 fresh bucket
    * arrays (the map-side partition), stream the buckets to a fresh
    * temp file WITHOUT fsync (shuffle writes land in page cache; the
    * writeback stall is part of the signal), read them back, and sort
    * each bucket (the reduce-side merge). Min-of-3 after an untimed
    * warm-up, like the other two. Total per pass: ~130 MB generated,
    * ~130 MB written + read through the page cache, 256 sub-sorts —
    * small enough to run per section, allocation-fresh enough to feel
    * the page-allocation/writeback pressure the resident kernels are
    * immune to. */
  def canaryShuffleMs(): Double = {
    val nThreads = 8
    val rows = 1 << 21 // 2M keys = 16 MB per thread
    val nBuckets = 32
    val cap = (rows / nBuckets) * 2 // hash skew headroom
    def pass(): Double = {
      val t0 = System.nanoTime()
      val acc = new java.util.concurrent.atomic.LongAdder
      // a worker that dies early (e.g. temp-file creation failing on a
      // full /tmp — precisely the degraded-host condition this canary
      // exists to flag) must FAIL the pass, not shorten it: join() on a
      // dead thread returns fine and the timing would read artificially
      // FAST on exactly the sick host it monitors (ADVICE r15)
      val firstFailure =
        new java.util.concurrent.atomic.AtomicReference[Throwable](null)
      val completed = new java.util.concurrent.atomic.AtomicInteger(0)
      val threads = (0 until nThreads).map { t =>
        val th = new Thread(() => try {
          // map side: fresh key array + fresh bucket arrays, hash-scatter
          val keys = new Array[Long](rows)
          var state = 0x9E3779B97F4A7C15L ^ (t.toLong << 17)
          var i = 0
          while (i < rows) {
            state = state * 6364136223846793005L + 1442695040888963407L
            keys(i) = state
            i += 1
          }
          val buckets = Array.fill(nBuckets)(new Array[Long](cap))
          val counts = new Array[Int](nBuckets)
          i = 0
          while (i < rows) {
            val k = keys(i)
            val b = java.lang.Long.hashCode(k * 0xff51afd7ed558ccdL) & (nBuckets - 1)
            val c = counts(b)
            if (c < cap) { buckets(b)(c) = k; counts(b) = c + 1 }
            i += 1
          }
          // spill: stream the buckets through the page cache (no fsync —
          // Spark shuffle writes don't; writeback stalls ARE the signal)
          val f = java.io.File.createTempFile(s"graft_canary_shuffle_$t", ".bin")
          try {
            val ch = new java.io.FileOutputStream(f).getChannel
            try {
              val bb = java.nio.ByteBuffer.allocate(1 << 20)
              var b = 0
              while (b < nBuckets) {
                var j = 0
                val n = counts(b)
                while (j < n) {
                  if (bb.remaining() < 8) { bb.flip(); ch.write(bb); bb.clear() }
                  bb.putLong(buckets(b)(j))
                  j += 1
                }
                b += 1
              }
              bb.flip(); ch.write(bb)
            } finally ch.close()
            // reduce side: read back fresh, sort each bucket region
            val total = counts.sum
            val back = new Array[Long](total)
            val in = new java.io.FileInputStream(f).getChannel
            try {
              val bb = java.nio.ByteBuffer.allocate(1 << 20)
              var off = 0
              var read = in.read(bb)
              while (read > 0) {
                bb.flip()
                while (bb.remaining() >= 8) { back(off) = bb.getLong; off += 1 }
                bb.compact()
                read = in.read(bb)
              }
            } finally in.close()
            var off = 0
            var b = 0
            var chk = 0L
            while (b < nBuckets) {
              java.util.Arrays.sort(back, off, off + counts(b))
              chk ^= back(off) // min of the sorted bucket
              off += counts(b)
              b += 1
            }
            acc.add(chk)
          } finally { f.delete(); () }
          completed.incrementAndGet()
          ()
        } catch {
          case e: Throwable => firstFailure.compareAndSet(null, e); ()
        })
        th.start(); th
      }
      threads.foreach(_.join())
      if (firstFailure.get() != null)
        throw new IllegalStateException(
          "canary shuffle worker failed — pass timing would be invalid", firstFailure.get())
      require(completed.get() == nThreads,
        s"canary shuffle pass incomplete: ${completed.get()}/$nThreads workers finished")
      canaryShuffleSink = acc.sum() // defeat dead-code elimination
      (System.nanoTime() - t0) / 1e6
    }
    pass() // untimed warm-up
    math.min(pass(), math.min(pass(), pass()))
  }

  /** One section's three host-state reference kernels, measured
    * back-to-back: resident compute ([[canaryMs]]), parallel fresh-slab
    * scan ([[canaryScanMs]]), shuffle-shaped scatter/spill/sort
    * ([[canaryShuffleMs]]). Sections measure a triple at START and END
    * of their timed window (r14 proved pollution arrives MID-section:
    * kernel_1m stamped a clean 1.022 start canary around bin passes
    * spreading 5.25 → 116.7 s). */
  final case class CanaryTriple(singleMs: Double, scanMs: Double, shuffleMs: Double)

  def canaryTriple(): CanaryTriple =
    CanaryTriple(canaryMs(), canaryScanMs(), canaryShuffleMs())

  /** Clean-day canary REFERENCE, committed at
    * `fixtures/canary_reference.json` (override the path with
    * `GRAFT_CANARY_REF`; point it at a missing file to disable).
    * Established 2026-08-16 — the first idle host-day after the
    * documented 2026-08-15 pollution — as the min over repeated
    * standalone `tools/Canary` passes before any bench ran. With a
    * committed reference, every section's canary becomes a RATIO a
    * consumer reads directly from the artifact: `canary_ratio` ≈ the
    * host-state inflation on that section's compute-bound numbers,
    * `canary_scan_ratio` on its parallel-scan-bound ones (the 4M-float
    * class). Returns (single_ms, scan_ms, date). */
  lazy val canaryReference: Option[(Double, Double, String)] =
    canaryReferenceFull.map { case (s, sc, _, d) => (s, sc, d) }

  /** `shuffle_ms` from the same committed reference — Option'd
    * separately because the shuffle canary landed a round after the
    * first two (a reference file without it disables only the shuffle
    * ratio, never the other two). */
  lazy val canaryShuffleReference: Option[Double] =
    canaryReferenceFull.flatMap(_._3)

  private lazy val canaryReferenceFull: Option[(Double, Double, Option[Double], String)] = {
    // GRAFT_CANARY_REF, when set, is authoritative (tests disable the
    // reference by pointing it at a missing file). Otherwise try the
    // working directory, then the repo root derived from the class
    // files' location — forked bench legs inherit the sbt cwd, but the
    // class-relative path holds even if a child JVM is started elsewhere
    val candidates: Seq[java.io.File] = sys.env.get("GRAFT_CANARY_REF") match {
      case Some(p) => Seq(new java.io.File(p))
      case None =>
        Seq(Some(new java.io.File("fixtures/canary_reference.json")),
          scala.util.Try {
            val classes = new java.io.File(
              getClass.getProtectionDomain.getCodeSource.getLocation.toURI)
            // target/scala-2.13/classes → repo root
            new java.io.File(
              classes.getParentFile.getParentFile.getParentFile,
              "fixtures/canary_reference.json")
          }.toOption).flatten
    }
    val fOpt = candidates.find(_.isFile)
    if (fOpt.isEmpty) None
    else {
      val f = fOpt.get
      val txt = new String(
        java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      def num(key: String): Option[Double] =
        ("\"" + key + "\"\\s*:\\s*([0-9.]+)").r.findFirstMatchIn(txt).map(_.group(1).toDouble)
      def str(key: String): Option[String] =
        ("\"" + key + "\"\\s*:\\s*\"([^\"]*)\"").r.findFirstMatchIn(txt).map(_.group(1))
      for {
        s <- num("single_ms") if s > 0
        sc <- num("scan_ms") if sc > 0
      } yield (s, sc, num("shuffle_ms").filter(_ > 0), str("date").getOrElse(""))
    }
  }

  /** (canary_ratio, canary_scan_ratio) of a section's measured canaries
    * against the committed clean-day reference; (-1, -1) when no
    * reference is available or the section skipped its canaries. */
  def canaryRatios(singleMs: Double, scanMs: Double): (Double, Double) =
    canaryReference match {
      case Some((s, sc, _)) if singleMs > 0 && scanMs > 0 => (singleMs / s, scanMs / sc)
      case _ => (-1.0, -1.0)
    }

  /** Shuffle canary's ratio against the committed reference; -1 when
    * the reference predates the shuffle canary or the section skipped
    * its canaries. */
  def canaryShuffleRatio(shuffleMs: Double): Double =
    canaryShuffleReference match {
      case Some(ref) if shuffleMs > 0 => shuffleMs / ref
      case _ => -1.0
    }

  /** One section's full canary JSON block (measurements + ratios). */
  def canaryFieldsJson(singleMs: Double, scanMs: Double): String = {
    def f3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val (r1, r2) = canaryRatios(singleMs, scanMs)
    s""""canary_ms":${f3(singleMs)},"canary_scan_ms":${f3(scanMs)},""" +
      s""""canary_ratio":${f3(r1)},"canary_scan_ratio":${f3(r2)}"""
  }

  /** One section's START+END canary bracket (VERDICT r14 next #4): the
    * full triple measured before AND after the timed window, each with
    * its ratio against the committed reference. End fields carry the
    * `canary_end_` prefix so a consumer brackets mid-section pollution
    * arrival (r14: a clean start stamp around bin passes that spread
    * 5.25 → 116.7 s). */
  def canaryBracketJson(start: CanaryTriple, end: CanaryTriple): String =
    canaryStemJson("canary", start) + "," + canaryStemJson("canary_end", end)

  /** One triple's measurements + ratios under a field-name stem. */
  def canaryStemJson(stem: String, t: CanaryTriple): String = {
    def f3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val (r1, r2) = canaryRatios(t.singleMs, t.scanMs)
    val r3 = canaryShuffleRatio(t.shuffleMs)
    s""""${stem}_ms":${f3(t.singleMs)},"${stem}_scan_ms":${f3(t.scanMs)},"${stem}_shuffle_ms":${f3(t.shuffleMs)},""" +
      s""""${stem}_ratio":${f3(r1)},"${stem}_scan_ratio":${f3(r2)},"${stem}_shuffle_ratio":${f3(r3)}"""
  }

  /** Top-level `canary_reference` JSON value: the committed clean-day
    * reference the per-section ratios divide by, or `null` when none is
    * present (ratios then stamp -1). */
  def canaryReferenceJson: String = canaryReferenceFull match {
    case Some((s, sc, sh, d)) =>
      def f3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      val shuffle = sh.map(v => s""","shuffle_ms":${f3(v)}""").getOrElse("")
      s"""{"single_ms":${f3(s)},"scan_ms":${f3(sc)}$shuffle,"date":"$d"}"""
    case None => "null"
  }

  private[graft] def raw(cfg: Cfg, seed: Long): Array[Float] = {
    val a = new Array[Float](cfg.dim)
    var state = seed * 6364136223846793005L + 1442695040888963407L
    var j = 0
    while (j < cfg.dim) {
      state = state * 6364136223846793005L + 1442695040888963407L
      a(j) = ((state >>> 40).toInt.toFloat / (1 << 23).toFloat) - 1.0f
      j += 1
    }
    a
  }

  /** Cluster bases — real embedding corpora are clustered, which is the
    * structure an IVF index exploits; pure-random vectors have none and
    * would make any ANN look uniformly bad. */
  private[graft] def base(cfg: Cfg, c: Int): Array[Float] = raw(cfg, 0x5eed0000L + c)

  /** Doc vector: 70% its cluster's base + 30% noise. */
  private[graft] def vec(cfg: Cfg, id: Long): Array[Float] = {
    val b = base(cfg, (id % cfg.centroids).toInt)
    val n = raw(cfg, id)
    val a = new Array[Float](cfg.dim)
    var j = 0
    while (j < cfg.dim) { a(j) = 0.7f * b(j) + 0.3f * n(j); j += 1 }
    a
  }

  /** Coarse quantizer TRAINED from a strided corpus sample — driver-side
    * Lloyd (argmin-L2 assignment, mean update) over ≤ coarseTrainSample
    * vectors, the FAISS practice of training the IVF quantizer on a
    * sample rather than the full corpus. Deterministic end to end:
    * strided sample ids, strided seed pick, fixed iteration count.
    * Training cost is billed to the index build (it runs inside the
    * timed build window). The sample is bounded config, so the driver
    * work is O(coarseTrainSample · centroids · dim · iters) regardless
    * of corpus size. */
  private[graft] def trainCoarse(cfg: Cfg): Array[Array[Float]] = {
    // with n < centroids the clamp below would make m > n and the sample
    // stride n/m integer-divide to 0 — every sample (and every seed)
    // would be vec(cfg, 0), a silently degenerate quantizer. Fail loudly
    // with the contract named instead (ADVICE r7).
    require(cfg.n >= cfg.centroids,
      s"kernel bench requires n >= centroids (got n=${cfg.n}, centroids=${cfg.centroids})")
    val m = math.max(cfg.centroids, math.min(cfg.coarseTrainSample, cfg.n))
    // ODD stride, wrapped mod n: the corpus generator's cluster id is
    // id % centroids (a power of two), so an even stride samples only
    // gcd(stride, C)-th clusters — at n = 2M the natural stride n/m =
    // 122 saw 32 of 64 modes and recall collapsed to 0.59 (the same
    // degenerate-quantizer class as the seed-pick note below). An odd
    // stride is coprime with any power-of-two cluster count; at the
    // 1M default n/m = 61 is already odd, so this is bit-identical
    // there (no bench churn).
    val stride = math.max(1L, cfg.n.toLong / m) | 1L
    val sample = Array.tabulate(m)(j => vec(cfg, (j.toLong * stride) % cfg.n))
    // seed from CONSECUTIVE sample entries: their corpus ids step by the
    // sample stride, which walks the id space densely — seeding at
    // c·(m/C) instead stepped the corpus id by stride·m/C, and at the
    // default scale that step was ≡ 0 mod the generator's cluster count,
    // putting every seed in ONE mode (measured: recall@8 0.9994 → 0.60)
    val seeds = Array.tabulate(cfg.centroids)(c => sample(c).clone())
    // ONE Lloyd kernel engine-wide: the driver-mode steps here share
    // argminL2 + mean update with the distributed Cluster.lloydStep
    // (VERDICT r7 wrong #5 — two copies risked silent divergence)
    operators.Cluster.lloydLocal(sample, seeds, cfg.coarseTrainIters)
  }

  /** HELD-OUT query vector: pure random, from a seed range disjoint from
    * every corpus id (corpus noise seeds are 0..N-1, bases 0x5eed0000+c)
    * — so no query is a corpus member AND no query carries the corpus's
    * cluster mixture. Round-6 VERDICT item 5: corpus-member queries made
    * IVF/PQ recall pin at 1.0; so does any single-cluster held-out
    * mixture (its whole exact top-100 stays inside its own cluster —
    * nProbe=1 already suffices). An out-of-distribution query has no
    * privileged centroid: its exact top-100 spreads over the few
    * best-affinity clusters, making recall a real, gradual function of
    * nProbe — the reference's ef dial
    * (`notebooks/003-hnswlib_demo.py:408-458`). */
  private[graft] def queryVec(cfg: Cfg, i: Int): Array[Float] = raw(cfg, 0x7e570000000L + i)

  final case class Result(
      bfMsPerQuery: Double,
      bfQps: Double,
      annBuildSec: Double,
      annMsPerQuery: Double,
      annQps: Double,
      annRecallVsExact: Double,
      annRecallByProbe: Seq[(Int, Double)],
      annSweep: Seq[Report.SweepLevel],
      annRecallAtK: Seq[(Int, Double)],
      annPrecisionAtK: Seq[(Int, Double)],
      annMrr: Double,
      pqBuildSec: Double,
      pqMsPerQuery: Double,
      pqQps: Double,
      pqRecallVsExact: Double,
      pqSweep: Seq[Report.SweepLevel],
      pqRecallAtK: Seq[(Int, Double)],
      pqPrecisionAtK: Seq[(Int, Double)],
      pqMrr: Double,
      sqBuildSec: Double,
      sqMsPerQuery: Double,
      sqQps: Double,
      sqRecallVsExact: Double,
      sqSweep: Seq[Report.SweepLevel],
      sqRecallAtK: Seq[(Int, Double)],
      sqPrecisionAtK: Seq[(Int, Double)],
      sqMrr: Double,
      binBuildSec: Double,
      binMsPerQuery: Double,
      binQps: Double,
      binRecallVsExact: Double,
      binSweep: Seq[Report.SweepLevel],
      binOpPool: Int,
      binOpTuneRecall: Double,
      binOpHoldRecall: Double,
      binOpMsPerQuery: Double,
      graphBuildSec: Double,
      // the build window's Spark stage telemetry JSON (VERDICT r15
      // next #3): the leg's dominant cost carries its own
      // work-vs-stall evidence in the artifact
      graphBuildTelemetry: String,
      graphMsPerQuery: Double,
      graphQps: Double,
      graphSweep: Seq[Report.SweepLevel],
      graphRecallAtK: Seq[(Int, Double)],
      graphPrecisionAtK: Seq[(Int, Double)],
      graphMrr: Double,
      // raw per-pass interleaved timings, one entry per round-robin rep
      // (VERDICT r12 next #1: bf/ivf published spreads, sq/pq/bin did
      // not — a consumer could not tell a clean headline from one
      // measured in a polluted window). The published ms_per_query
      // headlines are min(passes ∪ same-dial sweep level); these arrays
      // make that derivation auditable from the artifact alone.
      bfPassSec: Seq[Double],
      annPassSec: Seq[Double],
      sqPassSec: Seq[Double],
      pqPassSec: Seq[Double],
      binPassSec: Seq[Double],
      // MEDIAN ms/query over the SAME same-dial measurement set each
      // min headline is taken over (ADVICE r13 #4: a best-of-min
      // headline is favorable selection across differently-conditioned
      // windows — publish the central tendency beside it so a consumer
      // gets both the host-noise-immune floor and the typical pass,
      // without re-deriving either from pass_sec)
      bfMsPerQueryMedian: Double,
      annMsPerQueryMedian: Double,
      sqMsPerQueryMedian: Double,
      pqMsPerQueryMedian: Double,
      binMsPerQueryMedian: Double)

  /** Report K grids, trimmed to the run's k (the reference's
    * {1,5,10,20,50,100} / {1,5,10}, `utils.py:70-86`). */
  def recallKs(cfg: Cfg): Seq[Int] = Seq(1, 5, 10, 20, 50, 100).filter(_ <= cfg.k)
  def precisionKs(cfg: Cfg): Seq[Int] = Seq(1, 5, 10).filter(_ <= cfg.k)

  /** Per-query doc ids in rank order, from a (query_id, doc_id, rnk)
    * result frame. Bounded collect: nQueries × k rows. */
  private[graft] def ranked(df: org.apache.spark.sql.DataFrame): Map[Long, Array[Long]] =
    df.select("query_id", "doc_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (q, rows) => q -> rows.sortBy(_._3).map(_._2) }

  private def flatHits(r: Map[Long, Array[Long]]): Set[(Long, Long)] =
    r.iterator.flatMap { case (q, ds) => ds.iterator.map(q -> _) }.toSet

  /** Per-query rank-ordered ids from a fused-search result (per-query
    * arrays in query input order) keyed by query id. */
  private def rankedOf(
      queries: Array[(Long, Array[Float])],
      byQ: Array[Array[Long]]): Map[Long, Array[Long]] =
    byQ.iterator.zipWithIndex.map { case (ids, qi) => queries(qi)._1 -> ids }.toMap

  /** Recall@j / precision@j / MRR of `got` against the exact ranking as
    * ground truth: recall@j intersects the two top-j prefixes (the
    * standard ANN recall curve); precision@j and MRR treat the exact
    * top-k as THE relevant set (the qrels analog when ground truth is
    * exact search). */
  private[graft] def rankedMetrics(
      exact: Map[Long, Array[Long]],
      got: Map[Long, Array[Long]],
      ks: Seq[Int],
      pks: Seq[Int]): (Seq[(Int, Double)], Seq[(Int, Double)], Double) = {
    val qids = exact.keys.toArray
    val nQ = qids.length.toDouble
    val rec = ks.map { j =>
      j -> qids.map { q =>
        val e = exact(q).take(j).toSet
        got.getOrElse(q, Array.emptyLongArray).take(j).count(e.contains).toDouble / j
      }.sum / nQ
    }
    val prec = pks.map { j =>
      j -> qids.map { q =>
        val rel = exact(q).toSet
        got.getOrElse(q, Array.emptyLongArray).take(j).count(rel.contains).toDouble / j
      }.sum / nQ
    }
    val mrr = qids.map { q =>
      val rel = exact(q).toSet
      val idx = got.getOrElse(q, Array.emptyLongArray).indexWhere(rel.contains)
      if (idx < 0) 0.0 else 1.0 / (idx + 1)
    }.sum / nQ
    (rec, prec, mrr)
  }

  /** One-hop graph refinement of an IVF result: per query, rescore
    * (seed ids ∪ their graph neighbors) with exact double dots and
    * re-rank top-k. The candidate pool is O(k·(1+graphK)) ids per query
    * — the same bounded magnitude as the search output itself — so the
    * rescore runs driver-side over a caller-supplied vector lookup (the
    * bench passes the deterministic corpus generator; a cluster
    * deployment would gather the ≤ k·(1+g) vectors instead); queries
    * fan out over a parallel IntStream. The bounded-heap
    * (score desc, id asc) contract makes the result independent of
    * candidate iteration order. */
  private[graft] def refine(
      queries: Array[(Long, Array[Float])],
      seedIds: Map[Long, Array[Long]],
      graph: Array[Array[Long]],
      k: Int)(lookup: Long => Array[Float]): Array[Array[Long]] = {
    val out = new Array[Array[Long]](queries.length)
    java.util.stream.IntStream.range(0, queries.length).parallel().forEach { qi =>
      val qv = queries(qi)._2
      val seeds = seedIds.getOrElse(queries(qi)._1, Array.emptyLongArray)
      val cand = new java.util.HashSet[java.lang.Long]()
      seeds.foreach { id =>
        cand.add(id)
        val nb = graph(id.toInt)
        if (nb != null) nb.foreach(n => cand.add(n))
      }
      val heap = new graft.functions.TopKAgg.Heap(k)
      val it = cand.iterator()
      while (it.hasNext) {
        val id = it.next().longValue()
        val dv = lookup(id)
        var s = 0.0
        var i = 0
        while (i < qv.length) { s += qv(i).toDouble * dv(i).toDouble; i += 1 }
        heap.offer(s, id)
      }
      out(qi) = heap.sortedDesc().map(_._2)
    }
    out
  }

  /** Binary leg: residual-sign Hamming top-`r` candidate generation on
    * the packed index, then exact rescore of the bounded candidate pool
    * driver-side via the deterministic corpus generator (the [[refine]]
    * pattern — a cluster deployment would gather the ≤ q·r vectors).
    * With every list probed and r ≥ n this IS exact search (spec gate
    * in KernelBenchSpec). */
  private[graft] def binSearch(
      cfg: Cfg,
      binIndex: org.apache.spark.rdd.RDD[operators.VectorBlocks.BinBlock],
      queries: Array[(Long, Array[Float])],
      probes: Array[Array[Boolean]],
      r: Int,
      k: Int): Array[Array[Long]] = {
    val cand = operators.VectorBlocks.binaryResidualCandidates(
      binIndex, queries, probes, r)
    val out = new Array[Array[Long]](queries.length)
    java.util.stream.IntStream.range(0, queries.length).parallel().forEach { qi =>
      val qv = queries(qi)._2
      val heap = new graft.functions.TopKAgg.Heap(k)
      cand(qi).foreach { id =>
        val dv = vec(cfg, id)
        var s = 0.0
        var i = 0
        while (i < qv.length) { s += qv(i).toDouble * dv(i).toDouble; i += 1 }
        heap.offer(s, id)
      }
      out(qi) = heap.sortedDesc().map(_._2)
    }
    out
  }

  /** Residual-PQ codebook training for a cfg-scale corpus: a
    * deterministic strided driver-side sample of residuals (v − its
    * argmax-dot centroid) feeds [[operators.PqTrain.trainComposite]].
    * Odd stride mod n, like trainCoarse: an even stride would sample
    * residuals from only gcd(stride, C) of the cluster modes (61 at the
    * 1M default is already odd — bit-identical there). Shared by the
    * resident kernel run and the cold-scan leg so both scan the SAME
    * codes. */
  private[graft] def trainPqCodebook(cfg: Cfg, cents: Array[Array[Float]]): Array[Array[Float]] = {
    val pqStride = math.max(1L, cfg.n.toLong / cfg.pqTrainSample) | 1L
    val sample = Array.tabulate(cfg.pqTrainSample) { j =>
      val v = vec(cfg, (j.toLong * pqStride) % cfg.n)
      var bestC = 0
      var bestS = Double.NegativeInfinity
      var c = 0
      while (c < cfg.centroids) {
        val cv = cents(c)
        var s = 0.0
        var i = 0
        while (i < cfg.dim) { s += cv(i).toDouble * v(i).toDouble; i += 1 }
        if (s > bestS) { bestS = s; bestC = c }
        c += 1
      }
      val cv = cents(bestC)
      Array.tabulate(cfg.dim)(i => v(i) - cv(i))
    }
    operators.PqTrain.trainComposite(
      sample, cfg.dim, cfg.pqSubDim, cfg.pqCodebook, cfg.pqTrainIters)
  }

  /** Float-ladder-only result for the largest scale rung. */
  final case class FloatResult(
      bfMsPerQuery: Double,
      annBuildSec: Double,
      annMsPerQuery: Double,
      annRecallVsExact: Double)

  /** Float-ladder-only kernel run: brute force + IVF, NOTHING else
    * built or cached. The 4M×384 all-tiers working set (~15 GB
    * reported) sits past the reliable single-JVM envelope on this host:
    * the compressed-tier builds churn enough allocation against a
    * near-full storage pool that LRU evicts the float blocks mid-bench,
    * and measured 4M slopes swung 1.05↔1.37 (bf) / 1.3↔2.4 (ivf) across
    * heap/fraction configurations while the 2M full ladder stayed
    * stable. Dropping to the two float structures (~12.5 GB reported,
    * shared data arrays underneath) keeps the rung resident, so the
    * published 3-point fit measures SCALING, not eviction noise —
    * the compressed tiers publish their slope at the 2M rung where
    * every tier is reliably resident (STATUS round-10 notes carry the
    * full envelope measurement). Same interleaved min-of-3 pass
    * discipline as [[run]]. */
  def runFloat(spark: SparkSession, cfg: Cfg): FloatResult = {
    import spark.implicits._
    val bcCfg = cfg
    val corpus = spark.range(cfg.n.toLong)
      .map(id => (id, vec(bcCfg, id)))
      .toDF("id", "vec")
      .as[(Long, Array[Float])]
    val blocks = VectorBlocks.pack(corpus, cfg.dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    blocks.count()
    val queries = Array.tabulate(cfg.nQueries)(i => (i.toLong, queryVec(cfg, i)))
    VectorBlocks.bfSearch(blocks, queries.take(2), k = 10, excludeSelf = false)
    val tb = System.nanoTime()
    val cents = trainCoarse(cfg)
    val indexed = VectorBlocks.assign(blocks, cents)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    indexed.count()
    val annBuildSec = (System.nanoTime() - tb) / 1e9
    // residency diagnostic: a partition on the disk tier here means every
    // timed pass below re-reads it from disk — the number being measured
    // would be IO, not the scan kernel
    spark.sparkContext.getRDDStorageInfo.foreach { i =>
      System.err.println(s"[runFloat] rdd=${i.id} parts=${i.numCachedPartitions}/" +
        s"${i.numPartitions} mem=${i.memSize >> 20}MiB disk=${i.diskSize >> 20}MiB")
    }
    val probes = queries.map { case (_, qv) =>
      val scores = Array.tabulate(cfg.centroids) { c =>
        val cv = cents(c)
        var s = 0.0
        var i = 0
        while (i < cfg.dim) { s += cv(i).toDouble * qv(i).toDouble; i += 1 }
        s
      }
      val m = new Array[Boolean](cfg.centroids)
      Array.range(0, cfg.centroids).sortBy(c => -scores(c)).take(cfg.nProbe).foreach(m(_) = true)
      m
    }
    VectorBlocks.ivfFlatSearch(indexed, queries.take(2), probes.take(2), k = 10)
    var exactRanked: Map[Long, Array[Long]] = null
    var annRanked: Map[Long, Array[Long]] = null
    val bfTimes = Array.ofDim[Double](3)
    val annTimes = Array.ofDim[Double](3)
    (0 until 3).foreach { rep =>
      val t0 = System.nanoTime()
      exactRanked = rankedOf(
        queries, VectorBlocks.bfSearch(blocks, queries, cfg.k, excludeSelf = false))
      val t1 = System.nanoTime()
      annRanked = rankedOf(
        queries, VectorBlocks.ivfFlatSearch(indexed, queries, probes, cfg.k))
      val t2 = System.nanoTime()
      bfTimes(rep) = (t1 - t0) / 1e9
      annTimes(rep) = (t2 - t1) / 1e9
    }
    val exact = flatHits(exactRanked)
    val recall = flatHits(annRanked).count(exact.contains).toDouble / exact.size
    blocks.unpersist(blocking = true)
    indexed.unpersist(blocking = true)
    FloatResult(
      bfMsPerQuery = bfTimes.min * 1000.0 / cfg.nQueries,
      annBuildSec = annBuildSec,
      annMsPerQuery = annTimes.min * 1000.0 / cfg.nQueries,
      annRecallVsExact = recall)
  }

  def run(spark: SparkSession): Result = run(spark, Default)

  /** Timed brute-force AND IVF-probed search at reference scale. The
    * corpus lives as [[VectorBlocks.Block]]s in a DESERIALIZED RDD cache:
    * a timed pass touches flat primitive arrays directly — no per-row
    * Tungsten decode, no per-row Array[Float] allocation (which dominated
    * the r2 numbers: ~1.5 GB of decode churn per pass at 1M × 384). */
  def run(spark: SparkSession, cfg: Cfg): Result = {
    import spark.implicits._
    val bcCfg = cfg
    val corpus = spark.range(cfg.n.toLong)
      .map(id => (id, vec(bcCfg, id)))
      .toDF("id", "vec")
      .as[(Long, Array[Float])]
    // MEMORY_AND_DISK like the partition indexes: at the 2M slope scale
    // the two float structures alone are ~6 GB — an evicted MEMORY_ONLY
    // partition would silently re-GENERATE its corpus slice inside a
    // timed pass, and memory pressure inside a task OOMs the whole JVM
    val blocks = VectorBlocks.pack(corpus, cfg.dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    blocks.count() // materialize — the "load embeddings" stage, untimed

    val queries = Array.tabulate(cfg.nQueries)(i => (i.toLong, queryVec(cfg, i)))

    // warm-up: one small search so codegen/broadcast setup is not billed
    VectorBlocks.bfSearch(blocks, queries.take(2), k = 10, excludeSelf = false)

    // IVF build (timed separately, like the reference's index build):
    // the coarse quantizer is TRAINED from a corpus sample (earlier
    // rounds borrowed the synthetic generator's own cluster bases — an
    // oracle quantizer no real corpus provides), then argmax-dot
    // assignment runs block-level — one narrow pass, no shuffle. Built
    // BEFORE PQ: the compressed path composes with these probe lists
    // (IVFPQ), and the PQ residuals are taken against THESE centroids.
    val tb = System.nanoTime()
    val cents = trainCoarse(cfg)
    val indexed = VectorBlocks.assign(blocks, cents)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    indexed.count()
    val annBuildSec = (System.nanoTime() - tb) / 1e9

    // centroid ranking per query (driver-side planning — 100 × 64 dots);
    // each sweep level's probe set is the top-np prefix of this ONE
    // ranking, so levels are nested by construction
    val centRank: Array[Array[Int]] = queries.map { case (_, qv) =>
      val scores = Array.tabulate(cfg.centroids) { c =>
        val cv = cents(c)
        var s = 0.0
        var i = 0
        while (i < cfg.dim) { s += cv(i).toDouble * qv(i).toDouble; i += 1 }
        s
      }
      Array.range(0, cfg.centroids).sortBy(c => -scores(c))
    }
    def masks(np: Int): Array[Array[Boolean]] = centRank.map { r =>
      val m = new Array[Boolean](cfg.centroids)
      r.take(np).foreach(m(_) = true)
      m
    }
    val probes = masks(cfg.nProbe)

    // PQ build (timed like the IVF build): per-subspace k-means training
    // over a deterministic strided sample of RESIDUALS (v − its centroid —
    // the FAISS IVFPQ by_residual layout: within a probed list the
    // centroid term is common, so the codebook's whole resolution goes to
    // the part that actually ranks candidates), then block-level residual
    // encode of the INDEXED corpus (cids ride along for probe pruning);
    // Dim/PqSubDim one-byte codes per doc (96 B at 384-dim, PqSubDim 4).
    val tp = System.nanoTime()
    val codebook = trainPqCodebook(cfg, cents)
    val encoded = VectorBlocks.encodePqResidual(indexed, cents, codebook, cfg.pqSubDim)
    // MEMORY_AND_DISK, not MEMORY_ONLY: an evicted partition of this
    // index would silently RE-ENCODE its corpus slice inside a timed
    // pass (measured 22× on the pq leg when the SQ index joined the
    // cache set) — spilling is bounded, recompute is not
    val pqIndex = VectorBlocks
      .buildPqIndex(indexed, encoded, cfg.centroids, cfg.pqCodebook, cfg.pqSubDim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pqIndex.count()
    val pqBuildSec = (System.nanoTime() - tp) / 1e9

    // SQ8 build (timed like the other index builds): exact per-dim
    // bounds + byte encode + the same cid-bucketed partition index the
    // PQ path uses (dim B/row — the 4× tier of the compression ladder)
    val ts = System.nanoTime()
    val (sqLo, sqHi) = VectorBlocks.trainSqBounds(indexed)
    val sqIndex = VectorBlocks
      .buildPqIndex(indexed, VectorBlocks.encodeSq(indexed, sqLo, sqHi), cfg.centroids, 0, 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sqIndex.count()
    val sqBuildSec = (System.nanoTime() - ts) / 1e9

    // binary (sign-bit) build over RESIDUALS: one narrow pack pass over
    // the ASSIGNED float blocks (cids ride along — the Hamming kernel
    // prunes to probed lists and picks the query's per-list residual
    // pattern). Raw-sign variants measured recall@10 0.13–0.15 at 1M
    // (the sign bits re-encode the cluster base every list member
    // shares); residual signs rank within lists — the same by_residual
    // argument as the PQ encode. 48 B/doc at 384 dims, the 32× rung of
    // the ladder at bench scale (v34 is the registry-scale form).
    val tbin = System.nanoTime()
    val binIndex = VectorBlocks.packBinaryResidual(indexed, cents)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    binIndex.count()
    val binBuildSec = (System.nanoTime() - tbin) / 1e9

    // kNN-graph build (timed like the index builds — the HNSW-graph
    // analog, VERDICT r8 next #3): cross-list ADC top-graphK over the
    // cached float blocks + PQ index, collected to a driver adjacency
    // array (n × graphK longs — 64 MB at 1M×8, the same O(n) scale as
    // the id space). The graph refines each sweep level's IVF candidates
    // by one-hop expansion + exact rescore ([[refine]]). graphK <= 0
    // skips the build (the scale-slope config: the graph's cluster-
    // scoped n²·gp/C cost quadruples at 2× n — out of budget for a
    // slope probe that only compares the four scan ladders); refine
    // over the all-null adjacency degenerates to plain IVF.
    val graph = new Array[Array[Long]](cfg.n)
    val (graphBuildSec, graphBuildTel) =
      BenchTelemetry.measure(spark.sparkContext) {
        val tgb = System.nanoTime()
        if (cfg.graphK > 0)
          VectorBlocks
            .pqKnnGraph(indexed, pqIndex, cents, codebook, cfg.pqSubDim, cfg.graphK, gp = 2)
            .collect()
            .foreach { case (id, nb) => graph(id.toInt) = nb }
        (System.nanoTime() - tgb) / 1e9
      }

    // warm-ups for the probed, fused-IVFSQ and fused-IVFPQ kernels
    // (2 queries each): JIT + broadcast setup, not billed
    VectorBlocks.ivfFlatSearch(indexed, queries.take(2), probes.take(2), k = 10)
    VectorBlocks.ivfsqSearch(
      sqIndex, sqLo, sqHi, queries.take(2), probes.take(2), rCand = 10, k = 10)
    VectorBlocks.ivfpqSearch(
      pqIndex, cents, codebook, cfg.pqSubDim,
      queries.take(2), probes.take(2), rCand = 10, k = 10)
    binSearch(cfg, binIndex, queries.take(2), probes.take(2), r = 10, k = 10)

    // Timed passes, INTERLEAVED round-robin: (bf, ivf, ivfpq) × 3, min
    // per method. Best-of-3 alone is not enough on a shared host — when
    // each method's passes ran in their own window (bf → build → ivf →
    // build → pq, minutes apart), a load spike covering one window
    // inverted the METHOD ORDERINGS the speedup table reports (measured
    // same-code swings: bf 24↔138 ms/query between sessions).
    // Interleaving puts all three methods inside every load window, so
    // contention shifts absolute numbers but preserves the ratios.
    var exactRanked: Map[Long, Array[Long]] = null
    var annRanked: Map[Long, Array[Long]] = null
    var sqTopK: Array[Array[Long]] = null
    var pqTopK: Array[Array[Long]] = null
    var binTopK: Array[Array[Long]] = null
    val nPasses = math.max(1, cfg.timedPasses)
    val bfTimes = Array.ofDim[Double](nPasses)
    val annTimes = Array.ofDim[Double](nPasses)
    val sqTimes = Array.ofDim[Double](nPasses)
    val pqTimes = Array.ofDim[Double](nPasses)
    val binTimes = Array.ofDim[Double](nPasses)
    (0 until nPasses).foreach { rep =>
      val t0 = System.nanoTime()
      exactRanked = rankedOf(
        queries, VectorBlocks.bfSearch(blocks, queries, cfg.k, excludeSelf = false))
      val t1 = System.nanoTime()
      annRanked = rankedOf(
        queries, VectorBlocks.ivfFlatSearch(indexed, queries, probes, cfg.k))
      val t2 = System.nanoTime()
      sqTopK = VectorBlocks.ivfsqSearch(
        sqIndex, sqLo, sqHi, queries, probes, cfg.sqRescore, cfg.k)
      val t3 = System.nanoTime()
      pqTopK = VectorBlocks.ivfpqSearch(
        pqIndex, cents, codebook, cfg.pqSubDim, queries, probes, cfg.pqRescore, cfg.k)
      val t4 = System.nanoTime()
      binTopK = binSearch(cfg, binIndex, queries, probes, cfg.binRescore, cfg.k)
      val t5 = System.nanoTime()
      bfTimes(rep) = (t1 - t0) / 1e9
      annTimes(rep) = (t2 - t1) / 1e9
      sqTimes(rep) = (t3 - t2) / 1e9
      pqTimes(rep) = (t4 - t3) / 1e9
      binTimes(rep) = (t5 - t4) / 1e9
    }
    val bfSec = bfTimes.min
    val annSec = annTimes.min
    val sqSec = sqTimes.min
    val pqSec = pqTimes.min
    val binSec = binTimes.min
    // the raw float cache is only the BF corpus: IVF reads `indexed`, the
    // PQ rescore reads the float refs inside the PQ index — drop the
    // 1.5 GB before the sweeps run
    blocks.unpersist(blocking = true)

    val exact = flatHits(exactRanked)
    require(
      exact.size == cfg.nQueries * cfg.k,
      s"expected ${cfg.nQueries * cfg.k} hits, got ${exact.size}")
    val annRows = flatHits(annRanked)
    val recall = annRows.count(exact.contains).toDouble / exact.size
    val (annRec, annPrec, annMrr) =
      rankedMetrics(exactRanked, annRanked, recallKs(cfg), precisionKs(cfg))

    // nProbe sweep for BOTH ANN methods (the reference emits
    // `ef_sensitivity` for both, `reports/faiss/…json:40-77`): one TIMED
    // fresh search per (level, method) against the same cached indexes —
    // the speed/recall dial at bench scale. Levels interleave ivf/ivfpq
    // for the same windowing reason as the headline passes.
    val r10 = math.min(10, cfg.k)
    val sweepAll = cfg.sweepProbes.map { np =>
      val m = masks(np)
      val t0 = System.nanoTime()
      val lvlRanked = rankedOf(
        queries, VectorBlocks.ivfFlatSearch(indexed, queries, m, cfg.k))
      val annLvlSec = (System.nanoTime() - t0) / 1e9
      // graph-refined leg: one-hop expansion + exact rescore ON TOP of
      // this level's IVF result — its level time bills the IVF search it
      // consumes plus its own refinement
      val tr0 = System.nanoTime()
      val refIds = refine(queries, lvlRanked, graph, cfg.k)(id => vec(cfg, id))
      val refineSec = (System.nanoTime() - tr0) / 1e9
      val graphLvlSec = annLvlSec + refineSec
      val ts0 = System.nanoTime()
      val sqLvlIds = VectorBlocks.ivfsqSearch(
        sqIndex, sqLo, sqHi, queries, m, cfg.sqRescore, cfg.k)
      val sqLvlSec = (System.nanoTime() - ts0) / 1e9
      val t1 = System.nanoTime()
      val lvlIds = VectorBlocks.ivfpqSearch(
        pqIndex, cents, codebook, cfg.pqSubDim, queries, m, cfg.pqRescore, cfg.k)
      val pqLvlSec = (System.nanoTime() - t1) / 1e9
      val lvlFlat = flatHits(lvlRanked)
      val overlapK = lvlFlat.count(exact.contains).toDouble / exact.size
      // keysIterator, not keys: Map.keys is a Set, whose .map would
      // DEDUPLICATE equal per-query fractions before the sum
      val recall10 = exactRanked.keysIterator.map { q =>
        val e = exactRanked(q).take(r10).toSet
        lvlRanked.getOrElse(q, Array.emptyLongArray).take(r10).count(e.contains).toDouble / r10
      }.sum / cfg.nQueries
      def ids10Recall(byQ: Array[Array[Long]]): Double =
        byQ.iterator.zipWithIndex.map { case (ids, qi) =>
          val e = exactRanked(queries(qi)._1).take(r10).toSet
          ids.take(r10).count(e.contains).toDouble / r10
        }.sum / cfg.nQueries
      val sqRecall10 = ids10Recall(sqLvlIds)
      val pqRecall10 = ids10Recall(lvlIds)
      val graphRecall10 = ids10Recall(refIds)
      (np, overlapK,
        Report.SweepLevel(np, recall10, annLvlSec, cfg.nQueries / annLvlSec),
        Report.SweepLevel(np, sqRecall10, sqLvlSec, cfg.nQueries / sqLvlSec),
        Report.SweepLevel(np, pqRecall10, pqLvlSec, cfg.nQueries / pqLvlSec),
        Report.SweepLevel(np, graphRecall10, graphLvlSec, cfg.nQueries / graphLvlSec),
        refIds)
    }
    val recallByProbe = sweepAll.map { case t => t._1 -> t._2 }
    val annSweep = sweepAll.map(_._3)
    val sqSweep = sweepAll.map(_._4)
    val pqSweep = sweepAll.map(_._5)
    val graphSweep = sweepAll.map(_._6)
    // the graph method's headline row reads its nProbe == cfg.nProbe
    // sweep level (every sweep level is a fresh timed pass)
    val headIdx = {
      val i = cfg.sweepProbes.indexOf(cfg.nProbe)
      if (i >= 0) i else cfg.sweepProbes.length - 1
    }
    val graphHeadline = graphSweep(headIdx)
    val graphRanked: Map[Long, Array[Long]] =
      sweepAll(headIdx)._7.iterator.zipWithIndex
        .map { case (ids, qi) => queries(qi)._1 -> ids }.toMap
    val (graphRec, graphPrec, graphMrr) =
      rankedMetrics(exactRanked, graphRanked, recallKs(cfg), precisionKs(cfg))
    // binary rescore-pool sweep: the binary dial is the candidate pool R
    // (Hamming pre-rank quality is fixed; recall is bought with exact
    // rescore depth) — one timed fresh pass per level
    val binSweepFull = cfg.binSweepPools.map { r =>
      val t0 = System.nanoTime()
      val ids = binSearch(cfg, binIndex, queries, probes, r, cfg.k)
      val lvlSec = (System.nanoTime() - t0) / 1e9
      val r10 = math.min(10, cfg.k)
      val perQ = Array.tabulate(cfg.nQueries) { qi =>
        val e = exactRanked(queries(qi)._1).take(r10).toSet
        ids(qi).take(r10).count(e.contains).toDouble / r10
      }
      val rc = perQ.sum / cfg.nQueries
      (Report.SweepLevel(r, rc, lvlSec, cfg.nQueries / lvlSec), perQ)
    }
    val binSweep = binSweepFull.map(_._1)
    // DECLARED OPERATING POINT (VERDICT r9 wrong #2 / next #5): the
    // published bin_recall_vs_exact scalar was the low-dial setting
    // while the usable point hid inside the sweep. Select the pool the
    // v36 way — the smallest rescore pool whose recall@10 on the TUNE
    // half (even query indices) meets [[BinOpTarget]], falling back to
    // the widest — then QUOTE it with recall measured on the HELD-OUT
    // half (odd indices), so the headline number is an out-of-sample
    // claim at a named dial, not the sweep's best cell.
    val (binOpLvl, binOpHold, binOpTune) = {
      def half(perQ: Array[Double], rem: Int): Double = {
        val idx = perQ.indices.filter(_ % 2 == rem)
        if (idx.isEmpty) 0.0 else idx.map(perQ(_)).sum / idx.size
      }
      val scored = binSweepFull.map { case (lvl, perQ) => (lvl, half(perQ, 0), half(perQ, 1)) }
      scored.find(_._2 >= BinOpTarget)
        .getOrElse(scored.last) match { case (lvl, tune, hold) => (lvl, hold, tune) }
    }
    // OP-POINT LATENCY joins the min contract (VERDICT r13 wrong #1: the
    // op point's ms_per_query was the ONE published timing scalar left
    // as a single unprotected pass — r13 quoted 206.6 ms from a polluted
    // sweep window while the same-dial headline, min-protected, read
    // 34.4 in the same artifact). When the selected pool IS the headline
    // dial (the default: BinOpTarget selection lands on Cfg.binRescore
    // by construction at the published scale), the op point quotes the
    // headline's min(interleaved passes ∪ sweep) directly. Off-dial, one
    // extra fresh timed pass at the selected pool runs HERE (indexes
    // still resident), so every published latency scalar is a min over
    // ≥2 independently-windowed same-dial measurements — no single load
    // spike can enter the artifact as a number again.
    val binOpExtraSec =
      if (binOpLvl.ef == cfg.binRescore) Double.MaxValue
      else {
        val t0 = System.nanoTime()
        binSearch(cfg, binIndex, queries, probes, binOpLvl.ef, cfg.k)
        (System.nanoTime() - t0) / 1e9
      }
    // the GRAPH headline had the same exposure: its sweep level was its
    // ONLY measurement. One extra fresh same-dial pass here (indexes
    // still resident), min'd at the headline site below.
    val graphExtraSec =
      if (cfg.graphK <= 0) Double.MaxValue
      else {
        val hd = cfg.sweepProbes(headIdx)
        val m = masks(hd)
        val t0 = System.nanoTime()
        val seeds = rankedOf(
          queries, VectorBlocks.ivfFlatSearch(indexed, queries, m, cfg.k))
        refine(queries, seeds, graph, cfg.k)(id => vec(cfg, id))
        (System.nanoTime() - t0) / 1e9
      }
    // BLOCKING drops (unpersist() is async by default): the next bench
    // section materializes its own multi-GB blocks immediately — against
    // a MemoryStore this section still occupies, persist would shunt the
    // new partitions to the disk tier for good (MEMORY_AND_DISK never
    // promotes back), which measured as a stable ~3.6x slowdown on the
    // in-bench 4M float leg vs the identical standalone run
    binIndex.unpersist(blocking = true)
    sqIndex.unpersist(blocking = true)
    pqIndex.unpersist(blocking = true)
    indexed.unpersist(blocking = true)
    // the fused searches return ids sorted by exact score desc — position
    // is rank
    val pqRanked: Map[Long, Array[Long]] =
      pqTopK.iterator.zipWithIndex.map { case (ids, qi) => queries(qi)._1 -> ids }.toMap
    val pqRows = flatHits(pqRanked)
    val pqRecall = pqRows.count(exact.contains).toDouble / exact.size
    val (pqRec, pqPrec, pqMrr) =
      rankedMetrics(exactRanked, pqRanked, recallKs(cfg), precisionKs(cfg))
    val sqRanked: Map[Long, Array[Long]] =
      sqTopK.iterator.zipWithIndex.map { case (ids, qi) => queries(qi)._1 -> ids }.toMap
    val sqRows = flatHits(sqRanked)
    val sqRecall = sqRows.count(exact.contains).toDouble / exact.size
    val (sqRec, sqPrec, sqMrr) =
      rankedMetrics(exactRanked, sqRanked, recallKs(cfg), precisionKs(cfg))

    val binRanked: Map[Long, Array[Long]] =
      binTopK.iterator.zipWithIndex.map { case (ids, qi) => queries(qi)._1 -> ids }.toMap
    val binRecall = flatHits(binRanked).count(exact.contains).toDouble / exact.size

    // HEADLINE = min over the interleaved passes AND the same-dial sweep
    // level (VERDICT r12 wrong #1): every sweep level is a fresh timed
    // pass of the IDENTICAL search (same masks, same dial, deterministic
    // kernels — same results, so the recall pairing is unchanged), run
    // in a later window. When a load spike covers the interleaved
    // passes, the sweep self-heals the headline instead of publishing a
    // 9×-wrong number with no flag (r12's bin 107.6 vs same-run 12.3).
    // bf has no sweep; its per-pass spread is published instead.
    // exact-dial find, never an index fallback: if the headline nProbe is
    // not among the sweep levels there is no same-dial measurement to
    // min with — mixing in a DIFFERENT dial's time would pair one dial's
    // recall with another's latency
    def dialMin(raw: Double, sweep: Seq[Report.SweepLevel], dial: Int): Double =
      sweep.find(_.ef == dial).map(l => math.min(raw, l.searchTimeSec)).getOrElse(raw)
    // MEDIAN over the identical same-dial sample set (ADVICE r13 #4):
    // published beside the min so the artifact carries both statistics
    def dialMedian(raw: Seq[Double], sweep: Seq[Report.SweepLevel], dial: Int): Double = {
      val xs = (raw ++ sweep.find(_.ef == dial).map(_.searchTimeSec)).sorted
      val n = xs.length
      if (n % 2 == 1) xs(n / 2) else (xs(n / 2 - 1) + xs(n / 2)) / 2
    }
    val annSecH = dialMin(annSec, annSweep, cfg.nProbe)
    val sqSecH = dialMin(sqSec, sqSweep, cfg.nProbe)
    val pqSecH = dialMin(pqSec, pqSweep, cfg.nProbe)
    val binSecH = dialMin(binSec, binSweep, cfg.binRescore)
    // EVERY published latency scalar sits under the min contract now
    // (VERDICT r13 wrong #1 / next #1): the op point min's its sweep
    // pass with the interleaved same-dial passes when its pool IS the
    // headline dial, else with its own extra pass; the graph headline
    // min's its sweep level with its extra same-dial pass.
    val binOpSec =
      if (binOpLvl.ef == cfg.binRescore) math.min(binOpLvl.searchTimeSec, binSecH)
      else math.min(binOpLvl.searchTimeSec, binOpExtraSec)
    val graphSecH = math.min(graphHeadline.searchTimeSec, graphExtraSec)

    Result(
      bfMsPerQuery = bfSec * 1000.0 / cfg.nQueries,
      bfQps = cfg.nQueries / bfSec,
      annBuildSec = annBuildSec,
      annMsPerQuery = annSecH * 1000.0 / cfg.nQueries,
      annQps = cfg.nQueries / annSecH,
      annRecallVsExact = recall,
      annRecallByProbe = recallByProbe,
      annSweep = annSweep,
      annRecallAtK = annRec,
      annPrecisionAtK = annPrec,
      annMrr = annMrr,
      pqBuildSec = pqBuildSec,
      pqMsPerQuery = pqSecH * 1000.0 / cfg.nQueries,
      pqQps = cfg.nQueries / pqSecH,
      pqRecallVsExact = pqRecall,
      pqSweep = pqSweep,
      pqRecallAtK = pqRec,
      pqPrecisionAtK = pqPrec,
      pqMrr = pqMrr,
      sqBuildSec = sqBuildSec,
      sqMsPerQuery = sqSecH * 1000.0 / cfg.nQueries,
      sqQps = cfg.nQueries / sqSecH,
      sqRecallVsExact = sqRecall,
      sqSweep = sqSweep,
      sqRecallAtK = sqRec,
      sqPrecisionAtK = sqPrec,
      sqMrr = sqMrr,
      binBuildSec = binBuildSec,
      binMsPerQuery = binSecH * 1000.0 / cfg.nQueries,
      binQps = cfg.nQueries / binSecH,
      binRecallVsExact = binRecall,
      binSweep = binSweep,
      binOpPool = binOpLvl.ef,
      binOpTuneRecall = binOpTune,
      binOpHoldRecall = binOpHold,
      binOpMsPerQuery = binOpSec * 1000.0 / cfg.nQueries,
      graphBuildSec = graphBuildSec,
      graphBuildTelemetry = graphBuildTel,
      graphMsPerQuery = graphSecH * 1000.0 / cfg.nQueries,
      graphQps = cfg.nQueries / graphSecH,
      graphSweep = graphSweep,
      graphRecallAtK = graphRec,
      graphPrecisionAtK = graphPrec,
      graphMrr = graphMrr,
      bfPassSec = bfTimes.toSeq,
      annPassSec = annTimes.toSeq,
      sqPassSec = sqTimes.toSeq,
      pqPassSec = pqTimes.toSeq,
      binPassSec = binTimes.toSeq,
      bfMsPerQueryMedian =
        dialMedian(bfTimes.toSeq, Nil, 0) * 1000.0 / cfg.nQueries,
      annMsPerQueryMedian =
        dialMedian(annTimes.toSeq, annSweep, cfg.nProbe) * 1000.0 / cfg.nQueries,
      sqMsPerQueryMedian =
        dialMedian(sqTimes.toSeq, sqSweep, cfg.nProbe) * 1000.0 / cfg.nQueries,
      pqMsPerQueryMedian =
        dialMedian(pqTimes.toSeq, pqSweep, cfg.nProbe) * 1000.0 / cfg.nQueries,
      binMsPerQueryMedian =
        dialMedian(binTimes.toSeq, binSweep, cfg.binRescore) * 1000.0 / cfg.nQueries)
  }

  /** Close the report loop at bench scale: write one reference-shaped
    * report per method (`brute_force` / `ivf` / `ivfpq`) under
    * `dir/<method>/`, exactly the tree [[Report.compare]] — and the
    * reference's `005-compare_benchmarks.py` — consumes. Ground truth for
    * recall / precision / MRR is the exact search itself, so the
    * brute_force row scores 1.0 by definition (stated, not measured);
    * the IVF and IVFPQ reports each carry `build_latency` and their own
    * timed nProbe sweep as `ef_sensitivity` — the reference publishes the
    * sweep for BOTH ANN methods (`reports/hnswlib/…json:7-10,40-77`,
    * `reports/faiss/…json:40-77`; VERDICT r7 next #7). */
  def writeReports(
      spark: SparkSession,
      cfg: Cfg,
      r: Result,
      dir: String,
      timestamp: String): String = {
    // the report contract is keyed on recall@10: Report.compare reads
    // `recall.10` and the sweep rows are labeled `recall@10` — a k < 10
    // run would emit a report the comparison cannot resolve (and mislabel
    // the sweep), so refuse it here rather than fail downstream
    require(cfg.k >= 10, s"report loop requires k >= 10 (recall@10 contract), got k=${cfg.k}")
    val ks = recallKs(cfg)
    val pks = precisionKs(cfg)
    Report.write(
      Report.buildValues(
        spark, "brute_force",
        ks.map(_ -> 1.0), pks.map(_ -> 1.0), mrr = 1.0, nQueries = cfg.nQueries.toLong,
        avgLatencyMs = r.bfMsPerQuery, qps = r.bfQps, timestamp = timestamp),
      s"$dir/brute_force")
    Report.write(
      Report.buildValues(
        spark, "ivf",
        r.annRecallAtK, r.annPrecisionAtK, r.annMrr, cfg.nQueries.toLong,
        avgLatencyMs = r.annMsPerQuery, qps = r.annQps, timestamp = timestamp,
        buildLatency = Some((r.annBuildSec, cfg.n / r.annBuildSec)),
        efSensitivity = r.annSweep),
      s"$dir/ivf")
    Report.write(
      Report.buildValues(
        spark, "ivfsq",
        r.sqRecallAtK, r.sqPrecisionAtK, r.sqMrr, cfg.nQueries.toLong,
        avgLatencyMs = r.sqMsPerQuery, qps = r.sqQps, timestamp = timestamp,
        buildLatency = Some((r.sqBuildSec, cfg.n / r.sqBuildSec)),
        efSensitivity = r.sqSweep),
      s"$dir/ivfsq")
    Report.write(
      Report.buildValues(
        spark, "ivfpq",
        r.pqRecallAtK, r.pqPrecisionAtK, r.pqMrr, cfg.nQueries.toLong,
        avgLatencyMs = r.pqMsPerQuery, qps = r.pqQps, timestamp = timestamp,
        buildLatency = Some((r.pqBuildSec, cfg.n / r.pqBuildSec)),
        efSensitivity = r.pqSweep),
      s"$dir/ivfpq")
    // graph-refined method: its build window is the graph construction
    // alone (the PQ index it reads is billed to ivfpq, exactly as the
    // reference bills hnswlib's graph on top of the stored vectors)
    Report.write(
      Report.buildValues(
        spark, "ivf_graph",
        r.graphRecallAtK, r.graphPrecisionAtK, r.graphMrr, cfg.nQueries.toLong,
        avgLatencyMs = r.graphMsPerQuery, qps = r.graphQps, timestamp = timestamp,
        buildLatency = Some((r.graphBuildSec, cfg.n / r.graphBuildSec)),
        efSensitivity = r.graphSweep),
      s"$dir/ivf_graph")
    // the reference's text-summary sink closes the report loop
    // (`005:430-520` → BENCHMARK_SUMMARY.txt)
    Report.writeSummary(
      spark, s"$dir/*/", dir,
      meta = Seq(
        "Corpus size" -> s"${cfg.n} documents",
        "Queries" -> s"${cfg.nQueries} test queries",
        "Embedding dimension" -> cfg.dim.toString))
    dir
  }
}
