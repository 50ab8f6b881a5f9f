package graft.tools

import graft.{GraftSession, KernelBench}

/** Scale-slope probe (VERDICT r8 next #8): run the kernel bench at 2× the
  * reference scale (2M × 384) and print the per-method ms/query next to a
  * same-session 1M run, so the ladder's scaling slope is measured on one
  * host under one load profile. A slope ≈ n-linear for bf and ≈ sub-linear
  * for the probed methods (fixed probe fraction, candidate-bounded
  * rescore) is the 100 TB design claim this verifies at the largest scale
  * the 12 g driver heap can hold.
  *
  * The 2M config trims `sweepProbes` to the default probe level only —
  * the slope needs the headline passes, not 6 sweep levels × 4 methods of
  * extra timed searches.
  *
  * Run: sbt "runMain graft.tools.ScaleProbe" [n2]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n2 = if (args.nonEmpty) args(0).toInt else 2000000
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    // mimic mode: the bench's section sequence in miniature — full 1M
    // kernel first, then the float-only rung — to bisect why the
    // in-bench 4M leg is ~3.7x the standalone one
    if (args.length > 1 && args(1) == "mimic") {
      val r1 = KernelBench.run(spark, KernelBench.Default.copy(
        sweepProbes = Seq(KernelBench.Default.nProbe), graphK = 0))
      println(f"SCALE mimic-1m bf=${r1.bfMsPerQuery}%.2f ivf=${r1.annMsPerQuery}%.2f")
      spark.catalog.clearCache()
      val c = KernelBench.Default.copy(
        n = n2, sweepProbes = Seq(KernelBench.Default.nProbe), graphK = 0)
      val r = KernelBench.runFloat(spark, c)
      println(f"SCALE mimic-float n=$n2 bf=${r.bfMsPerQuery}%.2f ivf=${r.annMsPerQuery}%.2f " +
        f"(recall=${r.annRecallVsExact}%.4f) build=${r.annBuildSec}%.1fs")
      spark.stop()
      return
    }

    // float-only mode (`… ScaleProbe <n2> float`): the 4M rung's
    // published configuration — bf + IVF, no compressed-tier builds
    if (args.length > 1 && args(1) == "float") {
      Seq(1000000, n2).foreach { n =>
        val c = KernelBench.Default.copy(
          n = n, sweepProbes = Seq(KernelBench.Default.nProbe), graphK = 0)
        val r = KernelBench.runFloat(spark, c)
        println(f"SCALE float n=$n bf=${r.bfMsPerQuery}%.2f ivf=${r.annMsPerQuery}%.2f " +
          f"(recall=${r.annRecallVsExact}%.4f) build=${r.annBuildSec}%.1fs")
        spark.catalog.clearCache()
      }
      spark.stop()
      return
    }

    def line(tag: String, n: Int, r: KernelBench.Result): String =
      f"SCALE $tag n=$n bf=${r.bfMsPerQuery}%.2f ivf=${r.annMsPerQuery}%.2f (recall=${r.annRecallVsExact}%.4f) " +
        f"sq=${r.sqMsPerQuery}%.2f pq=${r.pqMsPerQuery}%.2f " +
        f"builds: ivf=${r.annBuildSec}%.1fs sq=${r.sqBuildSec}%.1fs pq=${r.pqBuildSec}%.1fs"

    // one sweep level + no kNN graph: the slope wants the four scan
    // ladders, not 6 sweep levels or the graph's n²-scaled build
    val c1 = KernelBench.Default.copy(
      sweepProbes = Seq(KernelBench.Default.nProbe), graphK = 0)
    val r1 = KernelBench.run(spark, c1)
    println(line("1m", c1.n, r1))
    spark.catalog.clearCache()

    val c2 = c1.copy(n = n2)
    val r2 = KernelBench.run(spark, c2)
    println(line("2m", c2.n, r2))

    val s = n2.toDouble / c1.n
    def slope(a: Double, b: Double): Double = math.log(b / a) / math.log(s)
    println(f"SCALE slope(log-log, $s%.1fx) bf=${slope(r1.bfMsPerQuery, r2.bfMsPerQuery)}%.2f " +
      f"ivf=${slope(r1.annMsPerQuery, r2.annMsPerQuery)}%.2f sq=${slope(r1.sqMsPerQuery, r2.sqMsPerQuery)}%.2f " +
      f"pq=${slope(r1.pqMsPerQuery, r2.pqMsPerQuery)}%.2f")
    spark.stop()
  }
}
