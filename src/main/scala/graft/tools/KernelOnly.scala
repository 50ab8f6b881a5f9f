package graft.tools

import graft.{GraftSession, KernelBench}

/** Runs ONLY the 1M×384 kernel benchmark (no registry suite) — the quick
  * feedback loop for kernel work; `graft.Bench` remains the driver's
  * full harness. */
object KernelOnly {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val r = KernelBench.run(spark)
    println(f"HEADLINE bf=${r.bfMsPerQuery}%.2f ms/q  ivf=${r.annMsPerQuery}%.2f ms/q (${r.bfMsPerQuery / r.annMsPerQuery}%.2fx, recall=${r.annRecallVsExact}%.4f)  ivfpq=${r.pqMsPerQuery}%.2f ms/q (${r.bfMsPerQuery / r.pqMsPerQuery}%.2fx, recall=${r.pqRecallVsExact}%.4f)  builds: ivf=${r.annBuildSec}%.1fs pq=${r.pqBuildSec}%.1fs")
    println(s"RESULT $r")
    spark.stop()
  }
}
