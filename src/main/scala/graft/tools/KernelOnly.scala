package graft.tools

import graft.{GraftSession, KernelBench}

/** Runs ONLY the 1M×384 kernel benchmark (no registry suite) — the quick
  * feedback loop for kernel work; `graft.Bench` remains the driver's
  * full harness. */
object KernelOnly {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val r = KernelBench.run(spark)
    println(s"RESULT $r")
    spark.stop()
  }
}
