package graft.tools

/** Standalone host-state canary probe — prints the two reference
  * kernels every bench section publishes (`canary_ms`,
  * `canary_scan_ms`), three times each, without building a
  * SparkSession. The bench-truth workflow: run this before/after a
  * timed probe to know what host state the probe saw, and against a
  * bench artifact's stamped values to judge its sections.
  *
  * `sbt "runMain graft.tools.Canary"` (or plain java with the classes
  * dir plus the Spark jars on the classpath).
  */
object Canary {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 3
    (1 to n).foreach { i =>
      val single = graft.KernelBench.canaryMs()
      val scan = graft.KernelBench.canaryScanMs()
      val shuffle = graft.KernelBench.canaryShuffleMs()
      println(f"canary pass $i: single=$single%.1f ms scan=$scan%.1f ms shuffle=$shuffle%.1f ms")
    }
  }
}
