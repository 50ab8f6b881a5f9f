package graft.tools

import graft.{BenchLegs, GraftSession}

/** Fresh-JVM runner for one bench scale leg (VERDICT r11 next #2):
  * [[graft.Bench]] launches this as a subprocess per big-float rung so
  * the published 2M/4M numbers come from an UNAGED heap (the measured
  * session-age scan decay — STATUS r10 #8 — polluted two rounds of
  * published scale points). Prints exactly one `BENCHFORK_JSON {...}`
  * line on stdout; everything else (Spark logs, residency diagnostics)
  * goes to stderr, which the parent inherits.
  *
  * Also runnable by hand for isolated probes:
  * `sbt "runMain graft.tools.BenchFork float4m|full2m|graphslope"`.
  */
object BenchFork {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchFork float4m|full2m|graphslope")
    // A fresh JVM is not a fresh HOST: the parent bench's multi-GB legs
    // leave the OS page cache full and writeback dirty, and that state
    // survives process exits — measured on the graph slope leg, whose
    // now-small timed windows (4-40 s) picked up a ~25 s/pass floor
    // in-bench (and even across back-to-back standalone runs: 1M 42 →
    // 82 s) that drop_caches fully removes. Start every forked leg
    // from a cold page cache and publish whether the drop worked.
    val dropped = graft.operators.ColdScan.dropPageCache()
    if (!dropped)
      System.err.println("[benchfork] page-cache drop failed (not root?) — leg runs warm")
    // default must MATCH Bench's ("4"): with the env unset, a fork
    // failure would otherwise silently swap a 32-core measurement for
    // the parent's 4-core in-session fallback in the same JSON field
    val spark = GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"),
      Some(sys.env.getOrElse("SPARK_GRAFT_MEM_FRACTION", "0.75")))
    // argv(1), when present, is the wall allowance (seconds) the parent
    // granted this fork — budget-aware legs size optional work to it
    val wallBudgetS = args.lift(1).flatMap(_.toDoubleOption)
    val json = args(0) match {
      case "float4m" => BenchLegs.float4m(spark)
      case "full2m" => BenchLegs.full2m(spark)
      case "graphslope" => BenchLegs.graphSlope(spark, wallBudgetS)
      case "registry" => BenchLegs.registry(spark,
        sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
      case "kernel1m" => BenchLegs.kernel1m(spark)
      case "coldscan" => BenchLegs.coldScan(spark)
      case other => throw new IllegalArgumentException(s"unknown leg: $other")
    }
    spark.stop()
    val tagged =
      if (json.startsWith("{"))
        s"""{"forked":true,"page_cache_dropped":$dropped,""" + json.drop(1)
      else json
    println("BENCHFORK_JSON " + tagged)
  }
}
