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
    val spark = GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      Some(sys.env.getOrElse("SPARK_GRAFT_MEM_FRACTION", "0.75")))
    val json = args(0) match {
      case "float4m" => BenchLegs.float4m(spark)
      case "full2m" => BenchLegs.full2m(spark)
      case "graphslope" => BenchLegs.graphSlope(spark)
      case other => throw new IllegalArgumentException(s"unknown leg: $other")
    }
    spark.stop()
    val tagged =
      if (json.startsWith("{")) """{"forked":true,""" + json.drop(1) else json
    println("BENCHFORK_JSON " + tagged)
  }
}
