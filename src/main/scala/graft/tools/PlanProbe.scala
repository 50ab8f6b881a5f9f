package graft.tools

import java.nio.file.{Files, Paths}

/** Builder-side measurement probe for the optimization rounds (guide §1):
  * times every registry query exactly the way the bench does
  * (`fn(spark, sfDir).count()`, one pass, sorted by name) and dumps each
  * query's `.explain("formatted")` physical plan to `<plansDir>/<name>_<tag>.txt`
  * so plan-shape claims (Exchange count, join strategy, PushedFilters)
  * are auditable without running Spark.
  *
  * Usage: runMain graft.tools.PlanProbe <sfDir> <plansDir> <tag> [nameFilter]
  * Never invoked by the driver; pure diagnostics.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val plansDir = if (args.length > 1) args(1) else "plans/r16"
    val tag = if (args.length > 2) args(2) else "before"
    val nameFilter: Option[Seq[String]] =
      if (args.length > 3) Some(args(3).split(",").toSeq) else None
    Files.createDirectories(Paths.get(plansDir))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(cpus)
    spark.range(1000000L).selectExpr("sum(id)").collect() // JIT/scheduler warm-up
    graft.BenchLegs.warmIoPaths(spark) // mirror the bench leg's warm-up
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => nameFilter.forall(_.exists(n.contains)) }
    // optional in-JVM stack sampler (GRAFT_PROBE_SAMPLE=1): counts the
    // top frames of executor task threads every 20 ms — a poor man's
    // profiler for "where is the task CPU going" without external tools
    val sampling = sys.env.get("GRAFT_PROBE_SAMPLE").contains("1")
    val frameCounts = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.LongAdder]()
    if (sampling) {
      val t = new Thread(() => {
        while (true) {
          val all = Thread.getAllStackTraces
          all.forEach { (th, stack) =>
            if (th.getName.startsWith("Executor task launch") && stack.nonEmpty) {
              // first frame inside spark/graft/catalyst code, else top
              val f = stack.iterator
                .find(e => { val c = e.getClassName
                  !c.startsWith("java.") && !c.startsWith("jdk.") && !c.startsWith("sun.") })
                .getOrElse(stack(0))
              val key = f.getClassName + "." + f.getMethodName
              frameCounts.computeIfAbsent(key, _ => new java.util.concurrent.atomic.LongAdder).increment()
            }
          }
          Thread.sleep(20)
        }
      }, "probe-sampler")
      t.setDaemon(true)
      t.start()
    }
    val times = qs.map { case (name, fn) =>
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      var fnSec = -1.0
      val (n, tel) = graft.BenchTelemetry.measure(spark.sparkContext) {
        try {
          val df = fn(spark, sfDir)
          fnSec = (System.nanoTime() - t0) / 1e9
          df.count()
        }
        catch { case e: Throwable => System.err.println(s"[probe] $name FAILED: ${e.getMessage}"); -1L }
      }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(s"[probe] $name ${f3(sec)}s fn=${f3(fnSec)}s $tel")
      // plan capture AFTER the timed pass so explain's own job-free
      // analysis cost is never billed to the measurement
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(plansDir, s"${name}_$tag.txt"), plan)
      } catch { case e: Throwable =>
        System.err.println(s"[probe] $name explain failed: ${e.getMessage}")
      }
      name -> (sec, n)
    }
    spark.sparkContext.setJobDescription(null)
    if (sampling) {
      import scala.jdk.CollectionConverters._
      val top = frameCounts.asScala.toSeq.map { case (k, v) => k -> v.sum() }
        .sortBy(-_._2).take(40)
      System.err.println("[probe] top sampled task frames:")
      top.foreach { case (k, v) => System.err.println(f"  $v%6d  $k") }
    }
    val js = times.map { case (k, (s, n)) =>
      s""""$k":{"sec":${f3(s)},"rows":$n}"""
    }.mkString("{", ",", "}")
    val total = times.map(_._2._1).sum
    println(s"""PLANPROBE_JSON {"total":${f3(total)},"queries":$js}""")
    val ranked = times.sortBy(-_._2._1).take(30)
      .map { case (k, (s, _)) => f"$k%-34s ${s}%8.3f" }.mkString("\n")
    System.err.println(s"[probe] slowest:\n$ranked")
    spark.stop()
  }

  private def f3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
}
