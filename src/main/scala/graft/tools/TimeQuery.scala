package graft.tools

import graft.{GraftSession, SparkEntry}

/** Times one registry query by name (twice — cold then memo-warm) at
  * SPARK_GRAFT_SF_DIR. Quick profiling aid for single-query work. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warm-up
    args.foreach { name =>
      for (pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val n = df.count()
        println(f"TIME $name pass $pass: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        if (sys.env.contains("GRAFT_TIME_EXPLAIN")) {
          val p = df.queryExecution.executedPlan.toString
          println(s"PLAN pass $pass InMemoryTableScan=${p.contains("InMemoryTableScan")}\n" +
            p.linesIterator.take(12).mkString("\n"))
        }
      }
    }
    spark.stop()
  }
}
