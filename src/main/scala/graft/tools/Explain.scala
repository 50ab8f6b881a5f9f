// Plan-audit harness: prints formatted physical plans for headline
// queries so pushdown/broadcast/codegen can be eyeballed and asserted.
// Run: sbt "runMain graft.tools.Explain [queryName ...]"
package graft.tools

import graft.{GraftSession, SparkEntry}

object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq("q02_filter_revenue", "q03_segment_revenue")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
