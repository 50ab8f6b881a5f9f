package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Stage-split timing for q79's PPJoin (bench-truth tooling): times each
  * pipeline stage in isolation so a regression can be attributed to a
  * stage, not guessed. Run: `sbt "runMain graft.tools.PpjoinProbe"`. */
object PpjoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import spark.implicits._
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time[T](what: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROBE $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val tau = 0.5
    val sh = time("shingleFrameCached")(graft.operators.TextPipeline.shingleProbeFrame(spark, d))
    time("shingle count")(sh.count())
    val tok = sh.select($"doc_id", explode($"s").as("tok"))
      .select($"doc_id", graft.operators.TextPipeline.shingleHashProbe($"tok").as("th"))
      .distinct()
    time("tok distinct")(tok.count())
    val dfFrame = tok.groupBy($"th").agg(count(lit(1)).as("df"))
    time("df agg")(dfFrame.count())
    val nH = tok.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"df", $"th")
    val pref = tok.join(dfFrame, Seq("th"))
      .withColumn("pos", row_number().over(w))
      .join(broadcast(nH), Seq("doc_id"))
      .filter($"pos" <= $"n" - ceil(lit(tau) * $"n") + 1)
      .filter($"df" >= 2)
      .select($"doc_id", $"th")
    time("prefix (join+window)")(pref.count())
    val cand = pref.select($"doc_id".as("doc_a"), $"th")
      .join(pref.select($"doc_id".as("doc_b"), $"th"), Seq("th"))
      .filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b")
      .distinct()
    time("candidates")(cand.count())
    val verified = cand
      .join(sh.select($"doc_id".as("doc_a"), $"s".as("sa")), Seq("doc_a"))
      .join(sh.select($"doc_id".as("doc_b"), $"s".as("sb")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect($"sa", $"sb")))
      .withColumn("jaccard_raw",
        $"inter".cast("double") / (size($"sa") + size($"sb") - $"inter"))
      .filter($"jaccard_raw" >= tau)
    time("verify")(verified.count())
    time("full q79")(graft.operators.TextPipeline.ppjoinPairs(spark, d, tau).count())
    time("full q79 again")(graft.operators.TextPipeline.ppjoinPairs(spark, d, tau).count())
    spark.stop()
  }
}
