package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Stage-by-stage timing probe for the q62 language-ID pipeline — the
  * quick feedback loop for its cost structure (the registry query is the
  * composition; this isolates trigram extraction, the count aggregate,
  * and the profile/score stages). */
object LangIdProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables(spark, d, "documents").select(col("doc_id"), col("lang"), col("text"))

    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $what ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    time("warm")(spark.range(100000L).selectExpr("sum(id)").collect())

    val t = col("__t")
    val codes = when(length(t) >= 3,
      transform(sequence(lit(1), length(t) - 2), i =>
        ascii(t.substr(i, lit(1))) * 65536L +
          ascii(t.substr(i + 1, lit(1))) * 256L +
          ascii(t.substr(i + 2, lit(1)))))
      .otherwise(array().cast("array<long>"))

    val exploded = docs.withColumn("__t", lower(col("text")))
      .select(col("doc_id"), col("lang"), explode(codes).as("h"))
    time("explode only")(println("  rows " + exploded.count()))

    val counts = exploded.groupBy(col("doc_id"), col("lang"), col("h"))
      .agg(count(lit(1)).as("cnt"))
    time("counts agg")(println("  rows " + counts.count()))

    val cached = counts.cache()
    time("counts cache")(println("  rows " + cached.count()))

    val docProf = cached
      .groupBy(col("doc_id"), col("lang"))
      .agg(graft.functions.TopKAgg.collectTopK(
        col("cnt").cast("double"), col("h"), 40).as("topk"))
    time("doc profile")(println("  rows " + docProf.count()))

    time("full q62")(
      println("  rows " + graft.SparkEntry.queries("q62_langid_ngram")(spark, d).count()))
    spark.stop()
  }
}
