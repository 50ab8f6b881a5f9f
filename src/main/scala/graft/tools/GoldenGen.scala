package graft.tools

import graft.{GraftSession, SparkEntry}
import graft.operators.VectorSearch
import graft.sources.Report

/** Regenerates the committed golden report fixture
  * (`fixtures/golden/report_sf0.001.json`) from the live pipeline —
  * run after an INTENTIONAL metric-semantics change (e.g. widening the
  * retrieval frame), never to paper over a regression. GoldenSpec then
  * pins the new values. */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("8")
    val d = "/root/testdata/sf0.001"
    val report = Report.build(
      spark,
      "brute_force_golden",
      SparkEntry.queries("v04_recall")(spark, d),
      SparkEntry.queries("v05_precision")(spark, d),
      SparkEntry.queries("v06_mrr")(spark, d),
      ks = VectorSearch.RecallKs,
      pks = VectorSearch.PrecisionKs,
      avgLatencyMs = 0.0,
      qps = 0.0,
      timestamp = "golden")
    import org.apache.spark.sql.functions.{col, struct, to_json}
    import spark.implicits._
    val js = report
      .select(to_json(struct(report.columns.toIndexedSeq.map(col): _*)).as("js"))
      .as[String].collect().head
    val path = java.nio.file.Paths.get("/root/repo/fixtures/golden/report_sf0.001.json")
    java.nio.file.Files.writeString(path, js + "\n")
    println(s"wrote $path")
    spark.stop()
  }
}
