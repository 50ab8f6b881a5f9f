package graft

import java.nio.file.Files

import graft.operators.Metrics
import graft.sources.Report

/** K3 report sink round trip: build the nested report from metric frames,
  * write it, read it back with the multiLine JSON scan, and check every
  * field survives. */
class ReportSpec extends SparkSpec {

  test("nested metrics report write → read round trip") {
    import spark.implicits._
    val hits = Seq(
      (1L, 1L, 1, 2L), (1L, 2L, 0, 2L),
      (2L, 1L, 0, 1L), (2L, 2L, 1, 1L)).toDF("query_id", "rnk", "hit", "n_rel")
    val report = Report.build(
      spark, "unit_test",
      Metrics.recallAtK(hits, Seq(1, 2)),
      Metrics.precisionAtK(hits, Seq(1, 2)),
      Metrics.mrr(hits),
      ks = Seq(1, 2), pks = Seq(1, 2),
      avgLatencyMs = 12.5, qps = 80.0, timestamp = "2026-08-12T00:00:00",
      buildLatency = Some((512.75, 1950.23)),
      efSensitivity = Seq(
        Report.SweepLevel(1, 0.5, 0.010, 200.0),
        Report.SweepLevel(4, 0.75, 0.025, 80.0)))

    val dir = Files.createTempDirectory("graft_report").toString
    val path = Report.write(report, dir)
    assert(path.endsWith("unit_test_20260812000000.json"))

    val back = spark.read.option("multiLine", "true").json(path)
    val r = back.collect().head
    assert(r.getAs[String]("method") == "unit_test")
    val perf = r.getAs[org.apache.spark.sql.Row]("performance")
    assert(perf.getAs[Double]("avg_latency_ms") == 12.5)
    assert(perf.getAs[Long]("total_queries") == 2L)
    // schema inference reads the JSON map as a struct keyed "1"/"2"
    val recall = r.getAs[org.apache.spark.sql.Row]("recall")
    // q1: hit@1 of 2 rel → 0.5@1, 0.5@2; q2: hit@2 → 0@1, 1.0@2
    assert(recall.getAs[Double]("1") == 0.25 && recall.getAs[Double]("2") == 0.75)
    assert(r.getAs[Double]("mrr") == 0.75) // (1.0 + 0.5) / 2
    // optional sections survive the round trip in the reference shape
    val bl = r.getAs[org.apache.spark.sql.Row]("build_latency")
    assert(bl.getAs[Double]("total_seconds") == 512.75)
    assert(bl.getAs[Double]("vectors_per_second") == 1950.23)
    val ef = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("ef_sensitivity")
    assert(ef.map(_.getAs[Long]("ef")) == Seq(1L, 4L))
    assert(ef.map(_.getAs[Double]("recall@10")) == Seq(0.5, 0.75))
    assert(ef.map(_.getAs[Double]("qps")) == Seq(200.0, 80.0))
  }

  test("compare resolves the reference's search_latency report layout (005:106-117)") {
    // a tree mixing the brute-force `performance` layout (with the
    // reference's avg_query_time_ms/queries_per_second spellings) and
    // the hnswlib/faiss `search_latency` layout — the generation
    // ADVICE r7 flagged as silently resolving to null speedups
    val dir = Files.createTempDirectory("graft_ref_reports")
    def put(method: String, body: String): Unit = {
      val d = dir.resolve(method)
      Files.createDirectories(d)
      Files.writeString(d.resolve(s"${method}_20251002.json"), body)
    }
    put("brute_force",
      """{"method":"brute_force",
          "performance":{"avg_query_time_ms":700.0,"queries_per_second":1.43},
          "recall":{"10":1.0},"mrr":1.0,
          "metadata":{"timestamp":"2025-10-02T13:27:38"}}""")
    put("hnswlib",
      """{"method":"hnswlib",
          "search_latency":{"total_seconds":0.046,"queries_per_second":2165.7,"avg_latency_ms":0.46},
          "build_latency":{"total_seconds":512.8},
          "recall":{"10":0.918},"mrr":0.93,
          "metadata":{"timestamp":"2025-10-02T18:44:17"}}""")
    val rows = Report.compare(spark, s"$dir/*/*.json").collect()
      .map(r => r.getAs[String]("method") ->
        (r.getAs[Double]("avg_latency_ms"), r.getAs[Double]("qps"), r.getAs[Double]("speedup_vs_bf")))
      .toMap
    assert(rows("brute_force") == ((700.0, 1.43, 1.0)))
    assert(rows("hnswlib")._1 == 0.46 && rows("hnswlib")._2 == 2165.7)
    assert(rows("hnswlib")._3 == 1521.7391) // round(700 / 0.46, 4)
  }
}
