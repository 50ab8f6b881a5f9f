package graft

import graft.sources.Report

/** End-to-end golden regression (SURVEY §5.2): the full search+evaluate
  * pipeline of §3.2 — corpus scan → kernel top-k → hit join → Recall /
  * Precision / MRR → nested report — must reproduce the committed golden
  * report byte-for-byte on the values (timing fields pinned to 0), the
  * same pattern the reference uses with its committed benchmark JSONs. */
class GoldenSpec extends SparkSpec {

  test("search+evaluate pipeline reproduces the committed golden report (sf0.001)") {
    val report = Report.build(
      spark,
      "brute_force_golden",
      SparkEntry.queries("v04_recall")(spark, sf0001),
      SparkEntry.queries("v05_precision")(spark, sf0001),
      SparkEntry.queries("v06_mrr")(spark, sf0001),
      ks = graft.operators.VectorSearch.RecallKs,
      pks = graft.operators.VectorSearch.PrecisionKs,
      avgLatencyMs = 0.0, qps = 0.0, timestamp = "golden")

    val got = report.collect().head
    val want = spark.read.option("multiLine", "true")
      .json("/root/repo/fixtures/golden/report_sf0.001.json")
      .collect().head

    assert(got.getAs[String]("method") == want.getAs[String]("method"))
    val gPerf = got.getAs[org.apache.spark.sql.Row]("performance")
    val wPerf = want.getAs[org.apache.spark.sql.Row]("performance")
    assert(gPerf.getAs[Long]("total_queries") == wPerf.getAs[Long]("total_queries"))
    val gRecall = got.getAs[Map[String, Double]]("recall")
    val wRecall = want.getAs[org.apache.spark.sql.Row]("recall") // json reads map as struct
    for (k <- graft.operators.VectorSearch.RecallKs.map(_.toString))
      assert(gRecall(k) == wRecall.getAs[Double](k), s"recall@$k")
    val gPrec = got.getAs[Map[String, Double]]("precision")
    val wPrec = want.getAs[org.apache.spark.sql.Row]("precision")
    for (k <- graft.operators.VectorSearch.PrecisionKs.map(_.toString))
      assert(gPrec(k) == wPrec.getAs[Double](k), s"precision@$k")
    assert(got.getAs[Double]("mrr") == want.getAs[Double]("mrr"))
  }
}
