package graft

import java.nio.file.{Files, Paths}

import graft.sources.Report

/** Golden-text pin for the BENCHMARK_SUMMARY.txt sink (VERDICT r8 next
  * #7 — the last reference surface with no engine analog,
  * `005-compare_benchmarks.py:430-520`): fixed report values → the
  * committed summary text, byte for byte. */
class SummarySpec extends SparkSpec {

  test("summary sink reproduces the committed golden text") {
    val dir = Files.createTempDirectory("graft_summary").toString
    Report.write(
      Report.buildValues(
        spark, "brute_force",
        Seq(1 -> 1.0, 5 -> 1.0, 10 -> 1.0), Seq(1 -> 1.0, 5 -> 1.0, 10 -> 1.0),
        mrr = 1.0, nQueries = 100, avgLatencyMs = 100.0, qps = 10.0,
        timestamp = "19700101000000"),
      s"$dir/brute_force")
    Report.write(
      Report.buildValues(
        spark, "ivf",
        Seq(1 -> 0.99, 5 -> 0.992, 10 -> 0.995), Seq(1 -> 0.99, 5 -> 0.99, 10 -> 0.99),
        mrr = 0.98, nQueries = 100, avgLatencyMs = 10.0, qps = 100.0,
        timestamp = "19700101000000",
        buildLatency = Some((120.0, 1000000 / 120.0))),
      s"$dir/ivf")
    Report.write(
      Report.buildValues(
        spark, "ivfpq",
        Seq(1 -> 0.96, 5 -> 0.965, 10 -> 0.97), Seq(1 -> 0.96, 5 -> 0.96, 10 -> 0.96),
        mrr = 0.95, nQueries = 100, avgLatencyMs = 2.5, qps = 400.0,
        timestamp = "19700101000000",
        buildLatency = Some((30.0, 1000000 / 30.0))),
      s"$dir/ivfpq")

    val meta = Seq(
      "Corpus size" -> "1000000 documents",
      "Queries" -> "100 test queries",
      "Embedding dimension" -> "384")
    val path = Report.writeSummary(spark, s"$dir/*/", dir, meta)
    val got = Files.readString(Paths.get(path))
    val goldenPath = Paths.get("fixtures/golden/benchmark_summary_golden.txt")
    if (sys.env.contains("GRAFT_REGEN_GOLDEN")) {
      Files.writeString(goldenPath, got)
    }
    val want = Files.readString(goldenPath)
    assert(got == want,
      s"summary text diverged from golden:\n--- got ---\n$got\n--- want ---\n$want")
  }
}
