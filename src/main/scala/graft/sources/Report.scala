package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** K3: the nested metrics-report sink/scan pair (reference
  * `utils.py:113-135` — timestamped `{method}_{ts}.json` with nested
  * performance / recall / precision / mrr / metadata), re-expressed as a
  * single-row nested DataFrame written with the JSON sink. The read side
  * is the same multiLine scan [[FileFormats]] q19 uses, so a report the
  * engine writes feeds the engine's own benchmark comparison.
  */
object Report {

  /** One sweep level of the speed/recall dial: probe width (the engine's
    * `ef` analog is nProbe), recall@10 at that width, wall seconds for
    * the level's search pass, and the implied QPS — the row shape of the
    * reference's `ef_sensitivity` array
    * (`reports/hnswlib/hnswlib_20251002_184417.json:40-77`). */
  final case class SweepLevel(ef: Int, recall10: Double, searchTimeSec: Double, qps: Double)

  /** Assemble the reference-shaped report row from already-computed metric
    * frames (each single-row): recall (recall_<k>… columns), precision
    * (precision_<k>…), mrr (mrr). Latency fields come from the harness.
    * Optional sections mirror the reference report: `build_latency`
    * (total_seconds + vectors_per_second, `…json:7-10`) and
    * `ef_sensitivity` (the timed sweep, `…json:40-77`). */
  def build(
      spark: SparkSession,
      method: String,
      recall: DataFrame,
      precision: DataFrame,
      mrrDf: DataFrame,
      ks: Seq[Int],
      pks: Seq[Int],
      avgLatencyMs: Double,
      qps: Double,
      timestamp: String,
      buildLatency: Option[(Double, Double)] = None,
      efSensitivity: Seq[SweepLevel] = Nil): DataFrame = {
    val r = recall.collect().head
    val p = precision.collect().head
    val m = mrrDf.collect().head
    buildValues(
      spark,
      method,
      ks.map(k => k -> r.getAs[Double](s"recall_$k")),
      pks.map(k => k -> p.getAs[Double](s"precision_$k")),
      m.getAs[Double]("mrr"),
      r.getAs[Long]("n_queries"),
      avgLatencyMs,
      qps,
      timestamp,
      buildLatency,
      efSensitivity)
  }

  /** Same report row from plain driver-side values — the entry point for
    * callers whose metrics never lived in a DataFrame (the 1M-scale
    * [[graft.KernelBench]] computes recall-vs-exact from collected ranked
    * hits). */
  def buildValues(
      spark: SparkSession,
      method: String,
      recallAtK: Seq[(Int, Double)],
      precisionAtK: Seq[(Int, Double)],
      mrr: Double,
      nQueries: Long,
      avgLatencyMs: Double,
      qps: Double,
      timestamp: String,
      buildLatency: Option[(Double, Double)] = None,
      efSensitivity: Seq[SweepLevel] = Nil): DataFrame = {
    val recallPairs = recallAtK.flatMap { case (k, v) => Seq(lit(k.toString), lit(v)) }
    val precisionPairs = precisionAtK.flatMap { case (k, v) => Seq(lit(k.toString), lit(v)) }
    val base = Seq(
      lit(method).as("method"),
      struct(
        lit(avgLatencyMs).as("avg_latency_ms"),
        lit(qps).as("qps"),
        lit(nQueries).as("total_queries")).as("performance"),
      map(recallPairs: _*).as("recall"),
      map(precisionPairs: _*).as("precision"),
      lit(mrr).as("mrr"),
      struct(lit(timestamp).as("timestamp")).as("metadata"))
    val withBuild = buildLatency.fold(base) { case (totalSec, vecPerSec) =>
      base :+ struct(
        lit(totalSec).as("total_seconds"),
        lit(vecPerSec).as("vectors_per_second")).as("build_latency")
    }
    val cols =
      if (efSensitivity.isEmpty) withBuild
      else withBuild :+ array(efSensitivity.map(l =>
        struct(
          lit(l.ef).as("ef"),
          lit(l.recall10).as("recall@10"),
          lit(l.searchTimeSec).as("search_time"),
          lit(l.qps).as("qps"))): _*).as("ef_sensitivity")
    spark.range(1).select(cols: _*)
  }

  /** The `005-compare_benchmarks.py` pipeline (reference `005:62,106-117,
    * 469-487`) over any per-method report tree: multiLine scan of
    * `glob` (one subdirectory per method), method derived from the
    * report file's PARENT directory name, latest report per method by
    * embedded timestamp, schema-variant normalization (`performance` vs
    * `search_latency_cpu`), then speedup vs the brute_force row. Shared
    * by q19 (committed fixture reports) and the kernel-bench loop
    * (reports the engine wrote itself at 1M scale). */
  def compare(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val raw = spark.read
      .option("multiLine", "true")
      // the report tree may carry the BENCHMARK_SUMMARY.txt sibling the
      // reference writes next to its method dirs — scan reports only
      .option("pathGlobFilter", "*.json")
      .json(glob)
      .withColumn("method_dir", regexp_extract(input_file_name(), "/([^/]+)/[^/]*$", 1))
    val w = Window.partitionBy($"method_dir").orderBy($"metadata.timestamp".desc)
    // the reference's 005:106-117 resolves THREE latency layouts —
    // `performance` (brute-force format), `search_latency` (the real
    // hnswlib/faiss reports under /root/reference/reports), and
    // `search_latency_cpu` (FAISS CPU/GPU format) — and two field
    // spellings (engine reports say avg_latency_ms/qps; the reference's
    // brute-force row says avg_query_time_ms/queries_per_second). Each
    // candidate is guarded by presence in the scanned tree's inferred
    // schema, so any mix of generations resolves without nulling out
    // (ADVICE r7: a pure `search_latency` tree previously resolved to
    // null latency and silently emitted null speedups).
    val sections = Seq("performance", "search_latency", "search_latency_cpu")
      .filter(raw.schema.fieldNames.contains)
    val sectionFields: Map[String, Set[String]] = sections.map { sec =>
      sec -> (raw.schema(sec).dataType match {
        case st: org.apache.spark.sql.types.StructType => st.fieldNames.toSet
        case _ => Set.empty[String]
      })
    }.toMap
    def norm(spellings: Seq[String]) = {
      val cands = for {
        sec <- sections; f <- spellings; if sectionFields(sec).contains(f)
      } yield col(s"$sec.$f")
      require(cands.nonEmpty,
        s"no latency section in report tree $glob (looked for $sections × $spellings)")
      coalesce(cands: _*)
    }
    val latest = raw
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select(
        $"method",
        norm(Seq("avg_latency_ms", "avg_query_time_ms")).as("avg_latency_ms"),
        norm(Seq("qps", "queries_per_second")).as("qps"),
        $"recall.10".as("recall_10"),
        $"mrr")
    val bf = latest.filter($"method" === "brute_force")
      .select($"avg_latency_ms".as("bf_latency"))
    latest
      .crossJoin(broadcast(bf))
      .select(
        $"method", $"avg_latency_ms", $"qps", $"recall_10", $"mrr",
        round($"bf_latency" / $"avg_latency_ms", 4).as("speedup_vs_bf"))
      .orderBy($"method")
  }

  /** Write one pretty-ish JSON report file under `dir/<method>_<ts>.json`
    * via the JSON sink (single row → coalesce(1); the part file is then
    * placed at the reference's flat-file location). */
  def write(report: DataFrame, dir: String): String = {
    import report.sparkSession.implicits._
    val row = report.select(to_json(struct(report.columns.toIndexedSeq.map(col): _*)).as("js"))
      .as[String].collect().head
    val method = report.select("method").as[String].collect().head
    val ts = report.select($"metadata.timestamp").as[String].collect().head
      .replaceAll("[^0-9]", "")
    val path = java.nio.file.Paths.get(dir, s"${method}_$ts.json")
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.writeString(path, row + "\n")
    path.toString
  }

  /** The reference's BENCHMARK_SUMMARY.txt sink (`005-compare_benchmarks
    * .py:430-520`, section headings per `utils.py:138-190`): the text
    * rendering of the [[compare]] frame plus each report's
    * `build_latency`, with the reference's speedup analysis and key
    * findings. A driver-side string template over O(methods) rows —
    * deterministic for fixed inputs, pinned by the golden spec. `meta`
    * fills the DATASET block (corpus size / queries / dim). */
  def summaryText(
      spark: SparkSession, glob: String,
      meta: Seq[(String, String)] = Nil): String = {
    import spark.implicits._
    def f(pat: String, v: Double): String =
      String.format(java.util.Locale.ROOT, pat, Double.box(v))
    val rows = compare(spark, glob).collect()
    // build seconds per method, latest report per method (schema-guarded:
    // a tree where no report carries build_latency still summarizes)
    val raw = spark.read.option("multiLine", "true")
      .option("pathGlobFilter", "*.json").json(glob)
    val buildSec: Map[String, Double] =
      if (!raw.schema.fieldNames.contains("build_latency")) Map.empty
      else {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"method").orderBy($"metadata.timestamp".desc)
        raw.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
          .select($"method", $"build_latency.total_seconds")
          .collect()
          .flatMap(r => Option(r.get(1)).map(v => r.getString(0) -> r.getDouble(1)))
          .toMap
      }
    val bar = "=" * 80
    val sb = new StringBuilder
    sb.append(bar).append('\n')
    sb.append("VECTOR SEARCH BENCHMARK COMPARISON").append('\n')
    sb.append(bar).append("\n\n")
    if (meta.nonEmpty) {
      sb.append("DATASET:\n")
      meta.foreach { case (k, v) => sb.append(s"  $k: $v\n") }
      sb.append('\n')
    }
    sb.append("METHODS COMPARED:\n\n")
    rows.zipWithIndex.foreach { case (r, i) =>
      val m = r.getAs[String]("method")
      sb.append(s"${i + 1}. ${m.toUpperCase(java.util.Locale.ROOT)}\n")
      sb.append(s"   Search latency: ${f("%.2f", r.getAs[Double]("avg_latency_ms"))} ms/query\n")
      sb.append(s"   Throughput: ${f("%.1f", r.getAs[Double]("qps"))} QPS\n")
      sb.append(s"   Recall@10: ${f("%.4f", r.getAs[Double]("recall_10"))}\n")
      sb.append(s"   MRR: ${f("%.4f", r.getAs[Double]("mrr"))}\n")
      buildSec.get(m).filter(_ > 0).foreach { sec =>
        sb.append(s"   Build time: ${f("%.1f", sec / 60)} minutes\n")
      }
      sb.append('\n')
    }
    sb.append("SPEEDUP ANALYSIS:\n\n")
    val bfRecall = rows.find(_.getAs[String]("method") == "brute_force")
      .map(_.getAs[Double]("recall_10"))
    rows.filter(_.getAs[String]("method") != "brute_force").foreach { r =>
      sb.append(s"${r.getAs[String]("method")}:\n")
      sb.append(s"  ${f("%.1f", r.getAs[Double]("speedup_vs_bf"))}x faster than brute force\n")
      bfRecall.filter(_ > 0).foreach { bf =>
        sb.append(s"  Recall: ${f("%.1f", r.getAs[Double]("recall_10") / bf * 100)}% of brute force quality\n")
      }
      sb.append('\n')
    }
    sb.append("KEY FINDINGS:\n\n")
    def best(col2: String, by: Row => Double, max: Boolean, render: Row => String): Unit = {
      val r = if (max) rows.maxBy(by) else rows.minBy(by)
      sb.append(s" $col2: ${r.getAs[String]("method")} (${render(r)})\n")
    }
    best("Fastest search", _.getAs[Double]("avg_latency_ms"), max = false,
      r => s"${f("%.2f", r.getAs[Double]("avg_latency_ms"))} ms/query")
    best("Best recall", _.getAs[Double]("recall_10"), max = true,
      r => f("%.4f", r.getAs[Double]("recall_10")))
    best("Highest throughput", _.getAs[Double]("qps"), max = true,
      r => s"${f("%.0f", r.getAs[Double]("qps"))} QPS")
    sb.append('\n').append(bar).append('\n')
    sb.toString
  }

  /** Render [[summaryText]] and place it at `dir/BENCHMARK_SUMMARY.txt`
    * — the reference's output location relative to its report tree. */
  def writeSummary(
      spark: SparkSession, glob: String, dir: String,
      meta: Seq[(String, String)] = Nil): String = {
    val path = java.nio.file.Paths.get(dir, "BENCHMARK_SUMMARY.txt")
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.writeString(path, summaryText(spark, glob, meta))
    path.toString
  }
}
