package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    val nQ = r.getAs[Long]("n_queries")
    val recallPairs = ks.flatMap(k => Seq(lit(k.toString), lit(r.getAs[Double](s"recall_$k"))))
    val precisionPairs = pks.flatMap(k => Seq(lit(k.toString), lit(p.getAs[Double](s"precision_$k"))))
    val base = Seq(
      lit(method).as("method"),
      struct(
        lit(avgLatencyMs).as("avg_latency_ms"),
        lit(qps).as("qps"),
        lit(nQ).as("total_queries")).as("performance"),
      map(recallPairs: _*).as("recall"),
      map(precisionPairs: _*).as("precision"),
      lit(m.getAs[Double]("mrr")).as("mrr"),
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

  /** Write one pretty-ish JSON report file under `dir/<method>_<ts>.json`
    * via the JSON sink (single row → coalesce(1); the part file is then
    * placed at the reference's flat-file location). */
  def write(report: DataFrame, dir: String): String = {
    import report.sparkSession.implicits._
    val row = report.select(to_json(struct(report.columns.map(col): _*)).as("js"))
      .as[String].collect().head
    val method = report.select("method").as[String].collect().head
    val ts = report.select($"metadata.timestamp").as[String].collect().head
      .replaceAll("[^0-9]", "")
    val path = java.nio.file.Paths.get(dir, s"${method}_$ts.json")
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.writeString(path, row + "\n")
    path.toString
  }
}
