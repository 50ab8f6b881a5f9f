package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Analytics, Ann, Autotune, Bucketing, Cluster, Compact, Fingerprint, FullText, Multimodal, Pq, Relational, Sampling, Sq, Temporal, TextPipeline, VectorSearch}
import graft.sources.{FileFormats, ReportLoop}
import graft.streaming.Streams

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All registered operator modules; each Q carries its Spark impl and
    * (when SQL-expressible) its DuckDB oracle. */
  def modules: Seq[QModule] =
    Seq(Relational, VectorSearch, Ann, Pq, Sq, Compact, Autotune, TextPipeline, Sampling, Multimodal, FileFormats, ReportLoop, Streams, Analytics, Temporal, Bucketing, Fingerprint, Cluster, FullText)

  private lazy val registry: Seq[Q] = modules.flatMap(_.all)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * End-to-end search + evaluate (SURVEY §3.2): brute-force top-10 over
    * the embeddings table, label ground truth, Recall@{1,5,10}. */
  def entry(spark: SparkSession): DataFrame =
    registry.find(_.name == "v04_recall").get.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
