package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-quality metrics over a "hit frame" (SURVEY A1–A3 + A9,
  * mirroring `notebooks/utils.py:15-110`).
  *
  * Hit-frame contract: one row per (query, retrieved doc) with columns
  *   query_id  — any orderable type
  *   rnk       — LONG, 1-based position in the retrieved list (W1)
  *   hit       — INT 0/1, whether the doc is relevant (J6; note the
  *               reference counts ANY judged doc as relevant, including
  *               grade 0 — `002:313`)
  *   n_rel     — LONG, the query's total relevant-doc count
  * Queries with no relevant docs must already be absent (the reference
  * skips them — `utils.py:37-38`; [[VectorSearch]] enforces this with an
  * inner join against the per-query relevant counts).
  *
  * All three are two-level aggregations (A9): per-query score first, then
  * an UNWEIGHTED mean over queries — never a flat average, so queries with
  * many qrels can't dominate (`utils.py:46`).
  */
object Metrics {

  private def aggAll(df: DataFrame, groupCols: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(groupCols: _*).agg(aggs.head, aggs.tail: _*)

  private def aggFlat(df: DataFrame, aggs: Seq[Column]): DataFrame =
    df.agg(aggs.head, aggs.tail: _*)

  private def hitsAtK(k: Int): Column =
    sum(when(col("hit") === 1 && col("rnk") <= k, 1).otherwise(0)).as(s"h$k")

  /** Recall@K for each K: per query |top-K ∩ relevant| / n_rel, then mean.
    * Output: 1 row — recall_<k>… (rounded 4dp), n_queries. */
  def recallAtK(hits: DataFrame, ks: Seq[Int]): DataFrame = {
    val perQ = aggAll(hits, Seq(col("query_id"), col("n_rel")), ks.map(hitsAtK))
    aggFlat(
      perQ,
      ks.map(k => round(avg(col(s"h$k").cast("double") / col("n_rel")), 4).as(s"recall_$k")) :+
        count(lit(1)).as("n_queries"))
  }

  /** Precision@K: per query |top-K ∩ relevant| / (ACTUAL retrieved ≤ K) —
    * the denominator is what was really retrieved, not K
    * (`utils.py:77-79`). Output: 1 row — precision_<k>…. */
  def precisionAtK(hits: DataFrame, ks: Seq[Int]): DataFrame = {
    val perQ = aggAll(
      hits,
      Seq(col("query_id")),
      ks.map(hitsAtK) ++ ks.map(k => sum(when(col("rnk") <= k, 1).otherwise(0)).as(s"d$k")))
    aggFlat(
      perQ,
      ks.map(k => round(avg(col(s"h$k").cast("double") / col(s"d$k")), 4).as(s"precision_$k")))
  }

  /** MRR: per query 1/rank of the first relevant retrieved doc, else 0
    * (`utils.py:107-108`); unweighted mean. Output: 1 row — mrr, n_queries. */
  def mrr(hits: DataFrame): DataFrame =
    hits
      .groupBy(col("query_id"))
      .agg(min(when(col("hit") === 1, col("rnk"))).as("first_hit"))
      .agg(
        round(avg(coalesce(lit(1.0) / col("first_hit"), lit(0.0))), 4).as("mrr"),
        count(lit(1)).as("n_queries"))
}
