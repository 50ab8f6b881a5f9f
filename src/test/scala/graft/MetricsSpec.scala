package graft

import org.apache.spark.sql.DataFrame

import graft.operators.Metrics

/** Hand-computed cases for Recall@K / Precision@K / MRR, mirroring the
  * reference formulas (`utils.py:15-110`) and their edge cases:
  * zero-on-no-hit (`utils.py:107-108`), actual-retrieved denominator
  * (`utils.py:77-79`), and two-level unweighted averaging (`utils.py:46`).
  */
class MetricsSpec extends SparkSpec {

  /** rows: (query_id, rnk, hit, n_rel) */
  private def hitFrame(rows: Seq[(Long, Long, Int, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("query_id", "rnk", "hit", "n_rel")
  }

  // Query 1: relevant at ranks 1 and 3 of 4 relevant total.
  // Query 2: relevant at rank 2 of 2 relevant total.
  private val twoQueries = hitFrame(Seq(
    (1L, 1L, 1, 4L), (1L, 2L, 0, 4L), (1L, 3L, 1, 4L),
    (2L, 1L, 0, 2L), (2L, 2L, 1, 2L), (2L, 3L, 0, 2L)))

  test("recall@K: per-query hits/n_rel then unweighted mean") {
    val r = Metrics.recallAtK(twoQueries, Seq(1, 3)).collect().head
    // R@1: q1 = 1/4, q2 = 0/2 → mean 0.125; R@3: q1 = 2/4, q2 = 1/2 → 0.5
    assert(r.getAs[Double]("recall_1") == 0.125)
    assert(r.getAs[Double]("recall_3") == 0.5)
    assert(r.getAs[Long]("n_queries") == 2L)
  }

  test("precision@K uses the ACTUAL retrieved count as denominator") {
    // Query 3 retrieved only 2 docs; P@3 must divide by 2, not 3.
    val short = hitFrame(Seq((3L, 1L, 1, 5L), (3L, 2L, 0, 5L)))
    val p = Metrics.precisionAtK(short, Seq(3)).collect().head
    assert(p.getAs[Double]("precision_3") == 0.5) // 1 hit / 2 retrieved
  }

  test("precision@K over two queries is the unweighted mean") {
    val p = Metrics.precisionAtK(twoQueries, Seq(1, 3)).collect().head
    // P@1: q1 = 1/1, q2 = 0/1 → 0.5; P@3: q1 = 2/3, q2 = 1/3 → 0.5
    assert(p.getAs[Double]("precision_1") == 0.5)
    assert(p.getAs[Double]("precision_3") == 0.5)
  }

  test("mrr: 1/first-hit-rank; a query with NO hit contributes 0, not skip") {
    val withMiss = hitFrame(Seq(
      (1L, 1L, 0, 3L), (1L, 2L, 1, 3L), // first hit at 2 → 0.5
      (2L, 1L, 0, 1L), (2L, 2L, 0, 1L))) // no hit → 0.0
    val m = Metrics.mrr(withMiss).collect().head
    assert(m.getAs[Double]("mrr") == 0.25) // (0.5 + 0.0) / 2
    assert(m.getAs[Long]("n_queries") == 2L)
  }

  test("two-level averaging: a heavy query must not dominate (A9)") {
    // q1 has 10 retrieved all hits (recall 10/10); q2 has 1 retrieved, 0
    // hits of 1 relevant. Flat pooling would give 10/11; correct mean of
    // per-query recalls is (1.0 + 0.0) / 2.
    val skewed = hitFrame(
      (1 to 10).map(i => (1L, i.toLong, 1, 10L)) :+ (2L, 1L, 0, 1L))
    val r = Metrics.recallAtK(skewed, Seq(10)).collect().head
    assert(r.getAs[Double]("recall_10") == 0.5)
  }
}
