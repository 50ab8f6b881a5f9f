package graft

import org.apache.spark.sql.functions._

import graft.operators.{BruteForce, VectorSearch}

/** The fused kernel ([[graft.operators.BruteForce]]) must be row-for-row
  * equivalent to the declarative crossJoin+window plan it replaced
  * ([[VectorSearch.topKWindow]]) — same scores, same ranks, same
  * tie-breaks — and insensitive to partitioning. */
class BruteForceSpec extends SparkSpec {

  private def frameSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.select(col("query_id").cast("long"), col("rnk").cast("long"), col("doc_id").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

  test("kernel == crossJoin+window plan on the sf0.001 fixture") {
    val fast = VectorSearch.topK(spark, sf0001, maxQueryId = 20, k = 10)
    val slow = VectorSearch.topKWindow(spark, sf0001, maxQueryId = 20, k = 10)
    assert(frameSet(fast) == frameSet(slow))
  }

  test("kernel scores match the HOF dot product exactly (double, array order)") {
    import spark.implicits._
    val fast = VectorSearch.topK(spark, sf0001, maxQueryId = 5, k = 7)
      .select($"query_id", $"doc_id", $"score".as("ks"))
    val slow = VectorSearch.topKWindow(spark, sf0001, maxQueryId = 5, k = 7)
      .select($"query_id", $"doc_id", $"score".as("ws"))
    val joined = fast.join(slow, Seq("query_id", "doc_id"), "inner")
    assert(joined.count() == 5 * 7)
    // Bitwise equality — both accumulate double in array order.
    assert(joined.filter($"ks" =!= $"ws").count() == 0)
  }

  test("result is invariant under corpus repartitioning") {
    import spark.implicits._
    val e = Tables(spark, sf0001, "embeddings")
    val qs = e.filter($"vec_id" < 10)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val base = e.select($"vec_id".as("id"), $"embedding".as("vec")).as[(Long, Array[Float])]
    val r1 = BruteForce.topK(base.repartition(1), qs, k = 5, excludeSelf = true)
    val r17 = BruteForce.topK(base.repartition(17), qs, k = 5, excludeSelf = true)
    assert(frameSet(r1) == frameSet(r17))
  }

  test("ties break by ascending doc_id in heap eviction AND final rank") {
    import spark.implicits._
    // 6 identical corpus vectors → all scores equal; top-3 must be the 3
    // smallest doc ids in id order, regardless of partitioning.
    val vec = Array(1.0f, 0.0f)
    val corpus = Seq(11L, 7L, 13L, 5L, 12L, 9L)
      .map(id => (id, vec)).toDS().repartition(3)
    val res = BruteForce.topK(corpus, Array((100L, vec)), k = 3, excludeSelf = false)
    val got = res.orderBy($"rnk").collect().map(r => r.getAs[Long]("doc_id")).toSeq
    assert(got == Seq(5L, 7L, 9L))
  }

  test("excludeSelf drops the query's own corpus row") {
    import spark.implicits._
    val corpus = Seq((1L, Array(1.0f, 0f)), (2L, Array(0.9f, 0.1f))).toDS()
    val res = BruteForce.topK(corpus, Array((1L, Array(1.0f, 0f))), k = 5, excludeSelf = true)
    val docs = res.collect().map(_.getAs[Long]("doc_id")).toSet
    assert(docs == Set(2L))
  }

  test("maxSim dominates plain dot and is invariant to doc sub-vector order") {
    import spark.implicits._
    val subDim = 2
    // query = two orthogonal unit sub-vectors
    val qv = Array(1f, 0f, 0f, 1f)
    // docA = same sub-vectors, same order; docB = SWAPPED sub-vectors:
    // plain dot scores 0, MaxSim recovers the full 2.0 (late interaction
    // matches each query token to its best doc token wherever it sits)
    val docA = Array(1f, 0f, 0f, 1f)
    val docB = Array(0f, 1f, 1f, 0f)
    val corpus = Seq((1L, docA), (2L, docB)).toDS()
    val ms = BruteForce.maxSimTopK(corpus, Array((9L, qv)), subDim, k = 2, excludeSelf = false)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(math.abs(ms(1L) - 2.0) < 1e-12)
    assert(math.abs(ms(2L) - 2.0) < 1e-12, s"swapped sub-vectors must still score 2.0: $ms")
    // dominance: MaxSim >= plain dot for every pair (diagonal pairing is
    // one candidate of the per-sub-vector max)
    val fixture = Tables(spark, sf0001, "embeddings")
      .select($"vec_id".as("id"), $"embedding".as("vec")).as[(Long, Array[Float])]
    val qs = fixture.filter($"id" < 3).collect().sortBy(_._1)
    val n = fixture.count().toInt
    val dots = BruteForce.topK(fixture, qs, k = n, excludeSelf = true)
      .select($"query_id", $"doc_id", $"score").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val msAll = BruteForce.maxSimTopK(fixture, qs, subDim = 8, k = n, excludeSelf = true)
      .select($"query_id", $"doc_id", $"score").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(dots.keySet == msAll.keySet)
    dots.foreach { case (pair, dot) =>
      assert(msAll(pair) >= dot - 1e-9, s"MaxSim < dot for $pair")
    }
  }

  test("rangeSearch returns exactly the above-threshold pairs, partitioning-invariant") {
    import spark.implicits._
    val corpus = Tables(spark, sf0001, "embeddings")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
      .as[(Long, Array[Float])]
    val qs = corpus.filter($"id" < 5).collect().sortBy(_._1)
    val tau = 0.3
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = BruteForce.rangeSearch(corpus, qs, tau, excludeSelf = true)
    val got2 = BruteForce.rangeSearch(corpus.repartition(7), qs, tau, excludeSelf = true)
    assert(key(got) == key(got2), "range result must not depend on partitioning")
    // in-engine oracle: score everything with topK at k = corpus size,
    // then threshold-filter
    val n = corpus.count().toInt
    val all = BruteForce.topK(corpus, qs, k = n, excludeSelf = true)
      .filter($"score" >= tau)
    assert(key(got) == key(all))
    assert(got.count() > 0, "fixture must produce a non-empty range result")
  }
}
