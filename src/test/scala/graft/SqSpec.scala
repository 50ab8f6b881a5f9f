package graft

import org.apache.spark.sql.functions._

import graft.operators.{BruteForce, Sq}

/** [[graft.operators.Sq]] — SQ8 scalar-quantization encode + ADC search. */
class SqSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = Tables(spark, sf0001, "embeddings")
    .select($"vec_id".as("id"), $"embedding".as("vec"))
    .as[(Long, Array[Float])]

  test("trained bounds bracket every corpus component and are partitioning-invariant") {
    val docs = corpus.collect()
    val (lo, hi) = Sq.trainBounds(corpus)
    val (lo1, hi1) = Sq.trainBounds(corpus.repartition(7))
    assert(lo.sameElements(lo1) && hi.sameElements(hi1),
      "bounds must be exact (order-free min/max) on any partitioning")
    docs.foreach { case (id, v) =>
      v.indices.foreach { i =>
        assert(lo(i) <= v(i).toDouble && v(i).toDouble <= hi(i),
          s"doc $id dim $i outside trained bounds")
      }
    }
  }

  test("codes stay in [0, 255] and reconstruction error is within half a step per dim") {
    val docs = corpus.collect()
    val (lo, hi) = Sq.trainBounds(corpus)
    val st = Sq.steps(lo, hi)
    val enc = Sq.encode(corpus, lo, hi).as[(Long, Array[Byte])].collect().toMap
    assert(enc.size == docs.length)
    docs.foreach { case (id, v) =>
      val codes = enc(id)
      v.indices.foreach { i =>
        val c = codes(i) & 0xFF
        assert(c >= 0 && c <= Sq.Levels)
        val dec = lo(i) + c.toDouble * st(i)
        // |x - dec| <= step/2 (+ roundoff): the defining SQ8 guarantee
        assert(math.abs(v(i).toDouble - dec) <= st(i) / 2.0 + 1e-12,
          s"doc $id dim $i reconstruction off by more than half a step")
      }
    }
  }

  test("IVF+SQ at full probe equals the flat SQ search") {
    // probing every centroid makes the candidate universe identical to
    // the flat scan; trim/rescore are shared, so the results must match
    val flat = Sq.search(spark, sf0001, maxQueryId = 5, k = 10)
      .select($"query_id", $"rnk", $"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val probedAll = Sq.searchIvf(spark, sf0001, maxQueryId = 5, k = 10,
        nProbe = graft.operators.Ann.Centroids)
      .select($"query_id", $"rnk", $"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(flat == probedAll)
  }

  test("SQ8 search recovers the exact top-10 on the fixture (rescore closes the gap)") {
    val sq = Sq.search(spark, sf0001, maxQueryId = 10, k = 10)
      .select($"query_id", $"doc_id", $"rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val qs = corpus.filter($"id" < 10).collect().sortBy(_._1)
    val exact = BruteForce.topK(corpus, qs, k = 10, excludeSelf = true)
      .select($"query_id", $"doc_id", $"rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(sq == exact,
      "with 8-bit/dim fidelity and RCand=50, rescored SQ8 top-10 must equal the exact top-10")
  }
}
