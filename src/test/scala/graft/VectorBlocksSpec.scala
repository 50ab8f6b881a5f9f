package graft

import org.apache.spark.sql.functions._

import graft.operators.{BruteForce, VectorBlocks}

/** The packed-block throughput kernel ([[graft.operators.VectorBlocks]])
  * must retrieve the same results as the oracle-exact row kernel
  * ([[BruteForce]]) on the real fixture embeddings. Scores may differ by
  * float-rounding (the block kernel sums with 4 unrolled accumulators),
  * so sets are compared on ids and scores on tolerance.
  */
class VectorBlocksSpec extends SparkSpec {

  private def emb(maxQ: Int) = {
    import spark.implicits._
    val e = Tables(spark, sf0001, "embeddings")
    val corpus = e.select($"vec_id".as("id"), $"embedding".as("vec")).as[(Long, Array[Float])]
    val qs = e.filter($"vec_id" < maxQ)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    (corpus, qs)
  }

  private def rankSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.select(col("query_id").cast("long"), col("rnk").cast("long"), col("doc_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("block kernel == row kernel on the sf0.001 fixture (ranks and ids)") {
    val (corpus, qs) = emb(15)
    val dim = qs.head._2.length
    val blocks = VectorBlocks.pack(corpus, dim)
    val fast = VectorBlocks.topK(spark, blocks, qs, k = 10, excludeSelf = true)
    val exact = BruteForce.topK(corpus, qs, k = 10, excludeSelf = true)
    assert(rankSet(fast) == rankSet(exact))
  }

  test("block kernel scores match the exact kernel within 1e-9") {
    import spark.implicits._
    val (corpus, qs) = emb(5)
    val dim = qs.head._2.length
    val blocks = VectorBlocks.pack(corpus, dim)
    val fast = VectorBlocks.topK(spark, blocks, qs, k = 7, excludeSelf = true)
      .select($"query_id", $"doc_id", $"score".as("bs"))
    val exact = BruteForce.topK(corpus, qs, k = 7, excludeSelf = true)
      .select($"query_id", $"doc_id", $"score".as("es"))
    val joined = fast.join(exact, Seq("query_id", "doc_id"), "inner")
    assert(joined.count() == 5 * 7)
    assert(joined.filter(abs($"bs" - $"es") > 1e-9).count() == 0)
  }

  test("packing is invariant under repartitioning and partial blocks") {
    val (corpus, qs) = emb(8)
    val dim = qs.head._2.length
    // 500 fixture rows over 17 partitions → every block is a partial block
    val b17 = VectorBlocks.pack(corpus.repartition(17), dim)
    val b1 = VectorBlocks.pack(corpus.repartition(1), dim)
    val r17 = VectorBlocks.topK(spark, b17, qs, k = 5, excludeSelf = true)
    val r1 = VectorBlocks.topK(spark, b1, qs, k = 5, excludeSelf = true)
    assert(rankSet(r17) == rankSet(r1))
  }

  test("probed block kernel == unprobed when every centroid is probed") {
    import spark.implicits._
    val (corpus, qs) = emb(10)
    val dim = qs.head._2.length
    val cents = Tables(spark, sf0001, "embeddings")
      .filter($"vec_id" % 25 === 0)
      .select($"embedding").as[Array[Float]].collect()
    val indexed = VectorBlocks.assign(VectorBlocks.pack(corpus, dim), cents)
    val allProbes = Array.fill(qs.length)(Array.fill(cents.length)(true))
    val probed = VectorBlocks.topKProbed(spark, indexed, qs, allProbes, k = 10)
    val full = VectorBlocks.topK(spark, VectorBlocks.pack(corpus, dim), qs, k = 10,
      excludeSelf = false)
    assert(rankSet(probed) == rankSet(full))
  }

  test("fused bfSearch == DataFrame topK (ids in rank order, incl. self-exclusion off)") {
    val (corpus, qs) = emb(12)
    val dim = qs.head._2.length
    val blocks = VectorBlocks.pack(corpus, dim)
    val viaDf = KernelBench.ranked(
      VectorBlocks.topK(spark, blocks, qs, k = 10, excludeSelf = false))
    val fused = VectorBlocks.bfSearch(blocks, qs, k = 10, excludeSelf = false)
    qs.iterator.zipWithIndex.foreach { case ((qid, _), qi) =>
      assert(fused(qi).toSeq == viaDf(qid).toSeq, s"query $qid")
    }
    // excludeSelf variant drops exactly the self hit
    val fusedEx = VectorBlocks.bfSearch(blocks, qs, k = 10, excludeSelf = true)
    qs.iterator.zipWithIndex.foreach { case ((qid, _), qi) =>
      assert(!fusedEx(qi).contains(qid))
    }
  }

  test("fused ivfFlatSearch == DataFrame topKProbed under the same probe masks") {
    import spark.implicits._
    val (corpus, qs) = emb(10)
    val dim = qs.head._2.length
    val cents = Tables(spark, sf0001, "embeddings")
      .filter($"vec_id" % 25 === 0)
      .select($"embedding").as[Array[Float]].collect()
    val indexed = VectorBlocks.assign(VectorBlocks.pack(corpus, dim), cents)
    // a nontrivial mask: query qi probes centroids (qi + c) % C < C/2
    val masks = Array.tabulate(qs.length)(qi =>
      Array.tabulate(cents.length)(c => (qi + c) % cents.length < cents.length / 2))
    val viaDf = KernelBench.ranked(
      VectorBlocks.topKProbed(spark, indexed, qs, masks, k = 10))
    val fused = VectorBlocks.ivfFlatSearch(indexed, qs, masks, k = 10)
    qs.iterator.zipWithIndex.foreach { case ((qid, _), qi) =>
      assert(fused(qi).toSeq == viaDf.getOrElse(qid, Array.emptyLongArray).toSeq, s"query $qid")
    }
  }

  test("block PQ encode matches the row-level Pq.encode on the fixture") {
    import spark.implicits._
    val (corpus, _) = emb(1)
    val cb = operators.Pq.codebookInit(spark, sf0001) // (code_id, vec) sorted by id
    val rowEnc = operators.Pq.encode(corpus, cb.map(t => (t._1, t._2.map(_.toDouble))))
      .as[(Long, Array[Long])].collect()
      .map(t => t._1 -> t._2.toSeq).toMap
    val blockEnc = VectorBlocks
      .encodePq(VectorBlocks.pack(corpus, 64), cb.map(_._2), operators.Pq.SubDim)
      .flatMap(c => c.ids.zipWithIndex.map { case (id, r) =>
        id -> c.codes.slice(r * c.m, (r + 1) * c.m).map(b => cb(b & 0xFF)._1).toSeq
      })
      .collect().toMap
    assert(blockEnc == rowEnc)
  }

  test("ADC with r >= corpus size + rescore reproduces the exact top-k") {
    val (corpus, qs) = emb(8)
    val dim = qs.head._2.length
    val blocks = VectorBlocks.pack(corpus, dim)
    val cb = operators.Pq.codebookInit(spark, sf0001).map(_._2)
    val encoded = VectorBlocks.encodePq(blocks, cb, operators.Pq.SubDim)
    val cands = VectorBlocks
      .adcCandidates(spark, encoded, cb, operators.Pq.SubDim, qs, r = 600)
      .map { case (q, d, _) => (q, d) }.collect()
    val viaPq = VectorBlocks.rescore(spark, blocks, qs, cands, k = 10)
    val exact = VectorBlocks.topK(spark, blocks, qs, k = 10, excludeSelf = true)
    assert(rankSet(viaPq) == rankSet(exact))
  }

  test("fused ivfpqSearch with full probes and r >= corpus reproduces the exact top-k") {
    val (corpus, qs) = emb(8)
    val dim = qs.head._2.length
    val cb = operators.Pq.codebookInit(spark, sf0001).map(_._2)
    val cents = cb.take(4) // any small deterministic centroid set
    val indexed = VectorBlocks.assign(VectorBlocks.pack(corpus, dim), cents).cache()
    val encoded = VectorBlocks.encodePqResidual(indexed, cents, cb, operators.Pq.SubDim)
    val pqIndex = VectorBlocks
      .buildPqIndex(indexed, encoded, cents.length, cb.length, operators.Pq.SubDim)
    val allProbes = Array.fill(qs.length)(Array.fill(cents.length)(true))
    val got = VectorBlocks
      .ivfpqSearch(pqIndex, cents, cb, operators.Pq.SubDim, qs, allProbes,
        rCand = 600, k = 10)
    val exact = VectorBlocks.topK(spark, indexed, qs, k = 10, excludeSelf = false)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    qs.zipWithIndex.foreach { case ((qid, _), qi) =>
      assert(got(qi).toSeq == exact(qid), s"query $qid")
    }
    indexed.unpersist()
  }

  test("block-level centroid assignment matches the row kernel's assign") {
    import spark.implicits._
    val (corpus, _) = emb(1)
    val dim = 64
    val centRows = Tables(spark, sf0001, "embeddings")
      .filter($"vec_id" % 25 === 0)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().sortBy(_._1)
    val indexed = VectorBlocks.assign(VectorBlocks.pack(corpus, dim), centRows.map(_._2))
    val got = indexed.flatMap(b => b.ids.zip(b.cids)).collect().toMap
    val expected = BruteForce.assign(corpus, centRows)
      .select($"id", $"centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // row kernel returns centroid IDs; block kernel returns centroid
    // ARRAY INDICES — map through the sorted centroid id list
    assert(got.map { case (id, ci) => id -> centRows(ci)._1 } == expected)
  }
}
