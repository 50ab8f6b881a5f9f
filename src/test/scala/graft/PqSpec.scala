package graft

import org.apache.spark.sql.functions._

import graft.operators.{BruteForce, Pq}

/** [[graft.operators.Pq]] — product quantization encode + ADC search. */
class PqSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = Tables(spark, sf0001, "embeddings")
    .select($"vec_id".as("id"), $"embedding".as("vec"))
    .as[(Long, Array[Float])]

  test("INIT codebook rows encode to themselves in every subspace") {
    // self-encoding holds for the untrained init (codewords ARE corpus
    // rows); the trained codebook replaces them with cell means
    val cb = Pq.codebookInit(spark, sf0001).map { case (id, v) => (id, v.map(_.toDouble)) }
    val selfIds = cb.map(_._1).toSet
    val enc = Pq.encode(corpus.filter($"id".isin(selfIds.toSeq: _*)), cb)
      .as[(Long, Array[Long])].collect()
    assert(enc.nonEmpty)
    enc.foreach { case (id, codes) =>
      assert(codes.forall(_ == id), s"codebook row $id encoded as ${codes.toSeq}")
    }
  }

  test("Lloyd training does not increase total quantization error") {
    val init = Pq.codebookInit(spark, sf0001).map { case (id, v) => (id, v.map(_.toDouble)) }
    val trained = Pq.codebook(spark, sf0001)
    val docs = corpus.collect()
    def sse(cb: Array[(Long, Array[Double])]): Double =
      docs.iterator.map { case (_, v) =>
        (0 until v.length / Pq.SubDim).map { mi =>
          cb.iterator.map { case (_, cv) =>
            (0 until Pq.SubDim).map { i =>
              val diff = v(mi * Pq.SubDim + i).toDouble - cv(mi * Pq.SubDim + i)
              diff * diff
            }.sum
          }.min
        }.sum
      }.sum
    val (e0, e1) = (sse(init), sse(trained))
    assert(e1 <= e0, s"trained SSE $e1 > init SSE $e0")
    assert(e1 < e0, "training changed nothing — Lloyd step is a no-op")
  }

  test("encode is invariant under repartitioning") {
    val cb = Pq.codebook(spark, sf0001)
    val e1 = Pq.encode(corpus.repartition(1), cb)
      .as[(Long, Array[Long])].collect().map(t => t._1 -> t._2.toSeq).toMap
    val e9 = Pq.encode(corpus.repartition(9), cb)
      .as[(Long, Array[Long])].collect().map(t => t._1 -> t._2.toSeq).toMap
    assert(e1 == e9)
  }

  test("ADC + exact rescore recovers most of the exact top-10") {
    val queries = corpus.filter($"id" < 20).collect().sortBy(_._1)
    val exact = BruteForce.topK(corpus, queries, k = 10, excludeSelf = true)
      .select($"query_id", $"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Pq.search(spark, sf0001, maxQueryId = 20, k = 10)
      .select($"query_id", $"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = exact.intersect(pq).size.toDouble / exact.size
    // 20 codewords x 8 subspaces on word-salad embeddings is a coarse
    // quantizer; the RCand=50 exact rescore still recovers the bulk
    assert(overlap >= 0.5, s"overlap $overlap")
    // and every rescored score is a true dot product: any PQ hit that IS
    // in the exact set must carry the identical rank-eligible score
    assert(pq.size == exact.size)
  }

  test("rescored scores are exact dot products, not ADC approximations") {
    val pq = Pq.search(spark, sf0001, maxQueryId = 5, k = 5)
    val withExact = pq
      .join(Tables(spark, sf0001, "embeddings").select($"vec_id".as("doc_id"), $"embedding"), "doc_id")
      .join(Tables(spark, sf0001, "embeddings").select($"vec_id".as("query_id"), $"embedding".as("qe")), "query_id")
      .select(($"score" - Functions.vecDot($"qe", $"embedding")).as("diff"))
    assert(withExact.filter(abs($"diff") > 1e-12).count() == 0)
  }

  test("persisted PQ index: build-if-absent under a custom root, bit-exact serving parity") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft_pq_idx").toString
    spark.conf.set(graft.operators.Ann.IndexRootConf, root)
    try {
      val fromDisk = Pq.searchPersisted(spark, sf0001, maxQueryId = 10, k = 5)
        .select("query_id", "rnk", "doc_id", "score")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted
      // artifacts landed under the configured root, not the default
      val path = new java.io.File(root).listFiles.map(_.getName)
        .find(_.contains("_pq_")).getOrElse(fail(s"no pq index under $root"))
      val codes = new java.io.File(s"$root/$path/codes")
      assert(codes.isDirectory && codes.listFiles.exists(_.getName == "_SUCCESS"))
      // build-if-absent: a second serve does not rewrite the artifacts
      val mtime = codes.lastModified
      Pq.searchPersisted(spark, sf0001, maxQueryId = 10, k = 5).collect()
      assert(codes.lastModified == mtime, "second serve rebuilt the persisted index")
      // bit-exact parity with the in-session pipeline
      val inMem = Pq.search(spark, sf0001, maxQueryId = 10, k = 5)
        .select("query_id", "rnk", "doc_id", "score")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted
      assert(fromDisk.sameElements(inMem), "persisted serving diverged from in-session search")
    } finally spark.conf.unset(graft.operators.Ann.IndexRootConf)
  }

  // ------------------------------------------------- IVF + residual PQ

  test("IVF+PQ: full probe recovers the exact top-10 bulk; probing fewer lists never beats it") {
    val queries = corpus.filter($"id" < 10).collect().sortBy(_._1)
    val exact = BruteForce.topK(corpus, queries, k = 10, excludeSelf = true)
      .select($"query_id", $"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def got(nProbe: Int): Set[(Long, Long)] =
      Pq.searchIvfPq(spark, sf0001, maxQueryId = 10, k = 10, nProbe = nProbe)
        .select($"query_id", $"doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = got(graft.operators.Ann.Centroids)
    assert(full.size == exact.size, "full probe did not fill k per query")
    val fullOv = exact.intersect(full).size.toDouble / exact.size
    val oneOv = exact.intersect(got(1)).size.toDouble / exact.size
    // 20 codewords over residuals of a 32-centroid coarse quantizer is
    // a very small codebook on word-salad fixtures (production is 256,
    // where residual encoding wins); the RCand=50 rescore still recovers
    // a meaningful floor — measured 0.44 at these constants
    assert(fullOv >= 0.4, s"full-probe overlap $fullOv")
    assert(fullOv >= oneOv, s"full-probe $fullOv < nProbe=1 $oneOv")
    // self is excluded in every regime
    assert(full.forall { case (q, d) => q != d })
  }

  test("IVF+PQ: the residual codebook is trained on residuals, not the raw corpus") {
    val flat = Pq.codebook(spark, sf0001).map { case (id, v) => (id, v.toSeq) }.toSeq
    val resid = Pq.residCodebook(spark, sf0001).map { case (id, v) => (id, v.toSeq) }.toSeq
    assert(resid.size == flat.size)
    assert(resid != flat, "residual training reproduced the flat codebook — residuals not used")
  }

  test("persisted IVF+PQ index: build-if-absent, bit-exact serving parity") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivfpq_idx").toString
    spark.conf.set(graft.operators.Ann.IndexRootConf, root)
    try {
      val fromDisk = Pq.searchIvfPqPersisted(spark, sf0001, maxQueryId = 10, k = 5, nProbe = 4)
        .select("query_id", "rnk", "doc_id", "score")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted
      val path = new java.io.File(root).listFiles.map(_.getName)
        .find(_.contains("_ivfpq_")).getOrElse(fail(s"no ivfpq index under $root"))
      val codes = new java.io.File(s"$root/$path/codes")
      assert(codes.isDirectory && codes.listFiles.exists(_.getName == "_SUCCESS"))
      val mtime = codes.lastModified
      Pq.searchIvfPqPersisted(spark, sf0001, maxQueryId = 10, k = 5, nProbe = 4).collect()
      assert(codes.lastModified == mtime, "second serve rebuilt the persisted index")
      val inMem = Pq.searchIvfPq(spark, sf0001, maxQueryId = 10, k = 5, nProbe = 4)
        .select("query_id", "rnk", "doc_id", "score")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted
      assert(fromDisk.sameElements(inMem), "persisted serving diverged from in-session search")
    } finally spark.conf.unset(graft.operators.Ann.IndexRootConf)
  }

  test("filtered IVF+PQ never serves a predicate-failing doc") {
    val got = Pq.searchIvfPq(spark, sf0001, maxQueryId = 10, k = 10, nProbe = 8,
      pred = Some(col("label") % 3 === 0))
    val labels = Tables(spark, sf0001, "embeddings")
      .select($"vec_id".as("doc_id"), $"label")
    assert(got.join(labels, "doc_id").filter($"label" % 3 =!= 0).count() == 0)
    assert(got.count() > 0)
  }
}
