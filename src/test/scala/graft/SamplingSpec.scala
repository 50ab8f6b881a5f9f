package graft

/** The sampling contract (SURVEY §7.4 hard part 3): key-deterministic
  * samples must be identical under any partitioning, and the stratified
  * subset must never lose a relevant row. */
class SamplingSpec extends SparkSpec {

  test("subset sample keeps ALL relevant rows (n_missing_relevant == 0)") {
    val r = SparkEntry.queries("q27_subset_sample")(spark, sf001).collect().head
    assert(r.getAs[Long]("n_missing_relevant") == 0L)
    assert(r.getAs[Long]("n_subset") ==
      r.getAs[Long]("n_relevant") + r.getAs[Long]("n_sampled"))
    // exact-count trim: the sample is exactly ceil(30% of the pool)
    val nCust = Tables(spark, sf001, "customer").count()
    val pool = nCust - r.getAs[Long]("n_relevant")
    assert(r.getAs[Long]("n_sampled") == math.ceil(0.3 * pool).toLong)
  }

  test("query sample is deterministic across repeated runs and partitionings") {
    import spark.implicits._
    def run(): Seq[Long] =
      SparkEntry.queries("q28_query_sample")(spark, sf001)
        .select($"vec_id").as[Long].collect().toSeq.sorted
    val a = run()
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = run()
      assert(a == b, "sample changed under different shuffle partitioning")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
    assert(a.size == 100)
  }

  test("multimodal decode: real PNG round trip → known pooled statistics") {
    import graft.operators.Multimodal.{decodeImage, renderPng}
    // 16×16 PNG whose raster is bytes 97,98,99 + 253 zero-padding pixels
    val png = renderPng(16, 16, "abc".getBytes("UTF-8"))
    assert(png.take(8).map(_ & 0xff).toSeq == Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a),
      "renderPng must emit a real PNG signature")
    val f = decodeImage(png)
    assert(math.abs(f(0) - ((97 + 98 + 99).toDouble / 256 / 255.0).toFloat) < 1e-7)
    assert(math.abs(f(1) - 99.0f / 255.0f) < 1e-7) // min is a padding 0
    assert(math.abs(f(2) - 0.256f) < 1e-7)
    // no-padding case: source longer than the raster — prefix only
    val full = decodeImage(renderPng(4, 4, Array.fill[Byte](20)(97)))
    assert(math.abs(full(0) - 97.0f / 255.0f) < 1e-7)
    assert(full(1) == 0.0f)
  }

  test("frame sampling arithmetic matches ceil(ceil(n/16)/stride)") {
    for ((n, want) <- Seq((157L, 3L), (16L, 1L), (17L, 1L), (256L, 4L), (1L, 1L)))
      assert(graft.operators.Multimodal.sampledFrames(n, 4) == want, s"n=$n")
  }

  test("train/val/test split partitions every doc and lands near 90/5/5 overall") {
    val rows = SparkEntry.queries("q59_train_split")(spark, sf001).collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == Tables(spark, sf001, "documents").count(),
      "split must assign every document exactly once")
    val bySplit = rows.groupBy(_.getAs[String]("split"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Long]("n")).sum.toDouble / total }
    assert(bySplit.keySet == Set("train", "val", "test"), s"splits: ${bySplit.keySet}")
    // LCG is uniform; at n=500 the binomial 3σ band around 0.9 is ~±0.04
    assert(math.abs(bySplit("train") - 0.9) < 0.05, s"train frac ${bySplit("train")}")
    assert(math.abs(bySplit("val") - 0.05) < 0.03, s"val frac ${bySplit("val")}")
    assert(math.abs(bySplit("test") - 0.05) < 0.03, s"test frac ${bySplit("test")}")
  }

  test("corpus shuffle (q61): every doc sharded once, shards balanced, heads are true per-shard minima") {
    import org.apache.spark.sql.functions._
    import graft.operators.Sampling
    val rows = SparkEntry.queries("q61_corpus_shuffle")(spark, sf001).collect()
    val S = Sampling.ShuffleShards
    val shards = rows.map(_.getAs[Long]("shard_id")).distinct.sorted
    assert(shards.forall(s => s >= 0 && s < S), s"shard out of range: ${shards.toSeq}")
    // census covers the corpus exactly once (n_docs is repeated per head
    // row — take one per shard)
    val census = rows.groupBy(_.getAs[Long]("shard_id"))
      .map { case (k, rs) => k -> rs.head.getAs[Long]("n_docs") }
    val total = Tables(spark, sf001, "documents").count()
    assert(census.values.sum == total, "sharding dropped or duplicated docs")
    // LCG-uniform sharding: no shard dominates (expected n/S = ~31 at
    // sf0.01's 500 docs; allow a generous 3x band)
    assert(census.values.max < 3L * total / S, s"skewed shards: $census")
    // the head rows really are the shard's u2-minima, in oracle order —
    // recompute driver-side from the raw assignment columns
    val (shardCol, u2Col) = Sampling.shuffleShard(col("doc_id"))
    val raw = Tables(spark, sf001, "documents")
      .select(col("doc_id"), shardCol.as("shard_id"), u2Col.as("u2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val wantHeads = raw.groupBy(_._2).map { case (sh, rs) =>
      sh -> rs.sortBy(r => (r._3, r._1)).take(Sampling.ShuffleHead).map(_._1).toSeq
    }
    val gotHeads = rows.groupBy(_.getAs[Long]("shard_id")).map { case (sh, rs) =>
      sh -> rs.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Long]("doc_id")).toSeq
    }
    assert(gotHeads == wantHeads, "per-shard heads diverge from the brute-force order")
    // determinism: pure functions of doc_id — identical under repartition
    val re = Tables(spark, sf001, "documents").repartition(13)
      .select(col("doc_id"), shardCol.as("shard_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(raw.forall { case (id, sh, _) => re(id) == sh }, "shard assignment moved under repartition")
  }
}
