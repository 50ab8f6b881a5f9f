package graft

import graft.operators.{ColdScan, VectorBlocks}

/** Cold-scan leg at fixture scale: the same artifact-write → parquet
  * re-read → full-scan rank path Bench runs at 1M×384, on a config
  * small enough for the test JVM. Gates: the float tier IS exact
  * search (bit-equal ids vs the fused resident kernel), the byte
  * ordering bin < pq < sq8 < float holds on disk AND in bytes actually
  * read, and each compressed tier's approximate ranking clears its
  * recall floor (candidate generation only — no rescore — so the
  * floors characterize the raw representations).
  */
class ColdScanSpec extends SparkSpec {

  // dim 64 keeps the four byte-widths distinct: float 256, sq8 64,
  // pq 16 (subDim 4), bin 8 B/doc. n = 20k so the payload dominates the
  // ~7 KB fixed parquet overhead (at 4k rows the bin and pq artifacts
  // read within noise of each other — all footer).
  private val cfg = KernelBench.Cfg(
    n = 20000,
    dim = 64,
    nQueries = 20,
    k = 20,
    centroids = 8,
    nProbe = 2,
    sweepProbes = Seq(1),
    pqSubDim = 4,
    pqCodebook = 16,
    pqRescore = 100,
    pqTrainSample = 512,
    pqTrainIters = 4)

  private lazy val root = s"/tmp/graft_coldscan_spec_${ProcessHandle.current().pid()}"
  // dropCache=false: the spec gates kernel CORRECTNESS, and a test run
  // must not evict the machine's page cache
  private lazy val result = ColdScan.run(spark, cfg, root, passes = 1, dropCache = false)
  private def tier(name: String) = result.tiers.find(_.name == name).get

  private lazy val exactIds: Array[Array[Long]] = {
    import spark.implicits._
    val bcCfg = cfg
    val corpus = spark.range(cfg.n.toLong)
      .map(id => (id, KernelBench.vec(bcCfg, id)))
      .toDF("id", "vec").as[(Long, Array[Float])]
    val queries = Array.tabulate(cfg.nQueries)(i => (i.toLong, KernelBench.queryVec(cfg, i)))
    VectorBlocks.bfSearch(
      VectorBlocks.pack(corpus, cfg.dim), queries, cfg.k, excludeSelf = false)
  }

  private def overlap10(got: Array[Array[Long]]): Double =
    got.iterator.zipWithIndex.map { case (ids, qi) =>
      val e = exactIds(qi).take(10).toSet
      ids.take(10).count(e.contains).toDouble / 10
    }.sum / cfg.nQueries

  test("cold float scan is EXACT search: bit-equal ids vs the fused resident kernel") {
    val cold = tier("float").topIds
    assert(cold.length == exactIds.length)
    cold.zip(exactIds).zipWithIndex.foreach { case ((c, e), qi) =>
      assert(c.sameElements(e), s"query $qi: cold float ids drifted from bfSearch")
    }
  }

  test("byte ordering bin < pq < sq8 < float holds on disk and in bytes read") {
    val names = Seq("bin", "pq", "sq8", "float")
    val disk = names.map(n => tier(n).bytesDisk)
    assert(disk.zip(disk.tail).forall { case (a, b) => a < b },
      s"disk bytes not ordered: ${names.zip(disk)}")
    val read = names.map(n => tier(n).bytesRead.min)
    info(s"bytes read: ${names.zip(read)}; disk: ${names.zip(disk)}")
    assert(read.zip(read.tail).forall { case (a, b) => a < b },
      s"bytes read not ordered: ${names.zip(read)}")
    // a pass must actually read the artifact (parquet reads data pages,
    // not raw file bytes — column pruning and page compression keep the
    // counter below the file length, so >= 25% of disk is the sanity
    // band, not equality)
    result.tiers.foreach { t =>
      assert(t.bytesRead.min > t.bytesDisk / 4,
        s"${t.name}: read ${t.bytesRead.min} B vs ${t.bytesDisk} B on disk — scan skipped data?")
      assert(t.passSec.forall(_ > 0))
    }
  }

  test("compressed tiers clear their recall floors (candidate generation only)") {
    val sq = overlap10(tier("sq8").topIds)
    val pq = overlap10(tier("pq").topIds)
    val bin = overlap10(tier("bin").topIds)
    info(f"overlap@10 vs exact — sq8 $sq%.3f, pq $pq%.3f, bin $bin%.3f")
    // SQ8 is a 256-level/dim quantization of the SAME vector: near-exact
    assert(sq >= 0.9, s"sq8 cold overlap@10 $sq below floor")
    // PQ (16 codewords, 4-dim subspaces at spec scale) is lossier —
    // measured 0.42-0.45 at this cfg; the floor guards against a broken
    // LUT, not against quantization loss
    assert(pq >= 0.3, s"pq cold overlap@10 $pq below floor")
    // binary keeps only residual signs: the weakest pre-rank by design —
    // the tier buys its recall back with rescore depth (bin_rescore_sweep)
    assert(bin >= 0.15, s"bin cold overlap@10 $bin below floor")
  }
}
