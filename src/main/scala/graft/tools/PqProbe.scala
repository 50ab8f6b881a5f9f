package graft.tools

import graft.{GraftSession, KernelBench}
import graft.operators.VectorBlocks

/** IVFPQ kernel profiling harness: builds the bench-scale index once,
  * then times fused searches across a grid of per-partition rescore
  * budgets (`rCand`) — the quick feedback loop for the PQ throughput
  * work, isolating search-pass cost from the build/BF/IVF legs that
  * [[KernelOnly]] also runs. Args: optional rCand values (default
  * 32 64 128 256 500). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    val cfg = KernelBench.Default
    val rCands = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(32, 64, 128, 256, 500)

    val corpus = spark.range(cfg.n.toLong)
      .map(id => (id, KernelBench.vec(cfg, id)))
      .toDF("id", "vec")
      .as[(Long, Array[Float])]
    val blocks = VectorBlocks.pack(corpus, cfg.dim).cache()
    blocks.count()
    val queries = Array.tabulate(cfg.nQueries)(i => (i.toLong, KernelBench.queryVec(cfg, i)))

    var t0 = System.nanoTime()
    val cents = KernelBench.trainCoarse(cfg)
    val indexed = VectorBlocks.assign(blocks, cents).cache()
    indexed.count()
    blocks.unpersist()
    println(f"PHASE coarse+assign ${(System.nanoTime() - t0) / 1e9}%.2f s")

    val centRank: Array[Array[Int]] = queries.map { case (_, qv) =>
      val scores = Array.tabulate(cfg.centroids) { c =>
        val cv = cents(c)
        var s = 0.0
        var i = 0
        while (i < cfg.dim) { s += cv(i).toDouble * qv(i).toDouble; i += 1 }
        s
      }
      Array.range(0, cfg.centroids).sortBy(c => -scores(c))
    }
    val probes = centRank.map { r =>
      val m = new Array[Boolean](cfg.centroids)
      r.take(cfg.nProbe).foreach(m(_) = true)
      m
    }

    t0 = System.nanoTime()
    val sample = Array.tabulate(cfg.pqTrainSample) { j =>
      val v = KernelBench.vec(cfg, j.toLong * (cfg.n / cfg.pqTrainSample))
      var bestC = 0
      var bestS = Double.NegativeInfinity
      var c = 0
      while (c < cfg.centroids) {
        val cv = cents(c)
        var s = 0.0
        var i = 0
        while (i < cfg.dim) { s += cv(i).toDouble * v(i).toDouble; i += 1 }
        if (s > bestS) { bestS = s; bestC = c }
        c += 1
      }
      val cv = cents(bestC)
      Array.tabulate(cfg.dim)(i => v(i) - cv(i))
    }
    val codebook = graft.operators.PqTrain.trainComposite(
      sample, cfg.dim, cfg.pqSubDim, cfg.pqCodebook, cfg.pqTrainIters)
    val encoded = VectorBlocks.encodePqResidual(indexed, cents, codebook, cfg.pqSubDim)
    val pqIndex = VectorBlocks
      .buildPqIndex(indexed, encoded, cfg.centroids, cfg.pqCodebook, cfg.pqSubDim)
      .cache()
    pqIndex.count()
    println(f"PHASE pq build ${(System.nanoTime() - t0) / 1e9}%.2f s")

    // exact ground truth for recall
    val exactDf = VectorBlocks.topK(spark, indexed, queries, cfg.k, excludeSelf = false)
    val exact = exactDf.select("query_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // warm-up
    VectorBlocks.ivfpqSearch(
      pqIndex, cents, codebook, cfg.pqSubDim, queries.take(2), probes.take(2),
      rCand = 10, k = 10)

    rCands.foreach { rc =>
      val secs = (1 to 3).map { _ =>
        val t = System.nanoTime()
        VectorBlocks.ivfpqSearch(
          pqIndex, cents, codebook, cfg.pqSubDim, queries, probes, rc, cfg.k)
        (System.nanoTime() - t) / 1e9
      }
      val ids = VectorBlocks.ivfpqSearch(
        pqIndex, cents, codebook, cfg.pqSubDim, queries, probes, rc, cfg.k)
      val got = ids.iterator.zipWithIndex
        .flatMap { case (ds, qi) => ds.iterator.map(queries(qi)._1 -> _) }.toSet
      val recall = got.count(exact.contains).toDouble / exact.size
      println(f"RCAND $rc%4d ms/query ${secs.min * 1000 / cfg.nQueries}%.2f " +
        f"(passes ${secs.map(s => f"$s%.2f").mkString(",")}) recall $recall%.4f")
    }
    spark.stop()
  }
}
