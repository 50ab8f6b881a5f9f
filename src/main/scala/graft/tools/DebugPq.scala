package graft.tools

import graft.{GraftSession, KernelBench}
import graft.operators.{PqTrain, VectorBlocks}

/** Sub-timing breakdown of the IVFPQ bench pass (throwaway diagnostics). */
object DebugPq {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("32")
    import spark.implicits._
    import KernelBench._
    val corpus = spark.range(N.toLong).map(id => (id, KernelBench.vecPublic(id))).toDF("id", "vec")
      .as[(Long, Array[Float])]
    val blocks = VectorBlocks.pack(corpus, Dim).cache()
    blocks.count()
    val queries = Array.tabulate(NQueries)(i => (i.toLong, KernelBench.vecPublic(i.toLong)))
    val cents = Array.tabulate(Centroids)(KernelBench.basePublic)
    val indexed = VectorBlocks.assign(blocks, cents).cache()
    indexed.count()
    val probes = queries.map { case (_, qv) =>
      val scores = Array.tabulate(Centroids) { c =>
        val cv = cents(c)
        var s = 0.0; var i = 0
        while (i < Dim) { s += cv(i).toDouble * qv(i).toDouble; i += 1 }
        (c, s)
      }
      val mask = new Array[Boolean](Centroids)
      scores.sortBy(-_._2).take(NProbe).foreach { case (c, _) => mask(c) = true }
      mask
    }
    val sample = Array.tabulate(PqTrainSample) { j =>
      val v = KernelBench.vecPublic(j.toLong * (N / PqTrainSample))
      var bestC = 0; var bestS = Double.NegativeInfinity; var c = 0
      while (c < Centroids) {
        val cv = cents(c); var s = 0.0; var i = 0
        while (i < Dim) { s += cv(i).toDouble * v(i).toDouble; i += 1 }
        if (s > bestS) { bestS = s; bestC = c }
        c += 1
      }
      val cv = cents(bestC)
      Array.tabulate(Dim)(i => v(i) - cv(i))
    }
    var t0 = System.nanoTime()
    val codebook = PqTrain.trainComposite(sample, Dim, PqSubDim, PqCodebook, PqTrainIters)
    println(f"train: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    val encoded = VectorBlocks.encodePqResidual(indexed, cents, codebook, PqSubDim).cache()
    encoded.count()
    println(f"encode: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    for (pass <- 1 to 3) {
      t0 = System.nanoTime()
      val topR = VectorBlocks.adcTopRProbed(encoded, codebook, PqSubDim, queries, probes, PqRescore, cents)
      val tAdc = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val cands = topR.iterator.zipWithIndex.flatMap { case (ids, qi) =>
        ids.iterator.map(d => (queries(qi)._1, d))
      }.toArray
      val n = VectorBlocks.rescore(spark, blocks, queries, cands, K).count()
      val tRescore = (System.nanoTime() - t0) / 1e9
      println(f"pass $pass: adc+trim ${tAdc}%.2f s, rescore ${tRescore}%.2f s (rows $n)")
    }
    spark.stop()
  }
}
