package graft.tools

import graft.{GraftSession, KernelBench}
import graft.operators.VectorBlocks

/** Decomposes the timed `ann_build_sec` window (VERDICT r8 "what's wrong"
  * #2: 3.6 s → 13.0 s between rounds) into its two phases so the STATUS
  * root-cause is measured, not guessed:
  *
  *   1. `trainCoarse` — driver-side sample k-means over
  *      coarseTrainSample × centroids × dim × iters (new in r8; r7
  *      borrowed the synthetic generator's own cluster bases, an oracle
  *      quantizer no real corpus provides), plus the strided sample
  *      materialization itself;
  *   2. `assign` — the distributed block-level argmax-dot pass + cache
  *      materialization over the full corpus.
  *
  * Run: sbt "runMain graft.tools.BuildProbe" */
object BuildProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    val cfg = KernelBench.Default

    val corpus = spark.range(cfg.n.toLong)
      .map(id => (id, KernelBench.vec(cfg, id)))
      .toDF("id", "vec")
      .as[(Long, Array[Float])]
    val blocks = VectorBlocks.pack(corpus, cfg.dim).cache()
    blocks.count()

    (1 to 3).foreach { pass =>
      val t0 = System.nanoTime()
      val cents = KernelBench.trainCoarse(cfg)
      val t1 = System.nanoTime()
      val indexed = VectorBlocks.assign(blocks, cents).cache()
      indexed.count()
      val t2 = System.nanoTime()
      println(f"BUILDPROBE pass=$pass trainCoarse=${(t1 - t0) / 1e9}%.2fs assign+cache=${(t2 - t1) / 1e9}%.2fs total=${(t2 - t0) / 1e9}%.2fs")
      indexed.unpersist(blocking = true)
    }
    spark.stop()
  }
}
