package graft

import java.nio.file.Files

import graft.operators.Ann

/** Planted-skew rebalance (VERDICT r8 next #5): build an artifact with
  * one hot inverted list (the skew v32's imbalance factor exists to
  * catch), run [[Ann.rebalanceIndex]], and pin the contract — imbalance
  * drops below τ, probe-cost variance narrows, no doc is lost or
  * duplicated, untouched lists stay frozen, and the add lifecycle keeps
  * working against the post-split quantizer. */
class AnnRebalanceSpec extends SparkSpec {

  private val dim = 16

  private def unit(axis: Int): Array[Float] =
    Array.tabulate(dim)(i => if (i == axis) 1.0f else 0.0f)

  /** Unit vector near `axis` with a deterministic tilt toward `tilt`. */
  private def near(axis: Int, tilt: Int, w: Float): Array[Float] = {
    val v = unit(axis)
    v(tilt) = w
    val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x)).toFloat
    v.map(_ / n)
  }

  test("rebalance splits the hot list: imbalance below tau, variance narrows, lifecycle intact") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_rebalance").toString + "/idx"
    // 4 axis centroids; list 0 is HOT: 240 docs in 3 genuine sub-clusters
    // (tilted toward axes 4/5/6), lists 1-3 hold 60 docs each
    val cents = Array.tabulate(4)(c => (c.toLong, unit(c)))
    val hot = (0 until 240).map { i =>
      (i.toLong, near(0, 4 + i % 3, 0.35f + 0.01f * (i % 5)), i % 4)
    }
    val cold = (0 until 180).map { i =>
      (1000L + i, near(1 + i % 3, 8 + i % 4, 0.2f), i % 4)
    }
    val corpus = spark.createDataset(hot ++ cold)
    Ann.writeIndexArtifact(spark, path, corpus, cents)

    val tau = 2.0
    val r = Ann.rebalanceIndex(spark, path, tau = tau)
    // the hot list (240 > tau * mean = 2 * 105) is the one split
    assert(r.splitLists == Seq(0L), s"expected only list 0 split, got ${r.splitLists}")
    assert(r.listSizesBefore(0L) == 240 && r.listSizesBefore.size == 4)
    // imbalance: drops strictly, and below tau
    assert(r.imbalanceAfter < r.imbalanceBefore,
      s"imbalance did not drop: ${r.imbalanceBefore} -> ${r.imbalanceAfter}")
    assert(r.imbalanceAfter < tau,
      s"imbalance still above tau: ${r.imbalanceAfter}")
    // probe-cost variance narrows: stddev of list sizes shrinks
    def stddev(m: Map[Long, Long]): Double = {
      val vs = m.values.map(_.toDouble)
      val mu = vs.sum / vs.size
      math.sqrt(vs.map(v => (v - mu) * (v - mu)).sum / vs.size)
    }
    assert(stddev(r.listSizesAfter) < stddev(r.listSizesBefore),
      s"list-size spread did not narrow: ${r.listSizesBefore} -> ${r.listSizesAfter}")
    // no doc lost or duplicated; untouched lists frozen
    val docsAfter = spark.read.parquet(path).select($"doc_id").as[Long].collect()
    assert(docsAfter.length == 420 && docsAfter.toSet.size == 420)
    Seq(1L, 2L, 3L).foreach { cid =>
      assert(r.listSizesAfter(cid) == 60L, s"untouched list $cid changed")
    }
    assert(!r.listSizesAfter.contains(0L), "split list 0 should be gone")
    // quantizer sidecar follows the split: old id out, sub-ids in, all unit
    val cs = spark.read.parquet(s"$path/_centroids")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    assert(!cs.map(_._1).contains(0L))
    assert(cs.length == 3 + r.listSizesAfter.size - 3)
    cs.filter(_._1 >= 4L).foreach { case (cid, v) =>
      val nrm = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x))
      assert(math.abs(nrm - 1.0) < 1e-5, s"sub-centroid $cid not unit-norm: $nrm")
    }
    // idempotent at this tau: a second pass finds nothing oversized
    val r2 = Ann.rebalanceIndex(spark, path, tau = tau)
    assert(r2.splitLists.isEmpty && r2.listSizesAfter == r.listSizesAfter)
    // the add lifecycle keeps working against the post-split quantizer:
    // a new hot-cluster doc lands in one of the SUB-lists
    val delta = spark.createDataset(Seq((5000L, near(0, 4, 0.35f), 1)))
    Ann.addVectors(spark, path, delta)
    val landed = spark.read.parquet(path)
      .withColumn("centroid_id", org.apache.spark.sql.functions.col("centroid_id").cast("long"))
      .filter($"doc_id" === 5000L)
      .select($"centroid_id").as[Long].collect()
    assert(landed.length == 1 && landed(0) >= 4L,
      s"post-rebalance add landed in ${landed.toSeq}, expected a sub-list id >= 4")
  }
}
