package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.operators.Ann

/** Serving-quality monitor (round 12): [[Ann.recallProbeAt]] measures
  * sampled recall AT THE SERVING DIAL against the artifact's own
  * full-probe exact answers, and the streaming loop appends the
  * measurement series to `_recall_log` as data arrives.
  *
  * Planted geometry so every assertion is deterministic:
  *
  *  - 4 axis centroids; 200 base docs in tight per-axis clusters whose
  *    dial-1 recall is PERFECT (a base query's top-k never leaves its
  *    own list);
  *  - 12 "between" docs on the e0/e1 diagonal, built as 6 PAIRS: pair
  *    members are each other's nearest non-self neighbor by a wide
  *    margin (a shared private tilt dim), but a +0.02 bump sends the
  *    even member to list 0 and the odd to list 1 — so at dial 1 every
  *    between query MISSES its partner (cross-list by construction) and
  *    dial 2 recovers everything;
  *  - doc ids are allocated by the keyLcgU sampling order itself: the
  *    12 globally-smallest variates go to the between docs, the largest
  *    to the base corpus — so the nSample=12 probe provably samples
  *    exactly the between docs once they exist.
  */
class AnnQualityMonitorSpec extends SparkSpec {

  private val dim = 16
  private val K = 4
  private val NSample = 12

  private def lcgU(id: Long): Double =
    (((id * 1103515245L + 12345L) % 2147483648L) + 1.0) / 2147483649.0

  /** Id pool sorted by (lcgU, id) — the probe's exact sampling order. */
  private lazy val idsBySample: Seq[Long] =
    (0L until 5000L).sortBy(id => (lcgU(id), id))

  private def unit(axis: Int): Array[Float] =
    Array.tabulate(dim)(i => if (i == axis) 1.0f else 0.0f)

  private def normed(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x)).toFloat
    v.map(_ / n)
  }

  /** Base doc: unit axis + small tilt on dims 14/15. */
  private def baseDoc(axis: Int, i: Int): Array[Float] = {
    val v = unit(axis)
    v(14 + i % 2) = 0.25f
    normed(v)
  }

  /** Between doc `j` (pair j/2, parity j%2): e0+e1 diagonal, bump on
    * the parity axis (decides the assignment list), pair-private tilt
    * dim 8+(j/2) at weight 0.1 (makes pair members mutual nearest). */
  private def betweenDoc(j: Int): Array[Float] = {
    val v = new Array[Float](dim)
    v(0) = 1.0f; v(1) = 1.0f
    v(j % 2) += 0.02f
    v(8 + j / 2) = 0.1f
    normed(v)
  }

  private def buildBase(path: String): (Seq[Long], Seq[Long]) = {
    import spark.implicits._
    val betweenIds = idsBySample.take(NSample)
    val baseIds = idsBySample.takeRight(200)
    val cents = Array.tabulate(4)(c => (c.toLong, unit(c)))
    val base = baseIds.zipWithIndex.map { case (id, i) =>
      (id, baseDoc(i % 4, i), i % 3)
    }
    Ann.writeIndexArtifact(spark, path, spark.createDataset(base), cents)
    (betweenIds, baseIds)
  }

  test("probe on a well-clustered artifact: exact at full probe, dial-1 recommended, bounds ordered, deterministic") {
    val path = Files.createTempDirectory("graft_qmon").toString + "/idx"
    buildBase(path)
    val pr = Ann.recallProbeAt(spark, path, servingProbe = 1, nSample = NSample, k = K)
    assert(pr.nq == NSample)
    val trials = K.toLong * pr.nq
    // full-probe dial is exact by construction — overlap is total
    assert(pr.perDial.last._1 == 4 && pr.perDial.last._2 == trials)
    // tight clusters: dial 1 already perfect, so it is the recommendation
    assert(pr.osum == trials && pr.recommendedProbe == 1)
    assert(pr.est == 1.0 && pr.lo95 > 0.9 && pr.lo95 <= pr.est && pr.est <= pr.hi95)
    assert(pr.hi95 <= 1.0 + 1e-12)
    // deterministic: the LCG sample order and integer counts pin it
    val again = Ann.recallProbeAt(spark, path, servingProbe = 1, nSample = NSample, k = K)
    assert(again == pr)
  }

  test("planted cross-list pairs degrade dial-1 recall; the probe detects and recommends the wider dial") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_qmon2").toString + "/idx"
    val (betweenIds, _) = buildBase(path)
    Ann.addVectors(spark, path, spark.createDataset(
      betweenIds.zipWithIndex.map { case (id, j) => (id, betweenDoc(j), j % 3) }))
    // the 12 between docs hold the 12 smallest sampling variates — the
    // probe now measures exactly them
    val pr = Ann.recallProbeAt(spark, path, servingProbe = 1, nSample = NSample, k = K)
    val trials = K.toLong * pr.nq
    // every between query misses AT LEAST its partner at dial 1
    assert(pr.osum <= trials - NSample,
      s"dial-1 overlap too high for cross-list pairs: ${pr.osum}/$trials")
    assert(1000L * pr.osum < 950L * trials, "planted degradation must miss the target")
    assert(pr.est < 0.95 && pr.lo95 < pr.est && pr.hi95 < 1.0)
    // dial 2 probes both diagonal lists: everything recovers
    assert(pr.perDial.find(_._1 == 2).exists(_._2 == trials))
    assert(pr.recommendedProbe == 2)
    // the log round-trips and the consumer hook reads the latest row
    Ann.writeRecallLogAt(spark, path, batchId = 7L, pr)
    assert(Ann.latestRecommendedProbeAt(spark, path, default = 1) == 2)
    val row = Ann.recallLogAt(spark, path).collect()
    assert(row.length == 1 && row(0).getAs[Long]("batch_id") == 7L &&
      row(0).getAs[Long]("osum") == pr.osum)
    // an artifact never probed falls back to the declared default
    val fresh = Files.createTempDirectory("graft_qmon3").toString + "/idx"
    buildBase(fresh)
    assert(Ann.latestRecommendedProbeAt(spark, fresh, default = 3) == 3)
  }

  test("streaming loop: the quality series declines as the stream shifts the data, no manual probe anywhere") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val path = Files.createTempDirectory("graft_qmonstream").toString + "/idx"
    val (betweenIds, _) = buildBase(path)
    val docs = betweenIds.zipWithIndex.map { case (id, j) => (id, betweenDoc(j), j % 3) }
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Array[Float], Int)]
    val q = Ann.ingestStreamWithQualityMonitor(
      spark, path, stream.toDS(), servingProbe = 1, checkEvery = 2,
      nSample = NSample, k = K)
    try {
      docs.grouped(3).foreach { b => stream.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val log = Ann.recallLogAt(spark, path)
      .orderBy(col("batch_id"))
      .collect()
    // 4 micro-batches, checkEvery=2 -> measurements at batch ids 1 and 3
    assert(log.map(_.getAs[Long]("batch_id")).toSeq == Seq(1L, 3L))
    val est1 = log(0).getAs[Double]("est")
    val est3 = log(1).getAs[Double]("est")
    // more between docs in the sample -> dial-1 recall falls (ties
    // allowed only at the planted corner)
    assert(est3 <= est1, s"quality series should decline: $est1 -> $est3")
    assert(est3 < 0.95, s"end-of-stream dial-1 recall must miss the target: $est3")
    assert(log(1).getAs[Int]("recommended_probe") == 2)
  }
}
