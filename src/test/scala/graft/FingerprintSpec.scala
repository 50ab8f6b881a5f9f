package graft

import graft.operators.Fingerprint

/** The winnowing fingerprint contract: the rolling hash must equal the
  * positional Horner form (the oracle recomputes positionally, so this is
  * the engine-side half of that agreement), and winnowing must honor its
  * detection guarantee — any shared substring of ≥ W+K−1 chars yields a
  * shared fingerprint. */
class FingerprintSpec extends SparkSpec {

  private val P = Fingerprint.P
  private val Mix = 2654435761L
  private val K = Fingerprint.K
  private val W = Fingerprint.W

  /** Positional (naive, O(n·K)) reference of the gram hash chain. */
  private def naiveGramHashes(text: String): Array[Long] =
    Array.tabulate(math.max(0, text.length - K + 1)) { i =>
      var h = 0L
      var j = 0
      while (j < K) { h = (h * 31 + text.charAt(i + j)) % P; j += 1 }
      h * Mix % P
    }

  /** Reference winnow: distinct window minima of the naive hashes. */
  private def naiveFingerprints(text: String): Set[Long] = {
    val g = naiveGramHashes(text)
    if (g.length < W) Set.empty
    else (0 to g.length - W).map(j => g.slice(j, j + W).min).toSet
  }

  private def engineFingerprints(texts: Seq[String]): Map[Long, Set[Long]] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // same kernel, driven through a temp table shaped like documents
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("fp_spec").toString
    df.select($"doc_id", $"text", lit("en").as("lang"), lit("t").as("source"),
        length($"text").cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Fingerprint.fingerprints(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Seq[Long]]("f").toSet)
      .toMap
  }

  test("rolling kernel matches the positional reference on varied ASCII text") {
    val rng = new scala.util.Random(7)
    val texts = Seq.tabulate(30) { i =>
      val n = K + W - 1 + rng.nextInt(300)
      String.valueOf(Array.fill(n)((32 + rng.nextInt(95)).toChar))
    } :+ "x" * (K + W - 1) // degenerate: single repeated char
    val got = engineFingerprints(texts)
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == naiveFingerprints(t), s"doc $i mismatch")
    }
  }

  test("docs with fewer than W grams are absent") {
    val got = engineFingerprints(Seq("tiny", "a" * (K + W - 2), "long enough text here ok"))
    assert(!got.contains(0L) && !got.contains(1L) && got.contains(2L))
  }

  test("winnowing guarantee: a shared substring of W+K-1 chars shares a fingerprint") {
    val rng = new scala.util.Random(13)
    def rand(n: Int) = String.valueOf(Array.fill(n)(('a' + rng.nextInt(26)).toChar))
    val common = rand(W + K - 1)
    (1 to 20).foreach { _ =>
      val a = rand(40) + common + rand(40)
      val b = rand(40) + common + rand(40)
      val fa = naiveFingerprints(a)
      val fb = naiveFingerprints(b)
      assert((fa intersect fb).nonEmpty, s"guarantee violated for common=$common")
    }
  }

  test("q49 finds the planted near-dup pairs and none below threshold") {
    import spark.implicits._
    val rows = SparkEntry.queries("q49_winnow_fingerprint")(spark, sf0001)
      .select($"sim").as[Double].collect()
    assert(rows.nonEmpty, "no overlap pairs at sf0.001")
    assert(rows.forall(_ >= Fingerprint.Tau))
  }

  test("balanced sample: exactly N per class, deterministic under partitioning") {
    import spark.implicits._
    def run(): Seq[(String, Long)] =
      SparkEntry.queries("q50_balanced_sample")(spark, sf0001)
        .select($"lang", $"doc_id").as[(String, Long)].collect().toSeq.sorted
    val a = run()
    val perClass = a.groupBy(_._1).view.mapValues(_.size).toMap
    val available = Tables(spark, sf0001, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    perClass.foreach { case (lang, n) =>
      assert(n == math.min(operators.Sampling.BalancedPerClass.toLong, available(lang)))
    }
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "5")
      assert(run() == a, "balanced sample changed under different partitioning")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
