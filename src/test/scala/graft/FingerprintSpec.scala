package graft

import graft.operators.Fingerprint

/** The winnowing fingerprint contract: the rolling hash must equal the
  * positional Horner form over UNICODE CODE POINTS (the oracle recomputes
  * positionally on DuckDB's code-point-indexed substring/ascii, so this
  * is the engine-side half of that agreement — including outside ASCII),
  * winnowing must honor its detection guarantee (any shared run of ≥
  * W+K−1 points yields a shared fingerprint), the registered df-capped
  * pair query must reproduce the exact pair set an independent naive
  * implementation finds, and capped ≡ uncapped on the fixtures. */
class FingerprintSpec extends SparkSpec {

  private val P = Fingerprint.P
  private val Mix = 2654435761L
  private val K = Fingerprint.K
  private val W = Fingerprint.W

  /** Positional (naive, O(n·K)) reference of the gram hash chain, on
    * code points — the oracle's exact arithmetic. */
  private def naiveGramHashes(text: String): Array[Long] = {
    val cp = text.codePoints().toArray
    Array.tabulate(math.max(0, cp.length - K + 1)) { i =>
      var h = 0L
      var j = 0
      while (j < K) { h = (h * 31 + cp(i + j)) % P; j += 1 }
      h * Mix % P
    }
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

  test("rolling kernel matches the positional reference beyond ASCII (BMP + astral)") {
    // accented Latin, CJK, and astral emoji (UTF-16 surrogate pairs) —
    // the texts where charAt-based hashing diverges from code points
    val rng = new scala.util.Random(11)
    val pools = Array((0x20, 0x7e), (0xc0, 0x17f), (0x4e00, 0x4fff), (0x1f300, 0x1f64f))
    val texts = Seq.tabulate(20) { _ =>
      val n = K + W - 1 + rng.nextInt(120)
      val sb = new java.lang.StringBuilder
      (0 until n).foreach { _ =>
        val (lo, hi) = pools(rng.nextInt(pools.length))
        sb.appendCodePoint(lo + rng.nextInt(hi - lo + 1))
      }
      sb.toString
    } :+ ("café déjà vu 中文测试 " + new String(Character.toChars(0x1f600)) + " ") * 3
    // the astral pool guarantees surrogate pairs: code-point length < char length
    assert(texts.exists(t => t.codePointCount(0, t.length) < t.length))
    val got = engineFingerprints(texts)
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got.getOrElse(i.toLong, Set.empty[Long]) == naiveFingerprints(t), s"doc $i mismatch")
    }
  }

  test("docs with fewer than W grams are absent") {
    val got = engineFingerprints(Seq(
      "tiny",
      "a" * (K + W - 2), // exactly W-1 grams
      "long enough text for at least one winnow window here"))
    assert(!got.contains(0L) && !got.contains(1L) && got.contains(2L))
  }

  test("winnowing guarantee: a shared substring of W+K-1 points shares a fingerprint") {
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

  /** All qualifying pairs by brute force over the naive per-doc sets —
    * no inverted index, no cap, no Spark: the fully independent path. */
  private def naivePairs(dir: String): Set[(Long, Long, Long, Double)] = {
    import spark.implicits._
    val fps = Tables(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => id -> naiveFingerprints(t) }
      .filter(_._2.nonEmpty)
      .sortBy(_._1)
    (for {
      i <- fps.indices.iterator
      j <- (i + 1) until fps.length
      (ida, fa) = fps(i)
      (idb, fb) = fps(j)
      shared = (fa intersect fb).size.toLong
      if shared > 0
      sim = shared.toDouble / (fa.size + fb.size - shared)
      if sim >= Fingerprint.Tau
    } yield (ida, idb, shared, BigDecimal(sim).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
  }

  test("q49 reports exactly the naive-reference pair set (identities, counts, sims)") {
    import spark.implicits._
    val expected = naivePairs(sf0001)
    assert(expected.nonEmpty, "fixture lost its planted near-dups")
    val got = SparkEntry.queries("q49_winnow_fingerprint")(spark, sf0001)
      .select($"doc_a", $"doc_b", $"shared", $"sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == expected,
      s"missing=${expected -- got} spurious=${got -- expected}")
  }

  test("df-capped pairs equal the uncapped pairs on the fixtures") {
    import spark.implicits._
    Seq(sf0001, sf001).foreach { d =>
      val capped = Fingerprint.winnowPairsCapped(spark, d, Fingerprint.Tau, Fingerprint.DfCap)
        .as[(Long, Long, Long, Double)].collect().toSet
      val uncapped = Fingerprint.winnowPairs(spark, d, Fingerprint.Tau)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(capped == uncapped, s"cap lost pairs at $d: ${uncapped -- capped}")
    }
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
