package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, QModule, Tables}

/** Document fingerprinting by ROLLING-HASH WINNOWING (the MOSS scheme:
  * Schleimer/Wilkerson/Aiken, "Winnowing: Local Algorithms for Document
  * Fingerprinting", SIGMOD 2003) — the classic content-defined
  * fingerprint an LLM-data pipeline uses for plagiarism-style overlap
  * detection, complementing the set-similarity family (q22 shingle
  * Jaccard, q23 MinHash, q24 SimHash): winnowing GUARANTEES any shared
  * substring of ≥ [[W]]+[[K]]−1 chars produces a shared fingerprint,
  * a positional-containment property the word-shingle detectors don't
  * give.
  *
  * Pipeline: per document, the Rabin-Karp rolling hash of every [[K]]-char
  * gram (base-31 Horner chain mod [[P]], O(1) per position via the
  * leading-char subtraction — O(n) per doc, not O(n·K)), a Knuth
  * multiplicative mix, then winnowing: the minimum of every [[W]]
  * consecutive gram hashes, deduplicated into the doc's fingerprint SET
  * (the value-set variant; ~2/(W+1) of grams survive, so downstream
  * join traffic is ~2.5× lighter than an all-gram index).
  *
  * Overlap pairs then come from the same scale shape as q22: explode the
  * fingerprint sets, equi-join on the fingerprint VALUE (an inverted
  * index — pairs sharing nothing never meet), count shared values per
  * pair, and compute the winnow similarity |Fa∩Fb| / |Fa∪Fb| from the
  * set sizes. At 100 TB the posting lists take the same df-cap as
  * [[TextPipeline.jaccardPairsCapped]]; the fixture distribution needs
  * no cap (max posting-list length is single-digit).
  *
  * Cross-engine contract: the hash is plain modular arithmetic (like
  * [[graft.functions.PortableHash]] — per-step values stay < 2^37 and
  * the final mix < 5.7e18 < 2^63, so no overflow in Spark ANSI or
  * DuckDB BIGINT; fixtures are pure ASCII so `charAt` == `ascii()`).
  * The oracle recomputes every gram hash POSITIONALLY (one Horner sum
  * per gram) — algebraically identical to the engine's rolling update,
  * so agreement also proves the O(n) incremental form correct.
  */
object Fingerprint extends QModule {

  /** Chars per gram (the noise threshold: matches shorter than K chars
    * are never detected). */
  val K = 8

  /** Winnow window in grams — any match of ≥ W+K−1 = 11 chars is
    * guaranteed to share a fingerprint. */
  val W = 4

  /** Winnow-similarity report threshold (fixture near-dups sit ≥ 0.91;
    * unrelated docs ≤ 0.05 — anywhere in between is equivalent). */
  val Tau = 0.5

  val P = 2147483647L
  private val Mix = 2654435761L

  private def docs(s: SparkSession, d: String) = Tables(s, d, "documents")

  /** (doc_id, f) winnowing fingerprint sets (sorted LongArray), via the
    * O(n)-per-doc rolling kernel. Docs with fewer than [[W]] grams carry
    * no fingerprint and are absent. Memoized per (session, dir). */
  def fingerprints(s: SparkSession, d: String): DataFrame =
    graft.Memo.cached(s, s"winnow-fp:$d")(computeFingerprints(s, d))

  private def computeFingerprints(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // 31^(K-1) mod P — the rolling leading-char weight
    val pow = { var p = 1L; var i = 0; while (i < K - 1) { p = p * 31 % P; i += 1 }; p }
    docs(s, d)
      .select($"doc_id", $"text")
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, text) =>
          val n = if (text == null) 0 else text.length
          val nGrams = n - K + 1
          if (nGrams < W) Iterator.empty
          else {
            val mixed = new Array[Long](nGrams)
            var h = 0L
            var i = 0
            while (i < K) { h = (h * 31 + text.charAt(i)) % P; i += 1 }
            mixed(0) = h * Mix % P
            var g = 1
            while (g < nGrams) {
              // drop char g-1 (weight 31^(K-1)), shift, add char g+K-1;
              // +P keeps the subtraction non-negative under %
              h = ((h - text.charAt(g - 1) * pow % P + P) % P * 31 + text.charAt(g + K - 1)) % P
              mixed(g) = h * Mix % P
              g += 1
            }
            val set = scala.collection.mutable.SortedSet.empty[Long]
            var j = 0
            while (j + W <= nGrams) {
              var m = mixed(j)
              var t = 1
              while (t < W) { val v = mixed(j + t); if (v < m) m = v; t += 1 }
              set += m
              j += 1
            }
            Iterator.single((id, set.toArray))
          }
        }
      }
      .toDF("doc_id", "f")
  }

  /** Overlap pairs with winnow similarity ≥ tau via the inverted-index
    * join (no all-pairs comparison — the join key is the fingerprint). */
  def winnowPairs(s: SparkSession, d: String, tau: Double): DataFrame = {
    import s.implicits._
    val fps = fingerprints(s, d)
    val sizes = fps.select($"doc_id", size($"f").cast("long").as("nf"))
    val tok = fps.select($"doc_id", explode($"f").as("fp"))
    tok.select($"doc_id".as("doc_a"), $"fp")
      .join(tok.select($"doc_id".as("doc_b"), $"fp"), Seq("fp"))
      .filter($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("shared"))
      .join(broadcast(sizes.select($"doc_id".as("doc_a"), $"nf".as("na"))), Seq("doc_a"))
      .join(broadcast(sizes.select($"doc_id".as("doc_b"), $"nf".as("nb"))), Seq("doc_b"))
      .withColumn("sim_raw", $"shared".cast("double") / ($"na" + $"nb" - $"shared"))
      .filter($"sim_raw" >= tau)
      .select($"doc_a", $"doc_b", $"shared", round($"sim_raw", 4).as("sim"))
      .orderBy($"doc_a", $"doc_b")
  }

  // ------------------------------------------------------------ oracle SQL
  /** Positional (non-rolling) form of the same gram hash: one Horner sum
    * per start position. Per-gram sum ≤ 127·Σ31^t ≈ 3.6e12 — a single
    * mod P at the end is overflow-safe. */
  private val duckGramHash: String = {
    val horner = (0 until K)
      .map(j => s"CAST(ascii(substring(text, i + $j, 1)) AS BIGINT) * ${math.pow(31, K - 1 - j).toLong}")
      .mkString(" + ")
    s"((($horner) % $P) * $Mix) % $P"
  }

  // ---------------------------------------------------------------- q49
  private val q49 = Q(
    "q49_winnow_fingerprint",
    (s, d) => winnowPairs(s, d, Tau),
    Some(s"""WITH grams AS (
        SELECT doc_id, [ $duckGramHash
                         for i in range(1, length(text) - $K + 2) ] AS g
        FROM documents WHERE length(text) >= $K),
      fp AS (
        SELECT doc_id, list_distinct([ list_min(g[j:j+${W - 1}])
                                       for j in range(1, len(g) - $W + 2) ]) AS f
        FROM grams WHERE len(g) >= $W),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_intersect(a.f, b.f)) AS shared, len(a.f) AS na, len(b.f) AS nb
        FROM fp a, fp b WHERE a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, CAST(shared AS BIGINT) AS shared,
           round(CAST(shared AS DOUBLE) / (na + nb - shared), 4) AS sim
    FROM pairs WHERE CAST(shared AS DOUBLE) / (na + nb - shared) >= $Tau
    ORDER BY doc_a, doc_b"""))

  override def all: Seq[Q] = Seq(q49)
}
