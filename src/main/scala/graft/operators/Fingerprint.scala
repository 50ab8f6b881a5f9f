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
  * substring of ≥ [[W]]+[[K]]−1 code points produces a shared
  * fingerprint, a positional-containment property the word-shingle
  * detectors don't give.
  *
  * Pipeline: per document, the Rabin-Karp rolling hash of every [[K]]-code
  * -point gram (base-31 Horner chain mod [[P]], O(1) per position via the
  * leading-point subtraction — O(n) per doc, not O(n·K)), a Knuth
  * multiplicative mix, then winnowing: the minimum of every [[W]]
  * consecutive gram hashes, deduplicated into the doc's fingerprint SET
  * (the value-set variant; ~2/(W+1) ≈ 12% of grams survive — the
  * MOSS-realistic density; round-6 VERDICT: the old W=4 kept ~40% of
  * grams and made the pair join the suite's hottest stage).
  *
  * Overlap pairs come from the DF-CAPPED inverted index, the same 100 TB
  * shape as [[TextPipeline.jaccardPairsCapped]] (round-6 VERDICT wrong
  * #1: the uncapped fingerprint self-join was the suite's one remaining
  * scale-killer): candidate pairs are generated only from posting lists
  * with document frequency ≤ [[DfCap]] — candidate rows ≤ DfCap × Σdf,
  * never Σdf², so one hot boilerplate fingerprint can't go quadratic —
  * and every candidate is then verified EXACTLY against the two FULL
  * fingerprint sets, so reported similarities are always exact.
  *
  * Completeness condition: a qualifying pair is missed only if EVERY
  * fingerprint it shares has df > DfCap. [[K]] = 20-point grams make
  * shared-content fingerprints specific: measured on the fixtures, the
  * largest per-pair minimum shared-df is 4 (at sf0.001/0.01/0.1 alike)
  * and the largest posting list is 29, so [[DfCap]] = 32 is lossless
  * there — asserted against the uncapped [[winnowPairs]] in
  * FingerprintSpec. At production scale, pick DfCap from the observed df
  * distribution the same way. (The old K=8 grams were so unspecific on a
  * small vocabulary that some true near-dup pairs shared only df>100
  * fingerprints — no small cap could be lossless; longer grams fix the
  * cause rather than tuning around it.)
  *
  * Cross-engine contract: the hash is over UNICODE CODE POINTS — the
  * engine iterates `codePoints()`, matching DuckDB's code-point-indexed
  * `substring`/`ascii` exactly, so non-ASCII text (including astral
  * pairs) hashes identically in both engines (round-6 VERDICT wrong #2:
  * hashing UTF-16 units via `charAt` silently diverged from the oracle
  * outside ASCII). Plain modular arithmetic, no overflow anywhere: a
  * code point is < 2^21, so h·31 + cp < 2^37, cp·pow < 2^52, and the
  * final mix < 5.7e18 < 2^63 — safe in Spark ANSI and DuckDB BIGINT.
  * The oracle recomputes every gram hash POSITIONALLY (one Horner sum
  * per gram, weights pre-reduced mod P — 31^19 itself would overflow
  * BIGINT) — algebraically identical to the engine's rolling update, so
  * agreement also proves the O(n) incremental form correct.
  */
object Fingerprint extends QModule {

  /** Code points per gram (the noise threshold: matches shorter than K
    * points are never detected — MOSS-typical for text). */
  val K = 20

  /** Winnow window in grams — any match of ≥ W+K−1 = 35 code points is
    * guaranteed to share a fingerprint. */
  val W = 16

  /** Winnow-similarity report threshold (fixture near-dups sit ≥ 0.5;
    * unrelated docs ≤ 0.13 across all fixture SFs). */
  val Tau = 0.5

  /** Posting lists longer than this are dropped from candidate
    * generation (lossless on the fixtures — see class doc). */
  val DfCap = 32

  val P = 2147483647L
  private val Mix = 2654435761L

  /** 31^(K-1) mod P — the rolling leading-point weight. */
  private val Pow = { var p = 1L; var i = 0; while (i < K - 1) { p = p * 31 % P; i += 1 }; p }

  private def docs(s: SparkSession, d: String) = Tables(s, d, "documents")

  /** (doc_id, f) winnowing fingerprint sets (sorted LongArray), via the
    * O(n)-per-doc rolling kernel. Docs with fewer than [[W]] grams carry
    * no fingerprint and are absent. Memoized per (session, dir). */
  def fingerprints(s: SparkSession, d: String): DataFrame =
    graft.Memo.cached(s, s"winnow-fp:$d")(computeFingerprints(s, d))

  private def computeFingerprints(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    docs(s, d)
      .select($"doc_id", $"text")
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, text) =>
          val cp = if (text == null) Array.empty[Int] else text.codePoints().toArray
          val n = cp.length
          val nGrams = n - K + 1
          if (nGrams < W) Iterator.empty
          else {
            val mixed = new Array[Long](nGrams)
            var h = 0L
            var i = 0
            while (i < K) { h = (h * 31 + cp(i)) % P; i += 1 }
            mixed(0) = h * Mix % P
            var g = 1
            while (g < nGrams) {
              // drop point g-1 (weight 31^(K-1)), shift, add point g+K-1;
              // +P keeps the subtraction non-negative under %
              h = ((h - cp(g - 1) * Pow % P + P) % P * 31 + cp(g + K - 1)) % P
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

  /** UNCAPPED overlap pairs — the equivalence oracle for
    * [[winnowPairsCapped]] in FingerprintSpec, NOT registered: the plain
    * inverted-index self-join goes quadratic on a hot fingerprint. */
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

  /** The 100 TB form (registered as q49): candidate pairs from posting
    * lists with 2 ≤ df ≤ dfCap — ONE aggregation builds each list and
    * the pairs explode out of the (≤ dfCap)-sized lists in place, no
    * second shuffle of the token frame through a self-join — then each
    * candidate is exact-verified against the FULL fingerprint sets, so
    * `shared`/`sim` are exact despite the cap. */
  def winnowPairsCapped(s: SparkSession, d: String, tau: Double, dfCap: Int): DataFrame = {
    import s.implicits._
    val fps = fingerprints(s, d)
    val cand = fps
      .select($"doc_id", explode($"f").as("fp"))
      .groupBy($"fp")
      .agg(collect_list($"doc_id").as("docs"))
      .filter(size($"docs").between(2, dfCap))
      .select(array_sort($"docs").as("docs")) // own projection — see Postings.pairStructs
      .select(explode(Postings.pairStructs($"docs")).as("pair"))
      .select($"pair.doc_a", $"pair.doc_b")
      .distinct()
    cand
      .join(fps.select($"doc_id".as("doc_a"), $"f".as("fa")), Seq("doc_a"))
      .join(fps.select($"doc_id".as("doc_b"), $"f".as("fb")), Seq("doc_b"))
      .select($"doc_a", $"doc_b",
        // fingerprint arrays are sorted-distinct by construction
        // (SortedSet.toArray in computeFingerprints) — the merge-count
        // kernel replaces array_intersect's per-pair hash-set build
        // (round 16; see graft.functions.SortedLongIntersectSize)
        org.apache.spark.sql.GraftInternal.column(
          graft.functions.SortedLongIntersectSize(
            org.apache.spark.sql.GraftInternal.expression($"fa"),
            org.apache.spark.sql.GraftInternal.expression($"fb")))
          .cast("long").as("shared"),
        size($"fa").cast("long").as("na"),
        size($"fb").cast("long").as("nb"))
      .withColumn("sim_raw", $"shared".cast("double") / ($"na" + $"nb" - $"shared"))
      .filter($"sim_raw" >= tau)
      .select($"doc_a", $"doc_b", $"shared", round($"sim_raw", 4).as("sim"))
      .orderBy($"doc_a", $"doc_b")
  }

  // ------------------------------------------------------------ oracle SQL
  /** Positional (non-rolling) form of the same gram hash: one Horner sum
    * per start position, weights pre-reduced mod P (31^19 overflows
    * BIGINT as a literal). Each term is < 2^21 · P < 4.7e15 and the
    * K-term sum < 9.4e16 — a single mod P at the end is overflow-safe.
    * DuckDB's `substring`/`ascii` index CODE POINTS, matching the
    * engine's `codePoints()` iteration on any Unicode text. */
  private val duckGramHash: String = {
    val weights = Iterator.iterate(1L)(_ * 31 % P).take(K).toArray.reverse
    val horner = (0 until K)
      .map(j => s"CAST(ascii(substring(text, i + $j, 1)) AS BIGINT) * ${weights(j)}")
      .mkString(" + ")
    s"((($horner) % $P) * $Mix) % $P"
  }

  // ---------------------------------------------------------------- q49
  /** The oracle mirrors the df-cap (like q22/q46/q48, ADVICE r4: a capped
    * engine under an uncapped oracle only agrees where the cap is
    * lossless; mirroring makes agreement hold by construction — the
    * capped≡uncapped equivalence itself is asserted in FingerprintSpec). */
  private val q49 = Q(
    "q49_winnow_fingerprint",
    (s, d) => winnowPairsCapped(s, d, Tau, DfCap),
    Some(s"""WITH grams AS (
        SELECT doc_id, [ $duckGramHash
                         for i in range(1, length(text) - $K + 2) ] AS g
        FROM documents WHERE length(text) >= $K),
      fp AS (
        SELECT doc_id, list_distinct([ list_min(g[j:j+${W - 1}])
                                       for j in range(1, len(g) - $W + 2) ]) AS f
        FROM grams WHERE len(g) >= $W),
      tok AS (SELECT doc_id, unnest(f) AS fp FROM fp),
      dfreq AS (SELECT fp, count(*) AS n FROM tok GROUP BY fp),
      rare AS (SELECT t.doc_id, t.fp FROM tok t JOIN dfreq USING (fp)
               WHERE dfreq.n BETWEEN 2 AND $DfCap),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM rare a JOIN rare b USING (fp) WHERE a.doc_id < b.doc_id),
      pairs AS (
        SELECT c.doc_a, c.doc_b,
               len(list_intersect(fa.f, fb.f)) AS shared, len(fa.f) AS na, len(fb.f) AS nb
        FROM cand c
        JOIN fp fa ON fa.doc_id = c.doc_a
        JOIN fp fb ON fb.doc_id = c.doc_b)
    SELECT doc_a, doc_b, CAST(shared AS BIGINT) AS shared,
           round(CAST(shared AS DOUBLE) / (na + nb - shared), 4) AS sim
    FROM pairs WHERE CAST(shared AS DOUBLE) / (na + nb - shared) >= $Tau
    ORDER BY doc_a, doc_b"""))

  override def all: Seq[Q] = Seq(q49)
}
