package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, QModule, Tables}

/** The LLM-training-data pipeline operators over the `documents` table:
  * deduplication (exact fingerprint, n-gram Jaccard, MinHash+LSH,
  * embedding-cosine), text analysis (language-ID heuristic, quality
  * scoring, token counting), all engineered in the bucketed/inverted-index
  * shapes that survive 100 TB — NO all-pairs crossJoin anywhere.
  *
  * Portability contract for the oracle: every hash used here is defined in
  * plain arithmetic both engines evaluate identically — md5 hex for exact
  * fingerprints, and a byte-polynomial hash (first 8 chars, base 31, then
  * a Knuth multiplicative mix mod 2^32) for shingles. The fixture text is
  * ASCII, so `ascii(substring(...))` agrees across engines.
  */
object TextPipeline extends QModule {

  private def docs(s: SparkSession, d: String) = Tables(s, d, "documents")

  // --------------------------------------------------------------- shared
  /** Distinct word-3-gram shingles of `text` (the near-dup unit; word
    * unigrams are useless on small vocabularies — measured: median
    * unigram-set Jaccard on the fixture is 0.63, while 3-gram background
    * is 0.024 with planted dups ≥ 0.5). */
  /** Public seam: the word-3-gram shingle set of a raw text column (pure
    * exprs — stream-safe). */
  def shingleArray(text: Column): Column = shingles(text)

  // ONE-PASS codegen shingle kernel (round 16, guide §1.2): the former
  // interpreted `transform(sequence(…), i => concat_ws(…))` HOF evaluated
  // per-shingle through CodegenFallback — a top task-CPU frame of the
  // whole near-dup family. graft.functions.WordTriShingles is pinned
  // value-equal (incl. array_distinct's first-occurrence order) by
  // GramCodesSpec; oracle SQL unchanged.
  private def shingleOf(ws: Column): Column =
    org.apache.spark.sql.GraftInternal.column(
      graft.functions.WordTriShingles(
        org.apache.spark.sql.GraftInternal.expression(ws)))

  private def shingles(text: Column): Column =
    shingleOf(split(trim(text), "\\s+"))

  /** (doc_id, s) shingle frame. The tokenization is a SEPARATE projection
    * from the shingle lambda: inside a higher-order function Catalyst
    * re-evaluates free subexpressions per array element, so inlining
    * `split(text)` there re-splits the document for every shingle term
    * (~4.5M splits at sf0.1, measured 9 s); with `ws` bound one projection
    * below, it is computed once per row (CollapseProject keeps expensive
    * multiply-referenced projections separate). */
  /** One cached shingle frame per (session, dir) — q22/q23/q24 and the
    * capped variant all consume the identical projection; without the memo
    * each query materialized and cached its own copy (3× storage in a
    * Verify/Bench session that runs them all). */
  private def shingleFrameCached(s: SparkSession, d: String): DataFrame =
    graft.Memo.cached(s, s"shingles:$d")(shingleFrame(s, d))

  // bench-truth probe seams (tools.PpjoinProbe stage-splits q79)
  private[graft] def shingleProbeFrame(s: SparkSession, d: String): DataFrame =
    shingleFrameCached(s, d)
  private[graft] def shingleHashProbe(x: Column): Column = shingleHash(x)

  private def shingleFrame(s: SparkSession, d: String): DataFrame =
    shingleFrameOf(s, docs(s, d))

  /** Rebalance a documents-shaped frame BEFORE a heavy per-row
    * expansion, but ONLY when the input arrives under-parallel: a small
    * doc table is one input split (maxPartitionBytes ≫ file size) and
    * AQE never splits a generator's input, so without this every
    * shingle/gram expansion runs on ONE task (measured on q62: 25 s →
    * 9.5 s cold at sf0.1). At real corpus scale the scan has thousands
    * of natural splits and the guard skips the shuffle — an
    * unconditional corpus repartition would be pure overhead there. */
  private[graft] def rebalanced(docsDf: DataFrame): DataFrame = {
    val target = docsDf.sparkSession.sessionState.conf.numShufflePartitions
    // EXPLICIT partition count (round 16): `repartition(col)` with no N
    // is an AQE-coalescible exchange, and on a KB-scale doc table AQE's
    // 1 MB minPartitionSize folds it back to 1-2 partitions — exactly
    // the single-task expansion this helper exists to prevent (q63
    // measured 15 one-task stages with the N-less form). An explicit N
    // pins the fan-out; `target` tracks the session's shuffle
    // parallelism, so the value stays scale- and host-adaptive.
    if (docsDf.rdd.getNumPartitions * 2 < target) docsDf.repartition(target, col("doc_id"))
    else docsDf
  }

  /** (doc_id, s) shingle frame over an arbitrary documents-shaped frame
    * (doc_id, text) — the seam q56 and the specs share with the
    * dir-loading path above. */
  private[graft] def shingleFrameOf(s: SparkSession, docsDf: DataFrame): DataFrame = {
    import s.implicits._
    rebalanced(docsDf)
      .select($"doc_id", shingles($"text").as("s"))
  }

  private val duckShingles =
    """toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
      sh AS (
        SELECT doc_id,
               list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                              for i in range(1, len(ws) - 1)]) AS s
        FROM toks)"""

  /** Portable shingle hash in [0, 2^31−1) — see
    * [[graft.functions.PortableHash]] for the cross-engine contract. */
  private def shingleHash(x: Column): Column = graft.functions.PortableHash.hash(x)

  /** Per-doc SORTED shingle-hash set (doc_id, sh: array<long>) — the
    * verify-side frame q22/q23/q79 share (round 16). Exact verification
    * on hash sets instead of string sets rests on the SAME injectivity
    * contract the prefix filter already declares (see [[ppjoinPairs]]'s
    * note: 24-char PortableHash injective on the corpus vocabulary ⇒
    * hash-set Jaccard ≡ string-set Jaccard exactly), guarded by the same
    * gates (pp≡exact and capped≡uncapped specs, the shared q22 oracle).
    * Sorting enables the zero-allocation merge kernel
    * ([[graft.functions.SortedLongIntersectSize]]) in place of
    * `array_intersect`'s per-pair hash-set build — sampled as the
    * family's top task-CPU frames. */
  private def shingleHashFrameCached(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.Memo.cached(s, s"shingle-hashes:$d")(
      shingleFrameCached(s, d)
        .select($"doc_id", sort_array(transform($"s", x => shingleHash(x))).as("sh")))
  }

  /** Shared exact-verification tail of the near-dup family: join the
    * candidate pairs to both docs' sorted hash sets, merge-count the
    * intersection, report pairs with J ≥ tau. Output identical to the
    * former per-site `size(array_intersect(sa, sb))` string form (see
    * [[shingleHashFrameCached]] for the contract). */
  private def verifyJaccard(
      s: SparkSession, d: String, cand: DataFrame, tau: Double): DataFrame = {
    import s.implicits._
    val shf = shingleHashFrameCached(s, d)
    val inter = org.apache.spark.sql.GraftInternal.column(
      graft.functions.SortedLongIntersectSize(
        org.apache.spark.sql.GraftInternal.expression($"sa"),
        org.apache.spark.sql.GraftInternal.expression($"sb")))
    cand
      .join(shf.select($"doc_id".as("doc_a"), $"sh".as("sa")), Seq("doc_a"))
      .join(shf.select($"doc_id".as("doc_b"), $"sh".as("sb")), Seq("doc_b"))
      .withColumn("inter", inter)
      .withColumn("jaccard_raw",
        $"inter".cast("double") / (size($"sa") + size($"sb") - $"inter"))
      .filter($"jaccard_raw" >= tau)
      .select($"doc_a", $"doc_b", round($"jaccard_raw", 4).as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  private def duckHash(x: String): String = graft.functions.PortableHash.duckHash(x)

  /** Exact 3-gram Jaccard pairs ≥ τ — the DuckDB oracle for q23
    * (MinHash+LSH), mirroring the reference's cross-implementation
    * agreement pattern (hnswlib vs faiss vs brute force, SURVEY §5.1). */
  private def duckJaccardPairs(tau: Double): String =
    s"""WITH $duckShingles,
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS na, len(b.s) AS nb
        FROM sh a, sh b WHERE a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, round(CAST(inter AS DOUBLE) / (na + nb - inter), 4) AS jaccard
    FROM pairs WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= $tau
    ORDER BY doc_a, doc_b"""

  /** DF-CAPPED candidate CTE chain (append after [[duckShingles]]):
    * candidate pairs share ≥1 shingle with document frequency ≤ dfCap,
    * then `cpairs` carries the EXACT intersection/set sizes for those
    * candidates. This mirrors [[jaccardPairsCapped]]'s semantics in SQL
    * (ADVICE r4: the capped engine path was gated by an UNCAPPED oracle,
    * so oracle equivalence held only on fixtures where the cap is
    * lossless — mirroring the cap makes it hold by construction). The
    * capped-vs-uncapped equivalence itself stays asserted in
    * TextPipelineSpec. */
  private def duckCappedPairCtes(dfCap: Int): String =
    s"""tok AS (SELECT doc_id, unnest(s) AS tok FROM sh),
      dfreq AS (SELECT tok, count(*) AS n FROM tok GROUP BY tok),
      rare AS (SELECT t.doc_id, t.tok FROM tok t JOIN dfreq USING (tok) WHERE dfreq.n <= $dfCap),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM rare a JOIN rare b USING (tok) WHERE a.doc_id < b.doc_id),
      cpairs AS (
        SELECT c.doc_a, c.doc_b,
               len(list_intersect(sa.s, sb.s)) AS inter, len(sa.s) AS na, len(sb.s) AS nb
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.doc_a
        JOIN sh sb ON sb.doc_id = c.doc_b)"""

  // ---------------------------------------------------------------- q21
  /** Exact dedup via content fingerprint (md5 of normalized text) — the
    * hash-groupBy shape that scales: one shuffle on the fingerprint, no
    * pairwise comparison. Output is a summary row so the query is
    * non-degenerate even at SFs with zero planted exact dups. */
  private val q21 = Q(
    "q21_exact_dedup",
    (s, d) => {
      import s.implicits._
      docs(s, d)
        .select($"doc_id", md5(lower(trim($"text"))).as("fp"))
        .groupBy($"fp")
        .agg(count(lit(1)).as("n"))
        .agg(
          sum($"n").as("n_docs"),
          count(lit(1)).as("n_distinct"),
          sum(when($"n" > 1, 1).otherwise(0)).cast("long").as("n_dup_groups"),
          sum(when($"n" > 1, $"n").otherwise(0)).cast("long").as("n_dup_docs"))
    },
    Some("""SELECT CAST(sum(n) AS BIGINT) AS n_docs, count(*) AS n_distinct,
      CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
      CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS n_dup_docs
    FROM (SELECT md5(lower(trim(text))) AS fp, count(*) AS n FROM documents GROUP BY 1)"""))

  // ---------------------------------------------------------------- q22
  /** Near-dup detection by exact 3-gram Jaccard ≥ 0.5 via an
    * INVERTED-INDEX join: explode shingles, equi-join on the shingle,
    * count shared shingles per pair, compute J from set sizes. The join
    * key is the shingle — pairs that share nothing never meet.
    *
    * The registry runs the DF-CAPPED form ([[jaccardPairsCapped]]) — the
    * shape that survives 100 TB: candidate generation is bounded by
    * dfCap × Σdf instead of Σdf² (a single hot boilerplate shingle can't
    * go quadratic), and every reported Jaccard is still exact because
    * candidates are verified against the FULL shingle sets. The oracle
    * mirrors the df-cap ([[duckCappedPairCtes]]); the uncapped
    * [[jaccardPairs]] is its equivalence oracle in TextPipelineSpec. */
  val JaccardDfCap = 16

  private val q22 = Q(
    "q22_jaccard_neardup",
    (s, d) => jaccardPairsCapped(s, d, 0.5, JaccardDfCap),
    Some(s"""WITH $duckShingles,
      ${duckCappedPairCtes(JaccardDfCap)}
    SELECT doc_a, doc_b, round(CAST(inter AS DOUBLE) / (na + nb - inter), 4) AS jaccard
    FROM cpairs WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5
    ORDER BY doc_a, doc_b"""))

  /** The 100 TB variant of [[jaccardPairs]]: candidate pairs come only
    * from shingles with document frequency ≤ `dfCap`, then candidates are
    * exact-verified against the FULL shingle sets (array_intersect), so
    * reported Jaccard values are always exact. Bounded cost: candidate
    * rows ≤ dfCap × Σdf instead of Σdf² — hot shingles (stop-phrases,
    * boilerplate) stop generating quadratic pairs.
    *
    * Completeness condition: a qualifying pair is missed only if EVERY
    * shared shingle has df > dfCap. Near-dup pairs share many shingles,
    * most of them doc-specific; on the fixtures the largest per-pair
    * minimum shared-df is 10 (measured at sf0.1), so dfCap = 16 is
    * lossless there — asserted against the uncapped implementation in
    * tests. At production scale, pick dfCap from the observed df
    * distribution the same way. */
  def jaccardPairsCapped(s: SparkSession, d: String, tau: Double, dfCap: Int): DataFrame =
    // memoized: q22 reports these pairs, q46/q48's clustering consumes
    // them — one candidate-generation + verify pass per session
    graft.Memo.cached(s, s"jaccard-capped:$d:$tau:$dfCap")(
      computeJaccardPairsCapped(s, d, tau, dfCap))

  private def computeJaccardPairsCapped(
      s: SparkSession, d: String, tau: Double, dfCap: Int): DataFrame = {
    import s.implicits._
    val sh = shingleFrameCached(s, d)
    val tok = sh.select($"doc_id", explode($"s").as("tok"))
    // ONE aggregation builds each shingle's posting list; the df-cap drops
    // hot shingles right there, and candidate pairs explode out of the
    // (≤ dfCap)-sized lists in place — no second shuffle of the token
    // frame through a self-join. Σ pairs ≤ dfCap × Σdf by construction.
    val postings = tok
      .groupBy($"tok")
      .agg(collect_list($"doc_id").as("docs"))
    // per-pair count of shared RARE shingles (narrow rows, map-side
    // partial agg) + a per-doc budget of HOT shingles: since
    // inter ≤ rare_inter + min(hot_a, hot_b), a sound Jaccard upper
    // bound prunes candidates BEFORE the expensive wide-array verify —
    // only near-qualifying pairs ever touch the full shingle sets
    val rareCnt = postings
      .filter(size($"docs").between(2, dfCap))
      .select(array_sort($"docs").as("docs")) // own projection — see Postings.pairStructs
      .select(explode(Postings.pairStructs($"docs")).as("pair"))
      .groupBy($"pair.doc_a", $"pair.doc_b")
      .agg(count(lit(1)).as("rinter"))
    val hotToks = postings.filter(size($"docs") > dfCap).select($"tok")
    val docStats = sh.select($"doc_id", size($"s").as("n"))
      .join(
        tok.join(broadcast(hotToks), Seq("tok"))
          .groupBy($"doc_id").agg(count(lit(1)).as("h")),
        Seq("doc_id"), "left_outer")
      .na.fill(0, Seq("h"))
    val survivors = rareCnt
      .join(broadcast(docStats.select($"doc_id".as("doc_a"), $"n".as("na"), $"h".as("ha"))), Seq("doc_a"))
      .join(broadcast(docStats.select($"doc_id".as("doc_b"), $"n".as("nb"), $"h".as("hb"))), Seq("doc_b"))
      .withColumn("imax", $"rinter" + least($"ha", $"hb"))
      .filter($"imax".cast("double") / ($"na" + $"nb" - $"imax") >= tau)
      .select($"doc_a", $"doc_b")
    verifyJaccard(s, d, survivors, tau)
  }

  def jaccardPairs(s: SparkSession, d: String, tau: Double): DataFrame = {
    import s.implicits._
    // cache: the shingle projection feeds the two join branches AND both
    // size lookups — without it the per-doc shingle transform runs 4×.
    val sh = shingleFrameCached(s, d)
    val sizes = sh.select($"doc_id", size($"s").as("n"))
    val tok = sh.select($"doc_id", explode($"s").as("tok"))
    tok.select($"doc_id".as("doc_a"), $"tok")
      .join(tok.select($"doc_id".as("doc_b"), $"tok"), Seq("tok"))
      .filter($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(sizes.select($"doc_id".as("doc_a"), $"n".as("na"))), Seq("doc_a"))
      .join(broadcast(sizes.select($"doc_id".as("doc_b"), $"n".as("nb"))), Seq("doc_b"))
      .withColumn("jaccard_raw", $"inter".cast("double") / ($"na" + $"nb" - $"inter"))
      .filter($"jaccard_raw" >= tau)
      .select($"doc_a", $"doc_b", round($"jaccard_raw", 4).as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  // ---------------------------------------------------------------- q23
  /** Near-dup via MinHash + banded LSH: 32 min-hash permutations over the
    * shingle set, 16 bands × 2 rows; docs sharing any band value become
    * candidates; candidates are verified with the exact Jaccard. The
    * scalable shape: the self-join key is the (band, signature) pair —
    * band buckets, not documents — and verification touches only
    * candidates. Must agree exactly with q22 (same oracle); the test
    * suite asserts LSH recall is 1.0 on the fixtures at τ = 0.5
    * (P[miss] = (1 − J²)^16 ≤ 0.01 per pair; empirically zero here). */
  val MinHashPerms = 32
  val BandRows = 2
  private val MinHashPrime = 2147483647L

  /** Deterministic permutation constants from a fixed LCG. */
  private def permConsts: Seq[(Long, Long)] = {
    var state = 88172645463325252L
    def next(): Long = {
      state = state * 6364136223846793005L + 1442695040888963407L
      math.abs(state % (MinHashPrime - 1)) + 1
    }
    (0 until MinHashPerms).map(_ => (next(), next()))
  }

  /** The full banded-MinHash signature of a shingle-array column as ONE
    * pure column expression: hash each shingle once, take the 32
    * permutation minima, emit the 16 (band, sig) structs. Pure exprs =
    * usable on batch tables AND unbounded streams ([[graft.streaming
    * .Streams.streamingNearDup]]); shared by q23/q47. */
  def bandArray(sCol: Column): Column = {
    val nBands = MinHashPerms / BandRows
    def bandsFrom(hs: Column): Column = {
      val mh = permConsts.map { case (a, b) =>
        array_min(transform(hs, h => (lit(a) * h + lit(b)) % lit(MinHashPrime)))
      }
      array((0 until nBands).map { bIdx =>
        struct(
          lit(bIdx).as("band"),
          concat_ws("_", (0 until BandRows).map(r => mh(bIdx * BandRows + r)): _*).as("sig"))
      }: _*)
    }
    // LET-BINDING via a one-element transform: the hashed-shingle array
    // (the expensive 24-char polynomial per shingle) is evaluated ONCE
    // per row and bound to the lambda variable; writing it inline instead
    // re-evaluates it inside every one of the 32 permutation expressions
    // (measured 20× slower at sf0.1 — Catalyst does not CSE across the
    // copies).
    element_at(
      transform(array(transform(sCol, x => shingleHash(x))), hs => bandsFrom(hs)),
      1)
  }

  /** Memoized exploded band frame (doc_id, bv) over docs with ≥1 shingle
    * (empty shingle sets would all share the degenerate empty signature —
    * they can never pass exact verification anyway, so they're excluded
    * at the source). Feeds both sides of q23's candidate self-join and
    * q47's dup-flag join. */
  private def bandFrameCached(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.Memo.cached(s, s"minhash-bands:$d")(
      shingleFrameCached(s, d)
        .filter(size($"s") >= 1)
        .select($"doc_id", explode(bandArray($"s")).as("bv")))
  }

  private val q23 = Q(
    "q23_minhash_lsh_neardup",
    (s, d) => {
      import s.implicits._
      // memo: the band frame feeds BOTH sides of the candidate self-join
      // (uncached, the full 32-permutation signature computation runs
      // twice) and is evicted with the session (ADVICE r2).
      val banded = bandFrameCached(s, d)
      val cands = banded.select($"doc_id".as("doc_a"), $"bv")
        .join(banded.select($"doc_id".as("doc_b"), $"bv"), Seq("bv"))
        .filter($"doc_a" < $"doc_b")
        .select($"doc_a", $"doc_b")
        .distinct()
      // Exact verification on candidates only.
      verifyJaccard(s, d, cands, 0.5)
    },
    Some(duckJaccardPairs(0.5)))

  // ---------------------------------------------------------------- q24
  /** Near-dup via 31-bit SimHash + banded candidate join: per doc, each
    * simhash bit is the sign of the sum of ±1 contributions from every
    * shingle's hash bit; near-dups are pairs at hamming distance ≤ 3.
    * 31 bits, not 32: [[graft.functions.PortableHash]] values are < 2^31,
    * so bit 31 of the shingle hash — and therefore of the simhash — is
    * always 0 and carries no information (ADVICE r2).
    * Candidates come from a 4-band (8+8+8+7 bit) equi-join — by
    * pigeonhole, two hashes within hamming 3 MUST agree on at least one
    * of the 4 bands, so banding is exact (no recall loss) regardless of
    * unequal band widths, while the join key keeps the plan
    * bucket-shaped. The oracle recomputes the full simhash in SQL and
    * cross-checks via an all-pairs xor/bit_count (feasible at oracle SF).
    */
  private val SimHashBits = 31
  private val SimHashBands = 4
  private val HammingMax = 3

  private val q24 = Q(
    "q24_simhash_neardup",
    (s, d) => {
      import s.implicits._
      val sh = shingleFrameCached(s, d)
      val tok = sh.select($"doc_id", explode($"s").as("t"))
        .withColumn("hv", shingleHash($"t"))
      val bitAggs = (0 until SimHashBits).map { b =>
        sum(when(shiftright($"hv", b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$b")
      }
      val bits = tok.groupBy($"doc_id").agg(bitAggs.head, bitAggs.tail: _*)
      val simVal = (0 until SimHashBits)
        .map(b => when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _)
      val sim = bits.select($"doc_id", simVal.as("simhash"))
      // ceil-width bands: 8+8+8+7 over 31 bits — the last band is narrower
      val bandWidth = (SimHashBits + SimHashBands - 1) / SimHashBands
      val bandCols = (0 until SimHashBands).map { i =>
        val lo = i * bandWidth
        val w = math.min(bandWidth, SimHashBits - lo)
        struct(
          lit(i).as("band"),
          shiftright($"simhash", lo).bitwiseAND(lit((1L << w) - 1)).as("v"))
      }
      // memo: both self-join branches (uncached, the per-bit-sum
      // aggregation runs twice), evicted with the session (ADVICE r2).
      val banded = graft.Memo.cached(s, s"simhash-bands:$d")(
        sim.select($"doc_id", $"simhash", explode(array(bandCols: _*)).as("bv")))
      val cands = banded.select($"doc_id".as("doc_a"), $"simhash".as("sha"), $"bv")
        .join(banded.select($"doc_id".as("doc_b"), $"simhash".as("shb"), $"bv"), Seq("bv"))
        .filter($"doc_a" < $"doc_b")
        .select($"doc_a", $"doc_b", $"sha", $"shb")
        .distinct()
      cands
        .withColumn("hamming", bit_count($"sha".bitwiseXOR($"shb")).cast("long"))
        .filter($"hamming" <= HammingMax)
        .select($"doc_a", $"doc_b", $"hamming")
        .orderBy($"doc_a", $"doc_b")
    },
    Some {
      val bitSums = (0 until SimHashBits)
        .map(b => s"sum(CASE WHEN (hv >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS b$b")
        .mkString(", ")
      val simExpr = (0 until SimHashBits)
        .map(b => s"CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END")
        .mkString("(", " + ", ")")
      s"""WITH $duckShingles,
        tok AS (SELECT doc_id, unnest(s) AS t FROM sh),
        th AS (SELECT doc_id, ${duckHash("t")} AS hv FROM tok),
        bits AS (SELECT doc_id, $bitSums FROM th GROUP BY doc_id),
        sim AS (SELECT doc_id, CAST($simExpr AS BIGINT) AS simhash FROM bits)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
      FROM sim a, sim b
      WHERE a.doc_id < b.doc_id AND bit_count(xor(a.simhash, b.simhash)) <= $HammingMax
      ORDER BY doc_a, doc_b"""
    })

  // ---------------------------------------------------------------- q25
  /** Text analysis: token counting (whitespace words + alpha tokens via
    * regex), quality scoring (chars/word, stopword ratio), and a
    * language-ID heuristic (stopword-ratio threshold), cross-tabulated
    * against the table's actual lang column — the filter stage every
    * LLM-data pipeline runs before training. */
  private val Stopwords = Seq("the", "a", "of", "to", "and", "in", "is", "it")

  // Gopher/C4 quality-rule knobs (q65, q70). Declared BEFORE every Q val:
  // oracle SQL strings interpolate them at object-init time, and a Q
  // defined textually earlier would otherwise capture default-initialized
  // zeros (q70 did — Spark reads them lazily inside fn, the SQL string
  // eagerly, and the two silently diverged).
  private val QMinWords = 50
  private val QMaxWords = 100000
  private val QMinMeanWl = 3.0
  private val QMaxMeanWl = 10.0
  private val QMinStop = 2
  private val QMinAlphaFrac = 0.8

  private val q25 = Q(
    "q25_text_stats",
    (s, d) => {
      import s.implicits._
      val ws = split(trim($"text"), "\\s+")
      val stopArr = array(Stopwords.map(lit): _*)
      val perDoc = docs(s, d).select(
        $"lang",
        size(ws).cast("long").as("n_words"),
        size(regexp_extract_all($"text", lit("[a-z]+"), lit(0))).cast("long").as("n_alpha"),
        (length($"text").cast("double") / size(ws)).as("chars_per_word"),
        (size(filter(ws, w => array_contains(stopArr, w))).cast("double") / size(ws))
          .as("stop_ratio"))
      perDoc
        .withColumn("guessed_en", ($"stop_ratio" >= 0.05).cast("int"))
        .groupBy($"lang", $"guessed_en")
        .agg(
          count(lit(1)).as("n_docs"),
          round(avg($"n_words"), 4).as("avg_words"),
          round(avg($"n_alpha"), 4).as("avg_alpha_tokens"),
          round(avg($"chars_per_word"), 4).as("avg_chars_per_word"),
          round(avg($"stop_ratio"), 4).as("avg_stop_ratio"))
        .orderBy($"lang", $"guessed_en")
    },
    Some(s"""WITH per_doc AS (
      SELECT lang,
        CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_words,
        CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_alpha,
        CAST(length(text) AS DOUBLE) / len(string_split_regex(trim(text), '\\s+')) AS chars_per_word,
        CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                             w -> w IN (${Stopwords.map(w => s"'$w'").mkString(", ")}))) AS DOUBLE)
          / len(string_split_regex(trim(text), '\\s+')) AS stop_ratio
      FROM documents)
    SELECT lang, CAST(stop_ratio >= 0.05 AS INT) AS guessed_en,
           count(*) AS n_docs,
           round(avg(n_words), 4) AS avg_words,
           round(avg(n_alpha), 4) AS avg_alpha_tokens,
           round(avg(chars_per_word), 4) AS avg_chars_per_word,
           round(avg(stop_ratio), 4) AS avg_stop_ratio
    FROM per_doc GROUP BY 1, 2 ORDER BY lang, guessed_en"""))

  // ---------------------------------------------------------------- q26
  /** Embedding-cosine near-dup: all pairs with dot ≥ 0.45 (vectors are
    * pre-normalized, so dot ≡ cosine). Runs on the [[BruteForce]] top-k
    * kernel with k = 20 then threshold-filters — complete because the
    * fixture's max above-threshold degree is 3 (measured; at 100 TB the
    * same shape runs per ANN-probed bucket). No crossJoin in the plan. */
  private val q26 = Q(
    "q26_embedding_neardup",
    (s, d) => {
      import s.implicits._
      val e = Tables(s, d, "embeddings").select($"vec_id".as("id"), $"embedding".as("vec"))
      BruteForce.topKFromFrames(e, e, k = 20, excludeSelf = true)
        .filter($"score" >= 0.45 && $"query_id" < $"doc_id")
        .select(
          $"query_id".as("vec_a"),
          $"doc_id".as("vec_b"),
          round($"score", 4).as("cosine"))
        .orderBy($"vec_a", $"vec_b")
    },
    Some("""WITH scored AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             (SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
              FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y) zz) AS dt
      FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id)
    SELECT vec_a, vec_b, round(dt, 4) AS cosine
    FROM scored WHERE dt >= 0.45 ORDER BY vec_a, vec_b"""))

  // ---------------------------------------------------------------- q34
  /** V1 — embedding generation via the pluggable [[graft.functions.TextEncoder]]
    * stage (hashing-trick featurizer, dim 16): encode each document and
    * emit the first 4 components of the unit vector. One narrow
    * projection, no shuffle — the execution shape a real model encoder
    * slots into. */
  private val q34 = Q(
    "q34_featurize",
    (s, d) => {
      import s.implicits._
      val enc = graft.functions.HashProjectionEncoder(16)
      enc.encode(docs(s, d).filter($"doc_id" < 100), "text", "emb")
        .select(
          $"doc_id",
          round(element_at($"emb", 1), 6).as("e0"),
          round(element_at($"emb", 2), 6).as("e1"),
          round(element_at($"emb", 3), 6).as("e2"),
          round(element_at($"emb", 4), 6).as("e3"))
        .orderBy($"doc_id")
    },
    Some {
      val enc = graft.functions.HashProjectionEncoder(16)
      val sums = enc.duckSums("hs").zipWithIndex
        .map { case (sql, i) => s"$sql AS s$i" }.mkString(", ")
      val normExpr = (0 until 16).map(i => s"s$i * s$i").mkString("sqrt(", " + ", ")")
      s"""WITH toks AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
          FROM documents WHERE doc_id < 100),
        hashed AS (SELECT doc_id, [${graft.functions.PortableHash.duckHash("w")} for w in ws] AS hs FROM toks),
        sums AS (SELECT doc_id, $sums FROM hashed),
        normed AS (SELECT doc_id, $normExpr AS nrm, s0, s1, s2, s3 FROM sums)
      SELECT doc_id,
             round(CASE WHEN nrm = 0 THEN 0.0 ELSE s0 / nrm END, 6) AS e0,
             round(CASE WHEN nrm = 0 THEN 0.0 ELSE s1 / nrm END, 6) AS e1,
             round(CASE WHEN nrm = 0 THEN 0.0 ELSE s2 / nrm END, 6) AS e2,
             round(CASE WHEN nrm = 0 THEN 0.0 ELSE s3 / nrm END, 6) AS e3
      FROM normed ORDER BY doc_id"""
    })

  /** Collapse near-dup PAIRS into dedup CLUSTERS — the step a training
    * pipeline actually runs (keep ONE doc per duplicate group): connected
    * components over the Jaccard pair graph by min-label propagation,
    * canonical doc = the component's smallest doc_id.
    *
    * Each iteration is one equi-join + groupBy-min (label travels one
    * hop); the loop stops when no label changed, bounded by the
    * component diameter — near-dup components are tiny chains/cliques,
    * so a handful of iterations in practice. 100 TB note: this is the
    * HashToMin shape; a production run on billion-edge graphs would use
    * the large-star/small-star variant for O(log n) rounds, same
    * per-round plan (join + min-agg, no driver-side graph).
    *
    * @return (doc_id, canonical_id) for every doc in ≥1 qualifying pair */
  def dedupClusters(s: SparkSession, d: String, tau: Double): DataFrame =
    // memoized: q46 and the q48 funnel both need the labels; the
    // propagation loop is ~diameter jobs, worth running once per session
    graft.Memo.cached(s, s"dedup-clusters:$d:$tau")(computeDedupClusters(s, d, tau))

  private def computeDedupClusters(s: SparkSession, d: String, tau: Double): DataFrame = {
    import s.implicits._
    val pairs = jaccardPairsCapped(s, d, tau, JaccardDfCap).select($"doc_a", $"doc_b")
    val edges = pairs
      .union(pairs.select($"doc_b", $"doc_a"))
      .toDF("src", "dst")
      .cache()
    var labels = edges.select($"src".as("doc_id")).distinct()
      .withColumn("lbl", $"doc_id")
      .cache()
    var changed = 1L
    var iter = 0
    var prev: DataFrame = labels // cached frames pending unpersist
    while (changed > 0 && iter < 25) {
      val nbrMin = edges
        .join(labels.select($"doc_id".as("dst"), $"lbl".as("nlbl")), Seq("dst"))
        .groupBy($"src".as("doc_id"))
        .agg(min($"nlbl").as("nbr"))
      // pointer doubling: also shortcut through the current label's OWN
      // label (lbl is always a member doc, so the lookup is an equi-join
      // on the label frame itself) — a chain of length L converges in
      // O(log L) rounds instead of L, and each round is one fixed-cost
      // set of tiny-shuffle jobs, which is what dominates wall time
      val lol = labels.select($"lbl".as("__lk"), $"doc_id").join(
        labels.select($"doc_id".as("__lk"), $"lbl".as("ll")), Seq("__lk"))
        .select($"doc_id", $"ll")
      // localCheckpoint, not cache: a cache only short-circuits EXECUTION —
      // the LOGICAL plan keeps the whole iterative join chain (growing
      // ~3× per round with the doubling join), and every downstream
      // count() re-optimizes that exponential tree on the driver, which
      // quickly dominates wall time. Checkpointing truncates the lineage
      // each round, keeping both planning and recovery O(current frame).
      // Eager = the one action per round that also feeds the convergence
      // count.
      val next = labels
        .join(nbrMin, Seq("doc_id"), "left_outer")
        .join(lol, Seq("doc_id"), "left_outer")
        .select(
          $"doc_id",
          least($"lbl", coalesce($"nbr", $"lbl"), coalesce($"ll", $"lbl")).as("nl"),
          $"lbl")
        .select($"doc_id", $"nl".as("lbl"), ($"nl" < $"lbl").as("ch"))
        .localCheckpoint(true)
      changed = next.filter($"ch").count()
      prev.unpersist(blocking = false)
      prev = next
      labels = next.select($"doc_id", $"lbl")
      iter += 1
    }
    edges.unpersist(blocking = false)
    labels.select($"doc_id", $"lbl".as("canonical_id")).orderBy($"doc_id")
  }

  // ---------------------------------------------------------------- q46
  /** Dedup clustering over the τ=0.5 Jaccard pair graph. The oracle
    * computes the same components with a recursive CTE (min reachable
    * label per node) over the df-capped pair set — the same pair
    * semantics the engine's [[jaccardPairsCapped]] feeds the
    * propagation. */
  private val q46 = Q(
    "q46_dedup_clusters",
    (s, d) => dedupClusters(s, d, 0.5),
    Some(s"""WITH RECURSIVE $duckShingles,
      ${duckCappedPairCtes(JaccardDfCap)},
      qpairs AS (
        SELECT doc_a, doc_b FROM cpairs
        WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM qpairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM qpairs),
      reach AS (
        SELECT src AS node, src AS lbl FROM edges
        UNION
        SELECT e.dst AS node, r.lbl FROM reach r JOIN edges e ON e.src = r.node)
    SELECT node AS doc_id, min(lbl) AS canonical_id
    FROM reach GROUP BY node ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q47
  /** LSH dup FLAGS — the band-collision primitive behind streaming
    * near-dup: a doc is flagged when any of its 16 band signatures is
    * already owned by a SMALLER doc_id (the batch proxy for "arrived
    * earlier"); `dup_of` is the smallest such owner. This is exactly the
    * state transition [[graft.streaming.Streams.streamingNearDup]] makes
    * per micro-batch, so the streaming operator is equivalence-tested
    * against this entry. The oracle recomputes the full MinHash banding
    * (portable hash → 32 permutations → 16 band signatures) in SQL. */
  private val q47 = Q(
    "q47_lsh_dup_flags",
    (s, d) => {
      import s.implicits._
      val banded = bandFrameCached(s, d)
      banded.select($"doc_id", $"bv")
        .join(banded.select($"doc_id".as("owner"), $"bv"), Seq("bv"))
        .filter($"owner" < $"doc_id")
        .groupBy($"doc_id")
        .agg(min($"owner").as("dup_of"))
        .orderBy($"doc_id")
    },
    Some(s"""WITH $duckShingles,
        $duckBandCtes
      SELECT a.doc_id, min(b.doc_id) AS dup_of
      FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND b.doc_id < a.doc_id
      GROUP BY a.doc_id ORDER BY a.doc_id"""))

  /** The MinHash-banding CTE chain (append after [[duckShingles]]):
    * `nonempty` → `hashed` → `mh` (32 permutation minima) → `bands`
    * (16 (doc_id, band, sig) rows per doc) — the SQL replay of
    * [[bandArray]], shared by the q47 and q75 oracles. A `def`: the
    * interpolated constants must never capture init-order zeros. */
  private def duckBandCtes: String = {
    val mhCols = permConsts.zipWithIndex.map { case ((a, b), j) =>
      s"list_min([($a * h + $b) % $MinHashPrime for h in hs]) AS mh$j"
    }.mkString(",\n               ")
    val nBands = MinHashPerms / BandRows
    val bandSelects = (0 until nBands).map { bIdx =>
      val sig = (0 until BandRows)
        .map(r => s"CAST(mh${bIdx * BandRows + r} AS VARCHAR)")
        .mkString(" || '_' || ")
      s"SELECT doc_id, $bIdx AS band, $sig AS sig FROM mh"
    }.mkString("(", ") UNION ALL (", ")")
    s"""nonempty AS (SELECT doc_id, s FROM sh WHERE len(s) >= 1),
        hashed AS (SELECT doc_id, [${duckHash("w")} for w in s] AS hs FROM nonempty),
        mh AS (SELECT doc_id,
               $mhCols
               FROM hashed),
        bands AS ($bandSelects)"""
  }

  // ---------------------------------------------------------------- q48
  /** The END-TO-END cleaning funnel every LLM-data pipeline runs before
    * training, as ONE query: exact dedup (keep the smallest doc_id per
    * content fingerprint) → near-dup dedup (keep only cluster canonicals
    * from [[dedupClusters]]) → quality filter (≥5 words and
    * stopword-ratio language-ID). Emitted as the funnel's stage counts.
    *
    * Plan shape: per-doc keep/drop FLAGS materialize in one frame (the
    * q27 one-pass pattern — fingerprint-min and cluster labels join in,
    * quality is pure column arithmetic) and a single conditional-sum
    * aggregation produces the funnel — no per-stage subtree recompute.
    *
    * The fingerprint here is CASE-SENSITIVE (`md5(trim(text))`, unlike
    * q21's lowercased analysis fingerprint) so that exact-dup ⟹
    * identical shingle sets ⟹ same near-dup cluster. That invariant is
    * what lets the stages compose as independent flags: the cluster
    * minimum always survives the exact stage, so ANDing the flags equals
    * running the stages sequentially — with a LOOSER fingerprint than
    * the tokenizer, a cluster whose canonical lost the exact stage could
    * be dropped entirely instead of keeping one representative. */
  private val q48 = Q(
    "q48_clean_corpus",
    (s, d) => {
      import s.implicits._
      val base = docs(s, d).select($"doc_id", $"text")
      val fp = base.select($"doc_id", md5(trim($"text")).as("fp"))
      val fpMin = fp.groupBy($"fp").agg(min($"doc_id").as("keep"))
      val clusters = dedupClusters(s, d, 0.5).withColumnRenamed("canonical_id", "canon")
      val ws = split(trim($"text"), "\\s+")
      val stopArr = array(Stopwords.map(lit): _*)
      base
        .join(fp, Seq("doc_id"))
        .join(fpMin, Seq("fp"))
        .join(broadcast(clusters), Seq("doc_id"), "left_outer")
        .select(
          when($"doc_id" === $"keep", 1L).otherwise(0L).as("ex"),
          when($"canon".isNull || $"canon" === $"doc_id", 1L).otherwise(0L).as("nd"),
          when(
            size(ws) >= 5 &&
              (size(filter(ws, w => array_contains(stopArr, w))).cast("double") / size(ws)) >= 0.05,
            1L).otherwise(0L).as("q"))
        .agg(
          count(lit(1)).as("n_input"),
          sum($"ex").as("n_after_exact"),
          sum($"ex" * $"nd").as("n_after_neardup"),
          sum($"ex" * $"nd" * $"q").as("n_clean"))
    },
    Some(s"""WITH RECURSIVE $duckShingles,
      ${duckCappedPairCtes(JaccardDfCap)},
      qpairs AS (
        SELECT doc_a, doc_b FROM cpairs
        WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM qpairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM qpairs),
      reach AS (
        SELECT src AS node, src AS lbl FROM edges
        UNION
        SELECT e.dst AS node, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
      labels AS (SELECT node, min(lbl) AS canon FROM reach GROUP BY node),
      fp AS (SELECT doc_id, md5(trim(text)) AS fp FROM documents),
      fpmin AS (SELECT fp, min(doc_id) AS keep FROM fp GROUP BY fp),
      flags AS (
        SELECT d.doc_id,
               CASE WHEN d.doc_id = m.keep THEN 1 ELSE 0 END AS ex,
               CASE WHEN l.canon IS NULL OR l.canon = d.doc_id THEN 1 ELSE 0 END AS nd,
               CASE WHEN len(string_split_regex(trim(d.text), '\\s+')) >= 5
                     AND CAST(len(list_filter(string_split_regex(trim(d.text), '\\s+'),
                                w -> w IN (${Stopwords.map(w => s"'$w'").mkString(", ")}))) AS DOUBLE)
                         / len(string_split_regex(trim(d.text), '\\s+')) >= 0.05
                    THEN 1 ELSE 0 END AS q
        FROM documents d
        JOIN fp f ON f.doc_id = d.doc_id
        JOIN fpmin m ON m.fp = f.fp
        LEFT JOIN labels l ON l.node = d.doc_id)
    SELECT CAST(count(*) AS BIGINT) AS n_input,
           CAST(sum(ex) AS BIGINT) AS n_after_exact,
           CAST(sum(ex * nd) AS BIGINT) AS n_after_neardup,
           CAST(sum(ex * nd * q) AS BIGINT) AS n_clean
    FROM flags"""))

  // ---------------------------------------------------------------- q51
  /** Benchmark decontamination — the standard pre-training hygiene step
    * (industry practice checks 8–13-token n-gram overlap between the
    * training corpus and held-out eval benchmarks; on this fixture's
    * 31-word vocabulary a 5-gram has the same selectivity). Eval set =
    * `doc_id % 10 == 0` (the "benchmark suite"); a train doc is
    * contaminated when it shares ≥ 1 distinct word-5-gram with ANY eval
    * doc.
    *
    * Scale shape: the eval set is CAPPED AT [[DecontamEvalCap]] DOCS —
    * the id cap, not the modulus, is what licenses the broadcast: an
    * eval benchmark is a fixed artifact (thousands of docs), while a
    * plain percentage split would grow with the corpus and blow the
    * broadcast at scale. With the bound, the distinct eval-gram set is
    * broadcast and the train side streams map-side through the semi-join
    * with no shuffle of the corpus; the only shuffle is the distinct
    * over matching doc_ids, bounded by the contamination count.
    *
    * The broadcast carries the 31-bit [[graft.functions.PortableHash]]
    * of each gram, NOT the gram string (VERDICT r7 wrong #4: at a real
    * 100k-doc benchmark suite the string set is multi-GB; 8-byte hashes
    * are ~10× smaller). Matching is therefore hash-equality with a
    * bounded false-POSITIVE rate ≈ n_eval_grams / 2³¹ per train gram
    * (~0.005% at the cap) — over-flagging only, never under-flagging,
    * the safe direction for decontamination. The oracle hashes
    * identically, so the gate stays exact. */
  private val DecontamK = 5
  val DecontamEvalCap = 100000L

  /** Distinct word-`DecontamK`-gram array (same construction as
    * [[shingles]], wider window). */
  private def decontamGrams(text: Column): Column = {
    val ws = split(trim(text), "\\s+")
    val n = size(ws)
    when(n >= DecontamK,
      array_distinct(transform(
        sequence(lit(1), n - (DecontamK - 1)),
        i => concat_ws(" ", (0 until DecontamK).map(j => element_at(ws, i + j)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  private val q51 = Q(
    "q51_decontaminate",
    (s, d) => {
      import s.implicits._
      val isEval = (col("doc_id") % 10 === 0) && (col("doc_id") < DecontamEvalCap)
      // hash map-side BEFORE the distinct/broadcast: the gram string
      // never leaves its scan-side projection (same discipline as q56)
      val grams = docs(s, d)
        .select($"doc_id", explode(decontamGrams($"text")).as("gram"))
        .select($"doc_id", shingleHash($"gram").as("h"))
      val evalGrams = grams.filter(isEval).select($"h").distinct()
      val contaminated = grams
        .filter(!isEval)
        .join(broadcast(evalGrams), "h")
        .select($"doc_id")
        .distinct()
      docs(s, d)
        .filter(!isEval)
        .join(contaminated.withColumn("hit", lit(1)), Seq("doc_id"), "left")
        .groupBy($"source")
        .agg(
          count(lit(1)).as("n_train"),
          sum(coalesce($"hit", lit(0))).cast("long").as("n_contaminated"))
        .orderBy($"source")
    },
    Some(s"""WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents),
      gr AS (
        SELECT doc_id,
               list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]
                              for i in range(1, len(ws) - 3)]) AS g
        FROM toks),
      tg AS (SELECT doc_id, ${duckHash("gram")} AS h
             FROM (SELECT doc_id, unnest(g) AS gram FROM gr) ug),
      eg AS (SELECT DISTINCT h FROM tg WHERE doc_id % 10 = 0 AND doc_id < $DecontamEvalCap),
      hits AS (
        SELECT DISTINCT t.doc_id FROM tg t JOIN eg e ON t.h = e.h
        WHERE NOT (t.doc_id % 10 = 0 AND t.doc_id < $DecontamEvalCap))
    SELECT d.source, count(*) AS n_train,
           CAST(sum(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE NOT (d.doc_id % 10 = 0 AND d.doc_id < $DecontamEvalCap)
    GROUP BY d.source ORDER BY d.source"""))

  // ---------------------------------------------------------------- q68
  /** Semantic decontamination — q51's hygiene step moved to embedding
    * space (the modern complement: n-gram overlap misses paraphrased
    * eval leakage; SemDeDup-style cosine similarity to the eval set
    * catches it). Eval set = embeddings vec_id < 10; a train vector is
    * contaminated when its cosine to ANY eval vector ≥ [[SemDecontamTau]].
    * Composes the [[BruteForce.rangeSearch]] kernel (one narrow map-side
    * filter over the corpus against the broadcast eval set — zero
    * shuffle, the eval side is the small side by definition) with a
    * label census. Integer outputs only. */
  private val SemDecontamTau = 0.3

  private val q68 = Q(
    "q68_semantic_decontam",
    (s, d) => {
      import s.implicits._
      val e = Tables(s, d, "embeddings")
      val corpus = e.filter($"vec_id" >= 10)
        .select($"vec_id".as("id"), $"embedding".as("vec"))
        .as[(Long, Array[Float])]
      val evalQ = e.filter($"vec_id" < 10)
        .select($"vec_id".as("id"), $"embedding".as("vec"))
        .as[(Long, Array[Float])]
        .collect().sortBy(_._1)
      val hits = BruteForce
        .rangeSearch(corpus, evalQ, SemDecontamTau, excludeSelf = false)
        .select($"doc_id".as("vec_id")).distinct()
      e.filter($"vec_id" >= 10)
        .join(broadcast(hits.withColumn("hit", lit(1))), Seq("vec_id"), "left")
        .groupBy($"label")
        .agg(
          count(lit(1)).as("n_train"),
          sum(coalesce($"hit", lit(0))).cast("long").as("n_contaminated"))
        .orderBy($"label")
    },
    Some(s"""WITH ev AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
      tr AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id >= 10),
      hits AS (
        SELECT DISTINCT t.vec_id
        FROM tr t, ev q
        WHERE ${VectorSearch.duckDot("t.embedding", "q.embedding")} >= $SemDecontamTau)
    SELECT t.label, count(*) AS n_train,
           CAST(sum(CASE WHEN h.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
    FROM tr t LEFT JOIN hits h ON h.vec_id = t.vec_id
    GROUP BY t.label ORDER BY t.label"""))

  // ---------------------------------------------------------------- q69
  /** Unigram-LM perplexity filter (the CCNet/KenLM quality gate, reduced
    * to its unigram core): train a unigram model ON the corpus itself
    * (one word groupBy — the LM-table build; output is vocab-sized),
    * score each doc by average negative log-likelihood, flag docs above
    * [[PplMax]] (rare-word tails ≈ noisy docs). The freq table
    * BROADCASTS into the token stream — the corpus-side pass is
    * map-side; the only corpus-keyed shuffle carries (doc_id, int)
    * pairs.
    *
    * Determinism (the q57/q63 discipline): each token's nll is ONE
    * expression (`-ln(c/N)`, identical IEEE ops both engines; Math.log
    * vs libm last-ulp divergence is the q63-documented accepted risk),
    * dyadically quantized to 2⁻²⁰ integers that sum order-free; the
    * per-doc and per-lang averages divide once at the end. */
  private val PplMax = 3.45
  private val NllScale = 1048576.0 // 2^20

  private val q69 = Q(
    "q69_perplexity_filter",
    (s, d) => {
      import s.implicits._
      val toks = docs(s, d)
        .select($"doc_id", $"lang", explode(split(trim($"text"), "\\s+")).as("w"))
      val freq = toks.groupBy($"w").agg(count(lit(1)).as("c"))
      val qnll = freq
        .crossJoin(broadcast(freq.agg(sum($"c").cast("double").as("n"))))
        .select(
          $"w",
          floor(-log($"c".cast("double") / $"n") * NllScale + 0.5).cast("long").as("qn"))
      val perDoc = toks
        .join(broadcast(qnll), Seq("w"))
        .groupBy($"doc_id", $"lang")
        .agg(sum($"qn").as("snll"), count(lit(1)).as("nw"))
      perDoc
        .groupBy($"lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum((($"snll".cast("double") / NllScale / $"nw") > PplMax).cast("long"))
            .as("n_flagged"),
          round(
            (sum($"snll").cast("double") / NllScale) / sum($"nw").cast("double"),
            4).as("avg_nll"))
        .orderBy($"lang")
    },
    Some(s"""WITH toks AS (
        SELECT doc_id, lang, unnest(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents),
      freq AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
      tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM freq),
      qnll AS (
        SELECT w, CAST(floor(-ln(CAST(c AS DOUBLE) / n) * $NllScale + 0.5) AS BIGINT) AS qn
        FROM freq, tot),
      per_doc AS (
        SELECT t.doc_id, t.lang, sum(q.qn) AS snll, count(*) AS nw
        FROM toks t JOIN qnll q ON q.w = t.w
        GROUP BY t.doc_id, t.lang)
    SELECT lang, count(*) AS n_docs,
      CAST(sum(CASE WHEN CAST(snll AS DOUBLE) / $NllScale / nw > $PplMax
               THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
      round((CAST(sum(snll) AS DOUBLE) / $NllScale) / CAST(sum(nw) AS DOUBLE), 4) AS avg_nll
    FROM per_doc GROUP BY lang ORDER BY lang"""))

  // ---------------------------------------------------------------- q70
  /** Corpus data card — the per-source summary table every training-data
    * release publishes (doc/token/char counts, exact-dup rate, quality
    * pass rate, final kept count), composing the engine's own stages:
    * q21's md5 fingerprint dedup (keep-first over doc_id), q65's quality
    * rules, q25/q67's token accounting. One text pass computes every
    * per-doc metric map-side; the only shuffles are the fingerprint
    * window (hash-partitioned by fp, q21's scale shape) and the final
    * source census. Integer-only outputs — bit-deterministic. */
  private val q70 = Q(
    "q70_data_card",
    (s, d) => {
      import s.implicits._
      val ws = split(trim($"text"), "\\s+")
      val stopArr = array(Stopwords.map(lit): _*)
      val perDoc = docs(s, d).select(
        $"source",
        $"doc_id",
        md5(lower(trim($"text"))).as("fp"),
        size(ws).cast("long").as("n_words"),
        length($"text").cast("long").as("n_chars"),
        ((size(ws) >= QMinWords && size(ws) <= QMaxWords) &&
          ((aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double") / size(ws))
            .between(QMinMeanWl, QMaxMeanWl)) &&
          (size(filter(ws, w => array_contains(stopArr, w))) >= QMinStop) &&
          ((size(filter(ws, w => w.rlike("[a-z]"))).cast("double") / size(ws))
            >= QMinAlphaFrac)).cast("long").as("quality_ok"))
      val wDup = org.apache.spark.sql.expressions.Window.partitionBy($"fp").orderBy($"doc_id")
      perDoc
        .withColumn("dup", (row_number().over(wDup) > 1).cast("long"))
        .groupBy($"source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum($"n_words").as("n_tokens"),
          sum($"n_chars").as("n_chars"),
          sum($"dup").as("n_exact_dup"),
          sum(lit(1L) - $"quality_ok").as("n_quality_fail"),
          sum($"quality_ok" * (lit(1L) - $"dup")).as("n_kept"))
        .orderBy($"source")
    },
    Some(s"""WITH per_doc AS (
        SELECT source, doc_id, md5(lower(trim(text))) AS fp,
          CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_words,
          CAST(length(text) AS BIGINT) AS n_chars,
          CAST(len(string_split_regex(trim(text), '\\s+')) BETWEEN $QMinWords AND $QMaxWords
            AND (CAST(list_sum(list_transform(string_split_regex(trim(text), '\\s+'), w -> len(w))) AS DOUBLE)
                 / len(string_split_regex(trim(text), '\\s+'))) BETWEEN $QMinMeanWl AND $QMaxMeanWl
            AND len(list_filter(string_split_regex(trim(text), '\\s+'),
                                w -> w IN (${Stopwords.map(w => s"'$w'").mkString(", ")}))) >= $QMinStop
            AND (CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                      w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
                 / len(string_split_regex(trim(text), '\\s+'))) >= $QMinAlphaFrac
            AS BIGINT) AS quality_ok
        FROM documents),
      flagged AS (
        SELECT source, n_words, n_chars, quality_ok,
               CAST(row_number() OVER (PARTITION BY fp ORDER BY doc_id) > 1 AS BIGINT) AS dup
        FROM per_doc)
    SELECT source, count(*) AS n_docs,
      CAST(sum(n_words) AS BIGINT) AS n_tokens,
      CAST(sum(n_chars) AS BIGINT) AS n_chars,
      CAST(sum(dup) AS BIGINT) AS n_exact_dup,
      CAST(sum(1 - quality_ok) AS BIGINT) AS n_quality_fail,
      CAST(sum(quality_ok * (1 - dup)) AS BIGINT) AS n_kept
    FROM flagged GROUP BY source ORDER BY source"""))

  // ---------------------------------------------------------------- q52
  /** PII redaction — scrub emails and phone-shaped tokens from the corpus
    * and account for every removal (a training pipeline must prove WHAT
    * it scrubbed, not just scrub). The fixture text carries no PII, so
    * the query PLANTS deterministic synthetic PII first (email for even
    * ids, phone for ids % 3 == 0 — the q17/q18 derive-then-roundtrip
    * pattern), then redacts with the regex pair and aggregates counts and
    * size deltas per source. Patterns use explicit character classes
    * (`[0-9]`, no `\d`/`\b`) so Java regex (Spark) and RE2 (DuckDB)
    * agree. Narrow projection → regexp in whole-stage codegen → one
    * partial-aggregated groupBy on a low-cardinality key: shuffle is 5
    * rows per partition at any corpus size. */
  private val EmailRe = "[a-z0-9._]+@[a-z0-9.]+"
  private val PhoneRe = "555-[0-9]{4}"

  private val q52 = Q(
    "q52_pii_redact",
    (s, d) => {
      import s.implicits._
      val aug = docs(s, d).select(
        $"source",
        concat(
          $"text",
          when($"doc_id" % 2 === 0,
            concat(lit(" contact "), $"source", lit("_"), $"doc_id", lit("@mail.example")))
            .otherwise(lit("")),
          when($"doc_id" % 3 === 0,
            concat(lit(" call 555-"), lpad(($"doc_id" % 10000).cast("string"), 4, "0")))
            .otherwise(lit(""))).as("aug"))
      aug
        .select(
          $"source",
          $"aug",
          regexp_count($"aug", lit(EmailRe)).as("n_email"),
          regexp_count($"aug", lit(PhoneRe)).as("n_phone"),
          regexp_replace(
            regexp_replace($"aug", EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>").as("red"))
        .groupBy($"source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum($"n_email").cast("long").as("emails_redacted"),
          sum($"n_phone").cast("long").as("phones_redacted"),
          sum(length($"red")).cast("long").as("redacted_chars"),
          sum(length($"aug") - length($"red")).cast("long").as("chars_removed"))
        .orderBy($"source")
    },
    Some(s"""WITH aug AS (
        SELECT source,
          text ||
          CASE WHEN doc_id % 2 = 0
               THEN ' contact ' || source || '_' || doc_id || '@mail.example' ELSE '' END ||
          CASE WHEN doc_id % 3 = 0
               THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END AS aug
        FROM documents),
      red AS (
        SELECT source, aug,
          len(regexp_extract_all(aug, '$EmailRe')) AS n_email,
          len(regexp_extract_all(aug, '$PhoneRe')) AS n_phone,
          regexp_replace(regexp_replace(aug, '$EmailRe', '<EMAIL>', 'g'),
                         '$PhoneRe', '<PHONE>', 'g') AS red
        FROM aug)
    SELECT source, count(*) AS n_docs,
      CAST(sum(n_email) AS BIGINT) AS emails_redacted,
      CAST(sum(n_phone) AS BIGINT) AS phones_redacted,
      CAST(sum(length(red)) AS BIGINT) AS redacted_chars,
      CAST(sum(length(aug) - length(red)) AS BIGINT) AS chars_removed
    FROM red GROUP BY source ORDER BY source"""))

  // ---------------------------------------------------------------- q55
  /** Repetition-based quality filter — the Gopher-rule family: a doc is
    * dropped when its duplicate-word ratio (1 − distinct/total) or its
    * top-2-gram token fraction (tokens covered by the single most
    * frequent word bigram) crosses threshold. Thresholds sit at the
    * fixture's upper decile so the funnel drops a realistic ~7%.
    *
    * Scale shape: both metrics are PER-DOC higher-order expressions —
    * the most-frequent-bigram count is `array_max` over per-distinct-
    * bigram `filter` counts, O(L²) in the doc's word count but entirely
    * map-side (no explode, no gram shuffle; whole-stage codegen keeps
    * it in one stage). The only shuffle is the 5-row per-lang summary.
    * Long docs at 100 TB are length-chunked upstream, bounding L. */
  val RepDupMax = 0.75
  val RepTop2Max = 0.15

  /** Append `dup_ratio` and `top2_frac` to `df` from its `text` column
    * (per-doc HOF expressions — see q55's scale note). A doc with < 2
    * words has no bigram: `top2_frac` is null there (the guarded empty
    * bigram array makes `array_max` null on BOTH engines — an unguarded
    * `sequence(1, n-1)` would DESCEND through [1, 0] at n = 1 and throw
    * on `element_at(ws, 0)`). Package-visible for the short-doc spec. */
  private[graft] def withRepetitionMetrics(df: DataFrame, text: Column): DataFrame =
    df
      .withColumn("ws", split(trim(text), "\\s+"))
      .withColumn(
        "g2",
        when(size(col("ws")) >= 2,
          transform(
            sequence(lit(1), size(col("ws")) - 1),
            i => concat_ws(" ", element_at(col("ws"), i), element_at(col("ws"), i + 1))))
          .otherwise(array().cast("array<string>")))
      .withColumn(
        "dup_ratio",
        lit(1.0) - size(array_distinct(col("ws"))).cast("double") / size(col("ws")))
      .withColumn(
        "top2_frac",
        array_max(transform(
          array_distinct(col("g2")),
          g => size(filter(col("g2"), x => x === g)))).cast("double") * 2 / size(col("ws")))
      .drop("ws", "g2")

  private val q55 = Q(
    "q55_repetition_filter",
    (s, d) => {
      import s.implicits._
      val m = withRepetitionMetrics(docs(s, d).select($"lang", $"text"), $"text")
      m.groupBy($"lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(($"dup_ratio" < RepDupMax && $"top2_frac" < RepTop2Max).cast("long"))
            .cast("long").as("n_kept"),
          round(avg($"dup_ratio"), 4).as("avg_dup_ratio"),
          round(avg($"top2_frac"), 4).as("avg_top2_frac"))
        .orderBy($"lang")
    },
    Some(s"""WITH toks AS (
        SELECT lang, string_split_regex(trim(text), '\\s+') AS ws FROM documents),
      m AS (
        SELECT lang,
          1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS dup_ratio,
          CAST(list_max(list_transform(
                 list_distinct([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]),
                 g -> len(list_filter([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))],
                                      x -> x = g)))) AS DOUBLE)
            * 2 / len(ws) AS top2_frac
        FROM toks)
    SELECT lang, count(*) AS n_docs,
      CAST(sum(CASE WHEN dup_ratio < $RepDupMax AND top2_frac < $RepTop2Max
               THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      round(avg(dup_ratio), 4) AS avg_dup_ratio,
      round(avg(top2_frac), 4) AS avg_top2_frac
    FROM m GROUP BY lang ORDER BY lang"""))

  // ---------------------------------------------------------------- q65
  /** Gopher/C4-style heuristic quality battery — the rule set a
    * pretraining pipeline applies alongside the repetition filter (q55):
    * word-count bounds, mean-word-length bounds, minimum stopword count,
    * and minimum alphabetic-word fraction (Rae et al. 2021 §A1.1; the
    * C4 rules that survive a single-line lowercase corpus). Entirely
    * map-side per-doc HOF expressions + ONE lang groupBy; every output
    * is an integer count — no float aggregation, so the query is
    * bit-deterministic by construction (per-doc threshold comparisons
    * are single-division doubles, identical on both engines). Rule
    * knobs are declared at the top of the object (init-order contract
    * shared with q70). */
  private val q65 = Q(
    "q65_quality_filter",
    (s, d) => {
      import s.implicits._
      val ws = split(trim($"text"), "\\s+")
      val stopArr = array(Stopwords.map(lit): _*)
      val m = docs(s, d).select(
        $"lang",
        size(ws).cast("long").as("n_words"),
        (aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double") /
          size(ws)).as("mean_wl"),
        size(filter(ws, w => array_contains(stopArr, w))).cast("long").as("n_stop"),
        (size(filter(ws, w => w.rlike("[a-z]"))).cast("double") / size(ws))
          .as("alpha_frac"))
      m.select(
          $"lang",
          ($"n_words" < QMinWords || $"n_words" > QMaxWords).cast("long").as("f_words"),
          ($"mean_wl" < QMinMeanWl || $"mean_wl" > QMaxMeanWl).cast("long").as("f_wl"),
          ($"n_stop" < QMinStop).cast("long").as("f_stop"),
          ($"alpha_frac" < QMinAlphaFrac).cast("long").as("f_alpha"))
        .groupBy($"lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when($"f_words" + $"f_wl" + $"f_stop" + $"f_alpha" === 0, 1L).otherwise(0L))
            .as("n_kept"),
          sum($"f_words").as("n_fail_words"),
          sum($"f_wl").as("n_fail_word_len"),
          sum($"f_stop").as("n_fail_stopwords"),
          sum($"f_alpha").as("n_fail_alpha"))
        .orderBy($"lang")
    },
    Some(s"""WITH toks AS (
        SELECT lang, string_split_regex(trim(text), '\\s+') AS ws FROM documents),
      m AS (
        SELECT lang,
          CAST(len(ws) AS BIGINT) AS n_words,
          CAST(list_sum(list_transform(ws, w -> len(w))) AS DOUBLE) / len(ws) AS mean_wl,
          CAST(len(list_filter(ws, w -> w IN (${Stopwords.map(w => s"'$w'").mkString(", ")})))
            AS BIGINT) AS n_stop,
          CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) / len(ws)
            AS alpha_frac
        FROM toks),
      f AS (
        SELECT lang,
          CAST(n_words < $QMinWords OR n_words > $QMaxWords AS BIGINT) AS f_words,
          CAST(mean_wl < $QMinMeanWl OR mean_wl > $QMaxMeanWl AS BIGINT) AS f_wl,
          CAST(n_stop < $QMinStop AS BIGINT) AS f_stop,
          CAST(alpha_frac < $QMinAlphaFrac AS BIGINT) AS f_alpha
        FROM m)
    SELECT lang, count(*) AS n_docs,
      CAST(sum(CASE WHEN f_words + f_wl + f_stop + f_alpha = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      CAST(sum(f_words) AS BIGINT) AS n_fail_words,
      CAST(sum(f_wl) AS BIGINT) AS n_fail_word_len,
      CAST(sum(f_stop) AS BIGINT) AS n_fail_stopwords,
      CAST(sum(f_alpha) AS BIGINT) AS n_fail_alpha
    FROM f GROUP BY lang ORDER BY lang"""))

  // ---------------------------------------------------------------- q67
  /** Token counting under a BPE-style pretokenizer (the GPT-2 pretoken
    * split re-expressed for a lowercase corpus): ` ?[a-z]+ | ?[0-9]+ |
    * ?[^a-z0-9 ]+` — alpha runs, digit runs, and punctuation runs, each
    * absorbing one leading space. Run against the events stream's
    * semi-structured text (`event_type` + JSON `props`), where it
    * genuinely diverges from whitespace tokenization (`{"k": 69}` is 2
    * whitespace tokens but 4 pretokens) — the token-budget accounting an
    * LLM ingest of log data runs. documents.text is pure `[a-z ]`, where
    * the two tokenizers coincide by construction (q25 covers it).
    *
    * Map-side regex + one event_type groupBy; every output an integer
    * sum — bit-deterministic. The alternation is first-char-disjoint
    * after the optional space, so leftmost-first matching (Java regex
    * AND RE2) picks the same token boundaries. */
  private val BpePattern = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

  private val q67 = Q(
    "q67_token_bpe",
    (s, d) => {
      import s.implicits._
      val text = concat($"event_type", lit(" "), $"props")
      Tables(s, d, "events")
        .select(
          $"event_type",
          size(split(trim(text), "\\s+")).cast("long").as("ws_toks"),
          size(regexp_extract_all(text, lit(BpePattern), lit(0))).cast("long").as("bpe_toks"),
          length(text).cast("long").as("chars"))
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n_events"),
          sum($"ws_toks").as("ws_tokens"),
          sum($"bpe_toks").as("bpe_tokens"),
          sum($"chars").as("n_chars"))
        .orderBy($"event_type")
    },
    Some(s"""WITH t AS (
        SELECT event_type, event_type || ' ' || props AS text FROM events),
      m AS (
        SELECT event_type,
          CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS ws_toks,
          CAST(len(regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+')) AS BIGINT) AS bpe_toks,
          CAST(length(text) AS BIGINT) AS chars
        FROM t)
    SELECT event_type, count(*) AS n_events,
      CAST(sum(ws_toks) AS BIGINT) AS ws_tokens,
      CAST(sum(bpe_toks) AS BIGINT) AS bpe_tokens,
      CAST(sum(chars) AS BIGINT) AS n_chars
    FROM m GROUP BY event_type ORDER BY event_type"""))

  // ---------------------------------------------------------------- q60
  /** Upstream length-chunking — the operator q55's scale note PRESUMES
    * (VERDICT r7 next #5): `top2_frac` is O(L²) in a doc's word count,
    * so unbounded crawl documents must be split into ≤[[ChunkWords]]-word
    * chunks before the repetition filter (and before sequence packing,
    * whose window also benefits from bounded rows). Entirely map-side:
    * split → slice into word windows → posexplode; no shuffle, and every
    * metadata column rides along with (chunk_id, chunk_text). Word
    * preservation is structural — the chunk slices partition the word
    * array — and asserted in the planted long-doc spec. */
  val ChunkWords = 64

  /** Chunk `df` on `text` into ≤`l`-word pieces. Output = every input
    * column plus `chunk_id` (0-based within doc) and `chunk_words`
    * (the chunk's word array; `array_join(_, " ")` is the chunk text).
    * A blank text yields its single `[""]` token chunk — never zero
    * rows — so downstream per-doc accounting keeps seeing the doc. */
  def chunkByWords(df: DataFrame, text: Column, l: Int): DataFrame = {
    val ws = split(trim(text), "\\s+")
    // ceil(n/l) chunk starts; the guarded sequence never descends
    // (q55's lesson: sequence(0, -1) DESCENDS rather than yielding [])
    val chunks = transform(
      sequence(lit(0), (ceil(size(ws).cast("double") / l) - 1).cast("int")),
      i => slice(ws, i * l + 1, lit(l)))
    df
      .withColumn("__chunks", chunks)
      .select(
        df.columns.toIndexedSeq.map(col) :+
          posexplode(col("__chunks")).as(Seq("chunk_id", "chunk_words")): _*)
  }

  private val q60 = Q(
    "q60_length_chunk",
    (s, d) => {
      import s.implicits._
      chunkByWords(docs(s, d).select($"source", $"doc_id", $"text"), $"text", ChunkWords)
        .groupBy($"source")
        .agg(
          // every doc emits exactly one chunk 0, so counting them is a
          // MAP-SIDE doc count — no countDistinct two-phase shuffle of
          // (source, doc_id) pairs (PlanSpec pins the single-agg shape)
          sum(when($"chunk_id" === 0, 1L).otherwise(0L)).cast("long").as("n_docs"),
          count(lit(1)).as("n_chunks"),
          max(size($"chunk_words")).as("max_chunk_words"),
          sum(size($"chunk_words")).cast("long").as("total_words"),
          // q55's dup metric restated over chunks as an ORDER-FREE
          // integer ratio (dup words / total words) — exact-sum, then
          // one divide: bit-deterministic across engines
          round(
            sum((size($"chunk_words") - size(array_distinct($"chunk_words"))).cast("long"))
              .cast("double") / sum(size($"chunk_words")).cast("double"),
            4).as("dup_word_ratio"))
        .orderBy($"source")
    },
    Some(s"""WITH toks AS (
        SELECT source, doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents),
      ch AS (
        SELECT source, doc_id, u['cid'] AS cid, u['cw'] AS cw FROM (
          SELECT source, doc_id,
                 unnest([{'cid': i, 'cw': ws[i*$ChunkWords+1 : i*$ChunkWords+$ChunkWords]}
                         for i in range(0, CAST(ceil(len(ws) / $ChunkWords.0) AS INT))]) AS u
          FROM toks))
    SELECT source,
      CAST(sum(CASE WHEN cid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
      count(*) AS n_chunks,
      max(len(cw)) AS max_chunk_words,
      CAST(sum(len(cw)) AS BIGINT) AS total_words,
      round(CAST(sum(len(cw) - len(list_distinct(cw))) AS DOUBLE) / CAST(sum(len(cw)) AS DOUBLE), 4)
        AS dup_word_ratio
    FROM ch GROUP BY source ORDER BY source"""))

  // ---------------------------------------------------------------- q62
  /** Character-n-gram language identification — the Cavnar–Trenkle
    * rank-profile classifier (the "n-gram heuristic" language-ID the
    * stopword-ratio screen of q25 approximates at word level): each
    * LANGUAGE gets a profile of its top-[[LangIdK]] char trigrams by
    * frequency; each DOC gets the same profile of its own text; the doc
    * is assigned the language minimizing the out-of-place distance
    * Σ |rank_doc − rank_lang| (absent trigram → [[LangIdK]] penalty).
    * Ranks, distances and penalties are ALL INTEGERS, so the whole
    * classifier is bit-deterministic across engines — no float anywhere.
    *
    * Scale shape (the q56 discipline): trigrams are hashed through the
    * 31-bit portable hash MAP-SIDE — gram strings never shuffle. Two
    * hash-aggregates build the profiles (per-(doc,h) counts, then
    * bounded-heap top-K per doc — no per-doc window sort); the language
    * profiles are L×K rows, broadcast; scoring is docs×K×L narrow rows
    * joined map-side against the broadcast. Training uses the corpus's
    * own labels (the qrels analog of self-supervision); classifying a
    * new crawl reuses the broadcast profiles unchanged. */
  val LangIdK = 40

  /** (doc_id, h, cnt) char-trigram code counts — the shared build step
    * for doc and language profiles. Lowercased, whitespace included
    * (word-boundary trigrams carry signal in Cavnar–Trenkle). The code
    * is a PERFECT 3-byte pack — `ascii(c₁)·2¹⁶ + ascii(c₂)·2⁸ +
    * ascii(c₃)` — collision-FREE on the fixture's guarded ASCII range
    * and ~6 ops/gram, where the 24-round [[graft.functions
    * .PortableHash]] (built for arbitrary-length shingles) measured as
    * the dominant q62 cost (22 s → ~4 s at sf0.1). No gram STRING is
    * ever materialized: codes are computed straight off the text, so
    * nothing but integers reaches the explode or any shuffle. */
  private def triCounts(docsDf: DataFrame): DataFrame = {
    // ONE-PASS codegen trigram kernel (round 16, guide §1.2 "per-task
    // work"): the former interpreted HOF form — `transform(sequence(…))`
    // with 3 `ascii(substr(…))` per gram — is CodegenFallback and
    // measured 4-5 µs/gram, ~73 s of task CPU at sf0.1 (the suite's
    // single largest expression cost, and the most host-degradation-
    // exposed: q62 read 3.9-32.8 s across same-day runs). TriGramCodes
    // walks the UTF-8 bytes once per ROW; GramCodesSpec pins value
    // equality against the HOF form (kept there as the oracle), and the
    // DuckDB oracle SQL is unchanged. lower() evaluates once per row as
    // the expression's argument — the old `__t` pre-projection trick is
    // unnecessary without a HOF lambda re-evaluating its free subtrees.
    val codes = org.apache.spark.sql.GraftInternal.column(
      graft.functions.TriGramCodes(
        org.apache.spark.sql.GraftInternal.expression(lower(col("text")))))
    // see [[rebalanced]] — hash-partitioning by doc_id additionally
    // co-locates every gram of a doc, so BOTH doc-side aggregates below
    // are satisfied by this one distribution (no further doc-side
    // exchange)
    rebalanced(docsDf)
      .select(col("doc_id"), col("lang"), explode(codes).as("h"))
      .groupBy(col("doc_id"), col("lang"), col("h"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Ranked top-[[LangIdK]] profile rows (…, h, rnk) from (…, h, cnt)
    * via the bounded-heap aggregate; ties (equal count) break h-asc —
    * the heap's (score desc, id asc) order, mirrored by the oracle's
    * ROW_NUMBER. */
  private def profile(counts: DataFrame, keys: Seq[String]): DataFrame =
    counts
      .groupBy(keys.map(col): _*)
      .agg(graft.functions.TopKAgg.collectTopK(
        col("cnt").cast("double"), col("h"), LangIdK).as("topk"))
      .select(keys.map(col) :+ posexplode(col("topk")).as(Seq("pos", "hit")): _*)
      .select(keys.map(col) :+ (col("pos") + 1).cast("long").as("rnk")
        :+ col("hit.id").as("h"): _*)

  /** Per-doc predicted language: (doc_id, lang, pred_lang). Profiles are
    * trained from `docsDf`'s own labels; package-visible for the planted
    * distinct-alphabet spec. `cacheCounts` lets the registry path memoize
    * the trigram-count frame — BOTH profile branches consume it, and
    * without a cache the explode+hash scan recomputes per branch (the
    * dominant cost: measured 15 s → ~8 s at sf0.1). */
  private[graft] def langIdPredictions(
      docsDf: DataFrame,
      cacheCounts: DataFrame => DataFrame = identity): DataFrame = {
    val counts = cacheCounts(triCounts(docsDf))
    val langProf = profile(
      counts.groupBy(col("lang"), col("h")).agg(sum(col("cnt")).as("cnt")), Seq("lang"))
      .withColumnRenamed("rnk", "lang_rnk")
      .withColumnRenamed("lang", "cand_lang")
    val docProf = profile(counts, Seq("doc_id", "lang"))
    val langs = langProf.select(col("cand_lang")).distinct()
    // docs×K×L scoring rows; the candidate side is L×K → broadcast
    val scored = docProf
      .crossJoin(broadcast(langs))
      .join(broadcast(langProf), Seq("cand_lang", "h"), "left_outer")
      .groupBy(col("doc_id"), col("lang"), col("cand_lang"))
      .agg(sum(
        when(col("lang_rnk").isNull, lit(LangIdK.toLong))
          .otherwise(abs(col("rnk") - col("lang_rnk")))).as("dist"))
    // argmin over candidates (ties → lang asc): the window sees L rows
    // per doc (L = languages, a constant) — bounded per key at any scale
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("dist").asc, col("cand_lang").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("cand_lang").as("pred_lang"))
  }

  private val q62 = Q(
    "q62_langid_ngram",
    (s, d) => {
      import s.implicits._
      langIdPredictions(
        docs(s, d).select($"doc_id", $"lang", $"text"),
        cts => graft.Memo.cached(s, s"langid-tri:$d")(cts))
        .groupBy($"lang", $"pred_lang")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy($"lang", $"pred_lang")
    },
    Some(s"""WITH tri AS (
        SELECT doc_id, lang, h, count(*) AS cnt FROM (
          SELECT doc_id, lang,
                 unnest([ascii(substr(lower(text), i, 1)) * 65536
                         + ascii(substr(lower(text), i + 1, 1)) * 256
                         + ascii(substr(lower(text), i + 2, 1))
                         for i in range(1, length(text) - 1)]) AS h
          FROM documents)
        GROUP BY doc_id, lang, h),
      lang_prof AS (
        SELECT lang AS cand_lang, h, row_number() OVER (
                 PARTITION BY lang ORDER BY cnt DESC, h) AS lang_rnk
        FROM (SELECT lang, h, sum(cnt) AS cnt FROM tri GROUP BY lang, h)
        QUALIFY lang_rnk <= $LangIdK),
      doc_prof AS (
        SELECT doc_id, lang, h, row_number() OVER (
                 PARTITION BY doc_id ORDER BY cnt DESC, h) AS rnk
        FROM tri QUALIFY rnk <= $LangIdK),
      scored AS (
        SELECT p.doc_id, p.lang, c.cand_lang,
               sum(CASE WHEN l.lang_rnk IS NULL THEN $LangIdK
                        ELSE abs(p.rnk - l.lang_rnk) END) AS dist
        FROM doc_prof p
        CROSS JOIN (SELECT DISTINCT cand_lang FROM lang_prof) c
        LEFT JOIN lang_prof l ON l.cand_lang = c.cand_lang AND l.h = p.h
        GROUP BY p.doc_id, p.lang, c.cand_lang),
      best AS (
        SELECT doc_id, lang, cand_lang, row_number() OVER (
                 PARTITION BY doc_id ORDER BY dist, cand_lang) AS rn
        FROM scored)
    SELECT lang, cand_lang AS pred_lang, count(*) AS n_docs
    FROM best WHERE rn = 1 GROUP BY lang, cand_lang ORDER BY lang, pred_lang"""))

  // ---------------------------------------------------------------- q56
  /** Cross-document boilerplate detection — the corpus-level complement
    * of q55's within-doc repetition (RefinedWeb/CCNet-style: crawls are
    * full of headers, footers and licence blocks that repeat ACROSS
    * pages). A word-3-gram is "hot" when its document frequency reaches
    * H = max([[BoilerDfFloor]], ceil([[BoilerDfFrac]] · n_docs)) — a
    * RELATIVE cutoff so the rule keeps meaning as the corpus grows — and
    * a doc's boilerplate fraction is the share of its distinct (hashed)
    * grams that are hot; docs at ≥ [[BoilerFlagTau]] are flagged.
    *
    * Scale shape: gram df is ONE hash-groupBy on the 31-bit
    * [[graft.functions.PortableHash]] of the gram (the gram STRING never
    * shuffles); per-doc distinctness is `array_distinct` map-side, so
    * the df input is already one row per (doc, gram). The hot set joins
    * back as a standard equi-join on the hash that AQE broadcasts when
    * it fits. No pairwise comparison anywhere — total cost is O(total
    * grams), the same budget q22's df-cap computation already pays. */
  val BoilerDfFloor = 5L
  val BoilerDfFrac = 0.002
  val BoilerFlagTau = 0.5

  /** Per-doc boilerplate metrics over a documents-shaped frame — the
    * testable seam (the spec plants a boilerplate block across synthetic
    * docs; q56 goes through [[boilerplateFromShingles]] on the memoized
    * session shingle frame instead). Docs with < 3 words have no 3-gram
    * and drop out (mirrored in the oracle, where `unnest` of the empty
    * list yields no rows). */
  private[graft] def boilerplateFrame(s: SparkSession, docsDf: DataFrame): DataFrame =
    boilerplateFromShingles(s, shingleFrameOf(s, docsDf), docsDf.count())

  private def boilerplateFromShingles(s: SparkSession, shingleDf: DataFrame, nDocs: Long): DataFrame = {
    import s.implicits._
    val tok = shingleDf
      .select($"doc_id", array_distinct(transform($"s", g => shingleHash(g))).as("hs"))
      .select($"doc_id", explode($"hs").as("h"))
    val dfreq = tok.groupBy($"h").agg(count(lit(1)).as("df"))
    // H is a SCALAR function of one count — resolved driver-side so the
    // hot-set filter is a literal predicate, not a 1-row join (the
    // crossJoin(count-frame) alternative plans as a nested-loop join,
    // which the plan suite forbids). count() on parquet is metadata-cheap.
    val hotCutoff = math.max(BoilerDfFloor, math.ceil(nDocs * BoilerDfFrac).toLong)
    val hot = dfreq
      .filter($"df" >= hotCutoff)
      .select($"h", lit(1L).as("hot"))
    tok
      .join(hot, Seq("h"), "left")
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce($"hot", lit(0L))).cast("long").as("n_hot"))
      .select(
        $"doc_id",
        $"n_grams",
        $"n_hot",
        round($"n_hot".cast("double") / $"n_grams", 4).as("hot_frac"),
        ($"n_hot".cast("double") / $"n_grams" >= BoilerFlagTau).as("flagged"))
      .orderBy($"doc_id")
  }

  private val q56 = Q(
    "q56_boilerplate",
    // registry path rides the session-memoized shingle frame q22–q24
    // share — a Verify/Bench session must not pay the per-doc shingle
    // transform a second time
    (s, d) => boilerplateFromShingles(s, shingleFrameCached(s, d), docs(s, d).count()),
    Some(s"""WITH $duckShingles,
      tok AS (SELECT DISTINCT doc_id, ${duckHash("g")} AS h
              FROM (SELECT doc_id, unnest(s) AS g FROM sh) u),
      dfreq AS (SELECT h, count(*) AS df FROM tok GROUP BY h),
      nd AS (SELECT count(*) AS n_docs FROM documents),
      hot AS (SELECT h FROM dfreq, nd
              WHERE df >= greatest($BoilerDfFloor, CAST(ceil(n_docs * $BoilerDfFrac) AS BIGINT))),
      per AS (SELECT t.doc_id, count(*) AS n_grams,
                     CAST(sum(CASE WHEN hot.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hot
              FROM tok t LEFT JOIN hot ON t.h = hot.h
              GROUP BY t.doc_id)
    SELECT doc_id, n_grams, n_hot,
           round(CAST(n_hot AS DOUBLE) / n_grams, 4) AS hot_frac,
           (CAST(n_hot AS DOUBLE) / n_grams >= $BoilerFlagTau) AS flagged
    FROM per ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q71
  /** Per-source percentile quality gate — "dynamic thresholding": instead
    * of one global cutoff, each source drops its own bottom
    * [[GateFrac]]-quantile of a per-doc integer quality score (FineWeb /
    * CCNet practice: per-domain score distributions differ too much for a
    * global knob). The score here is the fixture's `n_chars` column; any
    * integer doc score (q65's rule count, q69's nll bucket) plugs into
    * the same shape.
    *
    * Scale shape: the threshold comes from a per-source HISTOGRAM of the
    * integer score (groupBy, then a cumulative window over |sources| ×
    * |distinct scores| rows — the corpus itself is never sorted or
    * windowed), thresholds broadcast back (|sources| rows), and the gate
    * is a map-side filter feeding one final aggregate. The exact
    * k-th-smallest contract (k = ceil(GateFrac·n), duplicates counted)
    * stays integer end to end — no float-quantile divergence class. */
  private val GateFrac = 0.25

  private val q71 = Q(
    "q71_quality_gate",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val dd = docs(s, d).select($"source", $"doc_id", $"n_chars")
      val hist = dd.groupBy($"source", $"n_chars").agg(count(lit(1)).as("cnt"))
      val cum = hist
        .withColumn("cum", sum($"cnt").over(
          Window.partitionBy($"source").orderBy($"n_chars")))
        .withColumn("n", sum($"cnt").over(Window.partitionBy($"source")))
      val thr = cum
        .filter($"cum" >= ceil(lit(GateFrac) * $"n"))
        .groupBy($"source")
        .agg(min($"n_chars").as("threshold"))
      dd.join(broadcast(thr), Seq("source"))
        .groupBy($"source")
        .agg(
          max($"threshold").as("threshold"),
          count(when($"n_chars" >= $"threshold", 1)).as("n_kept"),
          count(when($"n_chars" < $"threshold", 1)).as("n_dropped"),
          sum(when($"n_chars" >= $"threshold", $"n_chars").otherwise(0L)).as("chars_kept"))
        .orderBy($"source")
    },
    Some(s"""WITH hist AS (
        SELECT source, n_chars, count(*) AS cnt FROM documents GROUP BY 1, 2),
      cum AS (
        SELECT source, n_chars,
               sum(cnt) OVER (PARTITION BY source ORDER BY n_chars) AS cum,
               sum(cnt) OVER (PARTITION BY source) AS n
        FROM hist),
      thr AS (
        SELECT source, min(n_chars) AS threshold
        FROM cum WHERE cum >= ceil($GateFrac * n) GROUP BY source)
    SELECT d.source,
           CAST(max(t.threshold) AS BIGINT) AS threshold,
           count(*) FILTER (WHERE d.n_chars >= t.threshold) AS n_kept,
           count(*) FILTER (WHERE d.n_chars < t.threshold) AS n_dropped,
           CAST(sum(CASE WHEN d.n_chars >= t.threshold THEN d.n_chars ELSE 0 END) AS BIGINT) AS chars_kept
    FROM documents d JOIN thr t USING (source)
    GROUP BY d.source ORDER BY d.source"""))

  // ---------------------------------------------------------------- q75
  /** Incremental dedup — the INGESTION-time shape: an arriving batch is
    * deduplicated AGAINST the already-ingested corpus (q46–q48 dedup
    * within one corpus; a production pipeline runs this form on every
    * delivery). Batch = odd doc_ids, corpus = even (the deterministic
    * fixture split standing in for arrival time). Verdict per batch doc:
    * `exact` (its `md5(trim(text))` fingerprint exists in the corpus),
    * else `near` (shares ≥1 MinHash band signature with a corpus doc —
    * q47's collision primitive, restricted across the boundary), else
    * `new`; `match_id` is the smallest matching corpus doc (−1 for new).
    *
    * Scale shape: two hash equi-joins — fingerprints and band
    * signatures — in which ONLY the batch side is new work; the corpus
    * side is the persisted fingerprint/band index an ingestion pipeline
    * maintains incrementally. Nothing corpus-sized is ever compared
    * pairwise. */
  private val q75 = Q(
    "q75_incremental_dedup",
    (s, d) => {
      import s.implicits._
      val fp = docs(s, d).select($"doc_id", md5(trim($"text")).as("fp"))
      val exact = fp.filter($"doc_id" % 2 === 1)
        .join(fp.filter($"doc_id" % 2 === 0).select($"fp", $"doc_id".as("cid")), Seq("fp"))
        .groupBy($"doc_id")
        .agg(min($"cid").as("exact_of"))
      val bands = bandFrameCached(s, d)
      val near = bands.filter($"doc_id" % 2 === 1)
        .join(
          bands.filter($"doc_id" % 2 === 0).select($"doc_id".as("ncid"), $"bv"),
          Seq("bv"))
        .groupBy($"doc_id")
        .agg(min($"ncid").as("near_of"))
      docs(s, d).filter($"doc_id" % 2 === 1).select($"doc_id")
        .join(exact, Seq("doc_id"), "left")
        .join(near, Seq("doc_id"), "left")
        .select(
          $"doc_id",
          when($"exact_of".isNotNull, "exact")
            .when($"near_of".isNotNull, "near")
            .otherwise("new").as("verdict"),
          coalesce($"exact_of", $"near_of", lit(-1L)).as("match_id"))
        .orderBy($"doc_id")
    },
    Some(s"""WITH $duckShingles,
        $duckBandCtes,
      fp AS (SELECT doc_id, md5(trim(text)) AS fp FROM documents),
      ex AS (
        SELECT b.doc_id, min(c.doc_id) AS exact_of
        FROM fp b JOIN fp c ON b.fp = c.fp
        WHERE b.doc_id % 2 = 1 AND c.doc_id % 2 = 0
        GROUP BY b.doc_id),
      nr AS (
        SELECT a.doc_id, min(b.doc_id) AS near_of
        FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
        WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
        GROUP BY a.doc_id)
    SELECT d.doc_id,
           CASE WHEN ex.exact_of IS NOT NULL THEN 'exact'
                WHEN nr.near_of IS NOT NULL THEN 'near'
                ELSE 'new' END AS verdict,
           coalesce(ex.exact_of, nr.near_of, -1) AS match_id
    FROM documents d
    LEFT JOIN ex ON ex.doc_id = d.doc_id
    LEFT JOIN nr ON nr.doc_id = d.doc_id
    WHERE d.doc_id % 2 = 1 ORDER BY d.doc_id"""))

  // ---------------------------------------------------------------- q73
  /** Count-min-sketch heavy hitters: the D×W counter-matrix sketch
    * (Cormode–Muthukrishnan) over the corpus token stream, reported for
    * the exact top-[[CmsTopK]] tokens next to their true counts — the
    * one-sided `est ≥ exact` accuracy contract made visible (and pinned
    * in TextPipelineSpec).
    *
    * Scale shape: ONE corpus scan feeds the exact vocabulary aggregate;
    * the three bucket-sum frames then derive from the VOCAB frame (≤ W
    * rows each after their map-side partial agg — summing `cnt` per
    * bucket over the vocab is identical to counting raw occurrences per
    * bucket), and estimates attach to the top-k report rows by three
    * broadcast joins on bucket id. On an unbounded stream the same
    * bucket frames are the sketch state: W·D longs, no vocabulary kept.
    *
    * Row hashes are pairwise-independent-style LCG mixes of the
    * [[graft.functions.PortableHash]] value — plain 64-bit-safe integer
    * arithmetic both engines evaluate identically (a_j·h < 1.2e9 · 2^31
    * < 2^62), so the oracle replays the SKETCH itself, not just the
    * report. */
  private val CmsW = 512
  private val CmsTopK = 10
  private val CmsA = Seq(1103515245L, 1140671485L, 214013L)
  private val CmsB = Seq(12345L, 12820163L, 2531011L)

  private val q73 = Q(
    "q73_cms_heavy_hitters",
    (s, d) => {
      import s.implicits._
      val P = graft.functions.PortableHash.P
      // rebalanced + memoized vocab (round 16, guide §2.4/§2.6): the
      // un-cached plan recomputed the whole explode+groupBy subtree FOUR
      // times (once per bucket-sum frame + once for the top-k), each on
      // the doc table's single input split — 15 s of one-task CPU for a
      // 31-row vocabulary. The vocab frame is sketch-state-sized (≤
      // corpus vocabulary), so caching it is the streaming design's own
      // claim ("the bucket frames are the sketch state")
      val tok = rebalanced(docs(s, d))
        .select(explode(split(trim($"text"), "\\s+")).as("token"))
        .filter(length($"token") > 0)
      val cnt = graft.Memo.cached(s, s"cms-vocab:$d")(
        tok
          .groupBy($"token")
          .agg(count(lit(1)).as("cnt"))
          .withColumn("h", graft.functions.PortableHash.hash($"token")))
      def bucket(j: Int): Column =
        ((lit(CmsA(j)) * col("h") + lit(CmsB(j))) % lit(P)) % lit(CmsW.toLong)
      val sums = (0 until 3).map { j =>
        cnt.groupBy(bucket(j).as(s"b$j")).agg(sum($"cnt").as(s"s$j"))
      }
      val top = cnt
        .orderBy($"cnt".desc, $"token")
        .limit(CmsTopK)
        .withColumn("b0", bucket(0))
        .withColumn("b1", bucket(1))
        .withColumn("b2", bucket(2))
      top
        .join(broadcast(sums(0)), Seq("b0"))
        .join(broadcast(sums(1)), Seq("b1"))
        .join(broadcast(sums(2)), Seq("b2"))
        .select(
          $"token",
          $"cnt".as("exact_cnt"),
          least($"s0", $"s1", $"s2").as("cms_est"))
        .orderBy($"exact_cnt".desc, $"token")
    },
    Some {
      val P = graft.functions.PortableHash.P
      def bucket(j: Int) = s"(((${CmsA(j)} * h + ${CmsB(j)}) % $P) % $CmsW)"
      s"""WITH tok AS (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token FROM documents),
      cnt0 AS (
        SELECT token, count(*) AS cnt
        FROM tok WHERE length(token) > 0 GROUP BY token),
      cnt AS (SELECT token, cnt, ${duckHash("token")} AS h FROM cnt0),
      s0 AS (SELECT ${bucket(0)} AS b0, CAST(sum(cnt) AS BIGINT) AS s0 FROM cnt GROUP BY 1),
      s1 AS (SELECT ${bucket(1)} AS b1, CAST(sum(cnt) AS BIGINT) AS s1 FROM cnt GROUP BY 1),
      s2 AS (SELECT ${bucket(2)} AS b2, CAST(sum(cnt) AS BIGINT) AS s2 FROM cnt GROUP BY 1),
      top AS (
        SELECT token, cnt, ${bucket(0)} AS b0, ${bucket(1)} AS b1, ${bucket(2)} AS b2
        FROM cnt ORDER BY cnt DESC, token LIMIT $CmsTopK)
    SELECT t.token, t.cnt AS exact_cnt, least(s0.s0, s1.s1, s2.s2) AS cms_est
    FROM top t JOIN s0 USING (b0) JOIN s1 USING (b1) JOIN s2 USING (b2)
    ORDER BY exact_cnt DESC, token"""
    })

  // ---------------------------------------------------------------- q77
  /** HyperLogLog distinct-cardinality sketch (Flajolet et al. 2007) over
    * the corpus vocabulary — the fixed-memory companion to q41's KMV and
    * q73's CMS, completing the classic sketch trio. At 100 TB this is how
    * vocabulary size (BPE budget sizing) or per-shard distinct-doc counts
    * are estimated in ONE pass with [[HllM]] longs of state per
    * aggregation key: the register frame is a map-side partial `max` —
    * no distinct shuffle, no vocabulary kept — and registers MERGE by
    * max, so shard sketches combine losslessly (unlike exact distinct).
    *
    * Portable-arithmetic contract (the sketch itself is what the oracle
    * replays, as with q73): h = [[graft.functions.PortableHash]] in
    * [0, 2³¹−1); register = h mod m; w = h div m < 2^[[HllWBits]]; rank
    * ρ(w) = leading-zero count within [[HllWBits]] bits + 1, computed by
    * an integer comparison chain (no float log in either engine). The
    * harmonic indicator Σ 2^−M_j is published scaled by 2^(WBits+1) —
    * an exact integer since M_j ≤ WBits+1 — and the raw estimate
    * α_m·m²/Z with α_64 = 0.709 is the all-integer floor division
    * `(709·m²·2^(WBits+1)) div (1000·S)`. `v_zero` (empty-register
    * count) is published so a consumer can apply the standard
    * linear-counting small-range correction; the error contract
    * (|est−exact|/exact within ~3σ = 39% for m = 64) is pinned in
    * TextPipelineSpec next to the exact count. */
  private val q77 = Q(
    "q77_hll_distinct",
    (s, d) => {
      import s.implicits._
      val H = graft.functions.Hll
      val tok = rebalanced(docs(s, d))
        .select(explode(split(trim($"text"), "\\s+")).as("token"))
        .filter(length($"token") > 0)
        .select(graft.functions.PortableHash.hash($"token").as("h"))
      val regs = tok
        .select(H.reg($"h").as("reg"), H.rhoOf(H.w("h")).as("rho"))
        .groupBy($"reg").agg(max($"rho").as("mrho"))
      val full = s.range(H.M).select($"id".as("reg"))
        .join(regs, Seq("reg"), "left").na.fill(0, Seq("mrho"))
      val exact = rebalanced(docs(s, d))
        .select(explode(split(trim($"text"), "\\s+")).as("token"))
        .filter(length($"token") > 0)
        .agg(countDistinct($"token").as("exact_distinct"))
      full
        .agg(
          count(lit(1)).as("m"),
          sum(when($"mrho" === 0, 1L).otherwise(0L)).as("v_zero"),
          sum(H.indicator("mrho")).as("s_scaled"))
        .crossJoin(exact)
        .select($"m", $"v_zero", $"s_scaled",
          H.estimate("s_scaled").as("hll_est"),
          $"exact_distinct")
    },
    Some {
      val H = graft.functions.Hll
      s"""WITH tok AS (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token FROM documents),
      tk AS (SELECT token, ${duckHash("token")} AS h FROM tok WHERE length(token) > 0),
      tr AS (SELECT ${H.duckReg("h")} AS reg, ${H.duckW("h")} AS w FROM tk),
      rr AS (SELECT reg, ${H.duckRhoCase("w")} AS rho FROM tr),
      mx AS (SELECT reg, max(rho) AS mrho FROM rr GROUP BY reg),
      allreg AS (
        SELECT r.reg, coalesce(mx.mrho, 0) AS mrho
        FROM range(0, ${H.M}) AS r(reg) LEFT JOIN mx ON mx.reg = r.reg),
      summ AS (
        SELECT count(*) AS m,
               CAST(sum(CASE WHEN mrho = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero,
               CAST(sum(${H.duckIndicator("mrho")}) AS BIGINT) AS s_scaled
        FROM allreg),
      ex AS (SELECT count(DISTINCT token) AS exact_distinct FROM tk)
    SELECT m, v_zero, s_scaled, ${H.duckEstimate("s_scaled")} AS hll_est, exact_distinct
    FROM summ, ex"""
    })

  // ---------------------------------------------------------------- q78
  /** Duplicate-SPAN fraction — substring-level dedup (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"): the
    * unit of duplication is a [[SpanW]]-token window, not the document,
    * so boilerplate shared across otherwise-distinct pages (headers,
    * license blocks, templated intros) is measurable even when no
    * doc-level fingerprint fires. Per doc: total windows, windows whose
    * hash occurs ≥ 2 times CORPUS-WIDE (within-doc repeats count — a
    * span "appearing more than once" anywhere is the Lee et al.
    * criterion), and the duplicated-window per-mille as an exact integer
    * division — the filter column an exact-substring dedup pass gates on.
    *
    * Scale shape: windows explode map-side from one corpus scan (the
    * tokenization is a separate projection, same HOF-re-evaluation trap
    * as [[shingleFrameOf]]); the global window-hash count is ONE hash
    * aggregate; flags attach by an equi-join of the (doc, hash)
    * aggregate against the hash-count frame — shuffle-on-key both
    * sides, no broadcast of a corpus-sized set, no window function over
    * the corpus. Everything after tokenization is 24-char [[PortableHash
    * hashes]] — no window STRING ever shuffles (the q62 discipline). */
  private val SpanW = 5

  /** Memoized (doc_id, wh) span-hash frame: every [[SpanW]]-token window
    * of every doc, hashed — q78 (dup-span metric) and q83 (span Bloom)
    * consume the identical projection.
    *
    * Two-stage cache, the [[shingleFrameOf]] discipline taken one step
    * further: the ARRAY frame is cached BEFORE the explode. Caching the
    * exploded frame instead let Catalyst push the Generate's inferred
    * `size(…) > 0` filter through the projection into the raw-text scan
    * with the whole window HOF inlined — re-running `split(trim(text))`
    * per element_at, O(windows · W · tokens) per doc (measured: a 24 s
    * recompute of a frame whose honest cost is 2 s at sf0.1). Exploding
    * FROM the cached arrays keeps that filter on the materialized
    * column. */
  private def spanFrame(s: SparkSession, d: String): DataFrame =
    graft.Memo.cached(s, s"spans:$d") {
      import s.implicits._
      val ws = $"ws"
      val arrays = graft.Memo.cached(s, s"span-arrays:$d") {
        rebalanced(docs(s, d))
          .select($"doc_id", split(trim($"text"), "\\s+").as("ws"))
          .select($"doc_id",
            when(size(ws) >= SpanW,
              transform(
                sequence(lit(1), size(ws) - (SpanW - 1)),
                i => concat_ws(" ", (0 until SpanW).map(o => element_at(ws, i + o)): _*)))
              .otherwise(array().cast("array<string>")).as("wins"))
      }
      arrays
        .select($"doc_id", explode($"wins").as("win"))
        .select($"doc_id", graft.functions.PortableHash.hash($"win").as("wh"))
    }

  /** DuckDB mirror of [[spanFrame]] (CTE `wins`). */
  private def duckSpans: String =
    s"""toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents),
      wins AS (
        SELECT doc_id, ${duckHash("w")} AS wh FROM (
          SELECT doc_id,
                 unnest([array_to_string(ws[i:i+${SpanW - 1}], ' ')
                         for i in range(1, len(ws) - ${SpanW - 2})]) AS w
          FROM toks WHERE len(ws) >= $SpanW))"""

  private val q78 = Q(
    "q78_dup_span_fraction",
    (s, d) => {
      import s.implicits._
      val wins = spanFrame(s, d)
      val cnts = wins.groupBy($"wh").agg(count(lit(1)).as("cnt"))
      val byDoc = wins.groupBy($"doc_id", $"wh").agg(count(lit(1)).as("k"))
      val agg = byDoc.join(cnts, Seq("wh"))
        .groupBy($"doc_id")
        .agg(
          sum($"k").as("n_win"),
          sum(when($"cnt" >= 2, $"k").otherwise(0L)).as("n_dup"))
      docs(s, d).select($"doc_id")
        .join(agg, Seq("doc_id"), "left")
        .na.fill(0, Seq("n_win", "n_dup"))
        .select($"doc_id", $"n_win", $"n_dup",
          expr("CASE WHEN n_win = 0 THEN CAST(0 AS BIGINT) ELSE (1000 * n_dup) div n_win END")
            .as("dup_pm"))
        .orderBy($"doc_id")
    },
    Some(s"""WITH $duckSpans,
      cnts AS (SELECT wh, count(*) AS cnt FROM wins GROUP BY wh),
      bd AS (SELECT doc_id, wh, count(*) AS k FROM wins GROUP BY doc_id, wh),
      agg AS (
        SELECT b.doc_id,
               CAST(sum(k) AS BIGINT) AS n_win,
               CAST(sum(CASE WHEN c.cnt >= 2 THEN k ELSE 0 END) AS BIGINT) AS n_dup
        FROM bd b JOIN cnts c USING (wh) GROUP BY b.doc_id)
    SELECT d.doc_id, coalesce(a.n_win, 0) AS n_win, coalesce(a.n_dup, 0) AS n_dup,
           CASE WHEN coalesce(a.n_win, 0) = 0 THEN CAST(0 AS BIGINT)
                ELSE (1000 * a.n_dup) // a.n_win END AS dup_pm
    FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id"""))

  // ---------------------------------------------------------------- q79
  /** PPJoin-style prefix-filtered set-similarity self-join (Xiao et al.
    * 2008, "Efficient Similarity Joins for Near Duplicate Detection") —
    * the THIRD independent algorithm for the q22 near-dup contract
    * (exact inverted-index q22, MinHash-LSH q23, now prefix filter), and
    * the one with the tightest candidate bound when τ is known up front:
    * each doc exposes only its |s| − ⌈τ·|s|⌉ + 1 RAREST shingles under a
    * global (df, shingle) total order, and two docs become a candidate
    * pair only if their prefixes share a shingle — the prefix-filter
    * theorem guarantees every pair with J ≥ τ does. Candidates
    * exact-verify against the full sets, so the output is identical to
    * q22's (equality asserted in TextPipelineSpec; the oracle is q22's
    * SQL verbatim — three implementations, one contract).
    *
    * Scale shape: prefix posting lists are the rarest shingles BY
    * CONSTRUCTION — the hot-boilerplate quadratic blowup the df-cap
    * guards against elsewhere cannot arise, because df-ranking pushes
    * common shingles out of every prefix. The rank window sees |s| rows
    * per doc (bounded by q60's chunking upstream at ingest), the df
    * aggregate is one narrow hash agg, and verification touches only
    * candidate pairs. */
  private val q79 = Q(
    "q79_ppjoin_neardup",
    (s, d) => ppjoinPairs(s, d, 0.5),
    Some(s"""WITH $duckShingles,
      ${duckCappedPairCtes(JaccardDfCap)}
    SELECT doc_a, doc_b, round(CAST(inter AS DOUBLE) / (na + nb - inter), 4) AS jaccard
    FROM cpairs WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5
    ORDER BY doc_a, doc_b"""))

  def ppjoinPairs(s: SparkSession, d: String, tau: Double): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"df", $"th")
    val sh = shingleFrameCached(s, d)
    // 24-char hashes from the first projection on — shingle STRINGS never
    // enter the df aggregate, the rank window, or the prefix self-join
    // (the q62 discipline; the string form measured up to 28 s at sf0.1
    // under memory pressure, the hash form ~5 s warm). The prefix math
    // runs on per-doc DISTINCT-HASH sets. Completeness invariant
    // (ADVICE r9): this is NOT "hash Jaccard ≥ string Jaccard" — a
    // collision between two shingles present in BOTH documents lowers
    // hash Jaccard to (i−1)/(u−1) < i/u, so a collision COULD in
    // principle drop a string-qualifying pair below tau before the
    // prefix filter sees it. Correctness rests on the 24-char
    // PortableHash being injective on the corpus vocabulary (2^96
    // space vs a vocabulary many orders smaller; injectivity makes
    // hash-set Jaccard ≡ string-set Jaccard exactly), and the
    // pp≡exact spec gate (TextPipelineSpec) plus the shared q22 oracle
    // are the guards that would catch a collision if one ever landed.
    val tok = sh.select($"doc_id", explode($"s").as("tok"))
      .select($"doc_id", shingleHash($"tok").as("th"))
      .distinct()
    val dfFrame = tok.groupBy($"th").agg(count(lit(1)).as("df"))
    val nH = tok.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val pref = tok
      .join(dfFrame, Seq("th"))
      .withColumn("pos", row_number().over(w))
      .join(broadcast(nH), Seq("doc_id"))
      .filter($"pos" <= $"n" - ceil(lit(tau) * $"n") + 1)
      // a df=1 hash cannot generate a pair — drop it before the self-join
      // so unique-shingle rows (the bulk of the corpus) never shuffle again
      .filter($"df" >= 2)
      .select($"doc_id", $"th")
    val cand = pref.select($"doc_id".as("doc_a"), $"th")
      .join(pref.select($"doc_id".as("doc_b"), $"th"), Seq("th"))
      .filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b")
      .distinct()
    verifyJaccard(s, d, cand, tau)
  }

  // ---------------------------------------------------------------- q83
  /** BLOOM-FILTER ingestion screen over SPANS — the O(1)-memory
    * approximate membership sketch completing the classic quartet (CMS
    * q73, KMV q41, HLL q77, Bloom q83). The already-ingested corpus
    * (even doc_ids) is summarized as a [[BloomM]]-bit filter over
    * [[BloomK]] LCG row-hashes of each [[SpanW]]-token window; every
    * ARRIVING doc's spans (odd doc_ids) test membership map-side against
    * the BROADCAST bit set — the cheap first pass of substring-level
    * dedup (q78's metric, q75's ingestion shape) that decides which docs
    * even need the exact check. The one-sided contract — a span really
    * present in the corpus can NEVER test negative; false positives are
    * the price of fixed memory — surfaces per doc as
    * `n_known ≤ n_bloom ≤ n_spans`, pinned in TextPipelineSpec.
    *
    * Scale shape: filter state is ≤ min(K·|corpus spans|, M) set-bit
    * rows — fixed by the M knob regardless of corpus size (load factor
    * at sf0.1 is 3·122k/2²¹ ≈ 0.18; size M to the ingested span
    * cardinality the same way at production scale, or shard filters per
    * partition and OR them — set bits union). Probing is three broadcast
    * joins; the arriving batch never shuffles. Row hashes are the q73
    * pairwise-independent LCG family over the span's [[PortableHash]],
    * so the oracle replays the FILTER itself. */
  private val BloomM = 1L << 21
  private val BloomK = 3
  private val BloomA = Seq(1103515245L, 1140671485L, 214013L)
  private val BloomB = Seq(12345L, 12820163L, 2531011L)

  private val q83 = Q(
    "q83_bloom_span_screen",
    (s, d) => {
      import s.implicits._
      val P = graft.functions.PortableHash.P
      def pos(j: Int): Column =
        ((lit(BloomA(j)) * col("wh") + lit(BloomB(j))) % lit(P)) % lit(BloomM)
      val wins = spanFrame(s, d)
      val corpus = wins.filter($"doc_id" % 2 === 0)
      // memoized: three broadcast builds would otherwise each re-run the
      // corpus-side distinct (cold 4.4 s / warm 0.5 s at sf0.1 with the
      // two-stage span cache; see spanFrame for the 24 s trap this avoids)
      val bits = graft.Memo.cached(s, s"bloom-bits:$d")(
        corpus
          .select(explode(array((0 until BloomK).map(pos): _*)).as("p"))
          .distinct())
      val known = graft.Memo.cached(s, s"bloom-known:$d")(
        corpus.select($"wh").distinct())
      val probes = wins.filter($"doc_id" % 2 === 1)
        .select($"doc_id", $"wh", pos(0).as("p0"), pos(1).as("p1"), pos(2).as("p2"))
      probes
        .join(broadcast(bits.select($"p".as("p0"), lit(1L).as("b0"))), Seq("p0"), "left")
        .join(broadcast(bits.select($"p".as("p1"), lit(1L).as("b1"))), Seq("p1"), "left")
        .join(broadcast(bits.select($"p".as("p2"), lit(1L).as("b2"))), Seq("p2"), "left")
        .join(broadcast(known.withColumn("kn", lit(1L))), Seq("wh"), "left")
        .na.fill(0, Seq("b0", "b1", "b2", "kn"))
        .groupBy($"doc_id")
        .agg(
          count(lit(1)).as("n_spans"),
          sum(when($"b0" === 1 && $"b1" === 1 && $"b2" === 1, 1L).otherwise(0L))
            .as("n_bloom"),
          sum($"kn").as("n_known"))
        .orderBy($"doc_id")
    },
    Some {
      val P = graft.functions.PortableHash.P
      def pos(j: Int, h: String) = s"(((${BloomA(j)} * $h + ${BloomB(j)}) % $P) % $BloomM)"
      s"""WITH $duckSpans,
      corpus AS (SELECT wh FROM wins WHERE doc_id % 2 = 0),
      bits AS (
        SELECT DISTINCT p FROM (
          SELECT unnest([${(0 until BloomK).map(j => pos(j, "wh")).mkString(", ")}]) AS p
          FROM corpus)),
      known AS (SELECT DISTINCT wh FROM corpus),
      probes AS (
        SELECT doc_id, wh, ${pos(0, "wh")} AS p0, ${pos(1, "wh")} AS p1, ${pos(2, "wh")} AS p2
        FROM wins WHERE doc_id % 2 = 1)
    SELECT p.doc_id,
           count(*) AS n_spans,
           CAST(sum(CASE WHEN b0.p IS NOT NULL AND b1.p IS NOT NULL AND b2.p IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom,
           CAST(sum(CASE WHEN k.wh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_known
    FROM probes p
    LEFT JOIN bits b0 ON b0.p = p.p0
    LEFT JOIN bits b1 ON b1.p = p.p1
    LEFT JOIN bits b2 ON b2.p = p.p2
    LEFT JOIN known k ON k.wh = p.wh
    GROUP BY p.doc_id ORDER BY p.doc_id"""
    })

  // ---------------------------------------------------------------- q84
  /** LEAKAGE-FREE train/val/test split: the q59 split keyed by the
    * near-dup CLUSTER canonical instead of the doc — every member of a
    * dup cluster lands on the same side, so a test doc can never have a
    * near-duplicate in train (the contamination mode a doc-keyed split
    * cannot prevent, and the reason eval suites dedup against training
    * data — Lee et al. 2022 §5). Composes q46's connected components
    * (isolated docs are their own canonical) with the same key-LCG
    * variate and fractions as q59; the per-mille fraction drift vs the
    * doc-keyed split is bounded by the dup mass. Leakage-freedom is
    * pinned in TextPipelineSpec: every q22 near-dup pair shares a split.
    *
    * Scale: the cluster frame is memoized (shared with q46/q48), the
    * split is a map-side expression on the canonical key — no new
    * shuffle beyond the one left join. */
  private val q84 = Q(
    "q84_leakage_free_split",
    (s, d) => {
      import s.implicits._
      val canon = dedupClusters(s, d, 0.5)
      val withCanon = docs(s, d).select($"doc_id")
        .join(canon, Seq("doc_id"), "left")
        .select($"doc_id", coalesce($"canonical_id", $"doc_id").as("canonical_id"))
      val u = graft.Functions.keyLcgU($"canonical_id")
      withCanon
        .select($"doc_id", $"canonical_id",
          when(u < Sampling.TrainFrac, "train")
            .when(u < Sampling.ValFrac, "val")
            .otherwise("test").as("split"))
        .orderBy($"doc_id")
    },
    Some(s"""WITH RECURSIVE $duckShingles,
      ${duckCappedPairCtes(JaccardDfCap)},
      qpairs AS (
        SELECT doc_a, doc_b FROM cpairs
        WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM qpairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM qpairs),
      reach AS (
        SELECT src AS node, src AS lbl FROM edges
        UNION
        SELECT e.dst AS node, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
      canon AS (SELECT node AS doc_id, min(lbl) AS canonical_id FROM reach GROUP BY node),
      wc AS (
        SELECT d.doc_id, coalesce(c.canonical_id, d.doc_id) AS canonical_id
        FROM documents d LEFT JOIN canon c USING (doc_id))
    SELECT doc_id, canonical_id,
           CASE WHEN u < ${Sampling.TrainFrac} THEN 'train'
                WHEN u < ${Sampling.ValFrac} THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, canonical_id,
                 ${graft.Functions.duckKeyLcgU("canonical_id")} AS u FROM wc)
    ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q82
  /** Per-source token-distribution DIVERGENCE vs the corpus — the
    * domain-shift diagnostic behind data-mixing decisions (which sources
    * are stylistic outliers; what a new crawl slice does to the mix).
    * The statistic is the total-variation distance between the source's
    * unigram distribution and the corpus's, computed EXACTLY in
    * cross-multiplied integers: for source s with Ns tokens in an
    * N-token corpus, L1_scaled = Σ_t |cnt_{s,t}·N − cnt_t·Ns| — tokens
    * absent from s contribute cnt_t·Ns, folded in closed form as
    * Ns·(N − Σ_{t∈s} cnt_t), so the join only ever touches tokens the
    * source actually has. TV per-mille = (1000·L1) div (2·N·Ns); all
    * magnitudes ≤ 2·N·Ns·1000 < 2⁶³ at every fixture SF (and the bound
    * is checkable: it's quadratic in corpus tokens, so at true 100 TB
    * scale the same statistic runs per-shard or over HLL/CMS-profiled
    * top-K vocabularies).
    *
    * Scale shape: one corpus scan tokenizes map-side to 24-char hashes
    * (no token strings shuffle); one vocab-sized hash agg for corpus
    * counts, one (source × vocab) agg for source counts, and the
    * divergence is a shuffle-on-key equi-join of the two count frames —
    * no per-source corpus rescan, no grid materialization over absent
    * tokens. */
  private val q82 = Q(
    "q82_source_divergence",
    (s, d) => {
      import s.implicits._
      val tok = rebalanced(docs(s, d))
        .select($"source", explode(split(trim($"text"), "\\s+")).as("token"))
        .filter(length($"token") > 0)
        .select($"source", graft.functions.PortableHash.hash($"token").as("h"))
      // ONE pass over the token stream; the corpus counts and both totals
      // derive from the (source × vocab) aggregate, which is orders of
      // magnitude smaller than the stream. MEMOIZED: four consumers
      // (join side, corpus counts, per-source totals, grand total) would
      // otherwise each re-run the tokenize+hash scan — ReuseExchange
      // does not fire across these differently-shaped parents (measured
      // 4 parquet scans in the un-cached plan; warm 8.6 → 1.1 s at
      // sf0.1, cold 7.9 → 6.2 with the remaining cost being the one
      // intrinsic tokenize+hash pass that populates the memo)
      val srcCnt = graft.Memo.cached(s, s"srcdiv:$d")(
        tok.groupBy($"source", $"h").agg(count(lit(1)).as("cs")))
      val corpusCnt = srcCnt.groupBy($"h").agg(sum($"cs").as("c"))
      val nS = srcCnt.groupBy($"source").agg(sum($"cs").as("ns"))
      val nT = nS.agg(sum($"ns").as("n"))
      srcCnt.join(corpusCnt, Seq("h"))
        .join(nS, Seq("source"))
        .crossJoin(broadcast(nT))
        .groupBy($"source", $"ns", $"n")
        .agg(
          sum(abs($"cs" * $"n" - $"c" * $"ns")).as("dpresent"),
          sum($"c").as("csum"))
        .withColumn("l1_scaled", $"dpresent" + $"ns" * ($"n" - $"csum"))
        .withColumn("div_pm", expr("(1000 * l1_scaled) div (2 * n * ns)"))
        .select($"source", $"ns".as("n_tokens"), $"l1_scaled", $"div_pm")
        .orderBy($"source")
    },
    Some(s"""WITH tok AS (
        SELECT source, ${duckHash("token")} AS h FROM (
          SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS token
          FROM documents)
        WHERE length(token) > 0),
      cc AS (SELECT h, count(*) AS c FROM tok GROUP BY h),
      sc AS (SELECT source, h, count(*) AS cs FROM tok GROUP BY source, h),
      nsrc AS (SELECT source, CAST(sum(cs) AS BIGINT) AS ns FROM sc GROUP BY source),
      nt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cc),
      agg AS (
        SELECT j.source, nsrc.ns, nt.n,
               CAST(sum(abs(j.cs * nt.n - j.c * nsrc.ns)) AS BIGINT) AS dpresent,
               CAST(sum(j.c) AS BIGINT) AS csum
        FROM (SELECT s2.source, s2.cs, c2.c FROM sc s2 JOIN cc c2 USING (h)) j
        JOIN nsrc ON nsrc.source = j.source CROSS JOIN nt
        GROUP BY j.source, nsrc.ns, nt.n)
    SELECT source, ns AS n_tokens,
           (dpresent + ns * (n - csum)) AS l1_scaled,
           (1000 * (dpresent + ns * (n - csum))) // (2 * n * ns) AS div_pm
    FROM agg ORDER BY source"""))

  override def all: Seq[Q] =
    Seq(q21, q22, q23, q24, q25, q26, q34, q46, q47, q48, q51, q52, q55, q56, q60, q62, q65, q67, q68, q69, q70, q71, q73, q75, q77, q78, q79, q82, q83, q84)
}
