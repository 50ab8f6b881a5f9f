package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, QModule, Tables}

/** Full-text BM25 ranking and hybrid (keyword + vector) rank fusion —
  * the standard production companions of a vector index: every real
  * vector-database deployment pairs ANN search with keyword BM25 and
  * fuses the two rankings (the reference's corpus/queries/qrels retrieval
  * shape, `notebooks/001-get_embeddings.py:54-137`, is exactly the BEIR
  * keyword-retrieval benchmark family). Spark-first design:
  *
  *   - The corpus tokenizes MAP-SIDE (`split`, one projection); per-doc
  *     length rides the exploded token rows, so no corpus-wide side
  *     shuffle of doc lengths is ever needed.
  *   - Token rows are filtered by a BROADCAST hash join against the tiny
  *     distinct query-term set before anything shuffles: the only shuffle
  *     of the whole query carries postings of query terms (Σ df over ≤
  *     |queries|·|terms| distinct words), never the corpus. Term STRINGS
  *     ride that shuffle deliberately — unlike q56's corpus-sized gram
  *     shuffle (which hashes through [[graft.functions.PortableHash]]),
  *     this shuffle is already query-bounded, and hashing would charge a
  *     24-op expression to every corpus token to shrink an already-small
  *     exchange.
  *   - tf and df come from ONE hash aggregation each over that bounded
  *     posting frame (df = row count of the tf frame per term — no
  *     second corpus pass).
  *   - Top-k is the bounded-heap `collect_top_k` aggregate
  *     ([[graft.functions.TopKAgg]]) — map-side partial top-k, no
  *     per-query window sort.
  *
  * Determinism across engines (the q39/q57 float-divergence class): the
  * per-(query, term, doc) BM25 contribution is one fixed expression tree
  * (identical IEEE-double ops in Spark and DuckDB), dyadically quantized
  * to an integer via floor(x·2^24); the per-(query, doc) SUM is then an
  * order-free integer sum, divided back and rounded once for display.
  * Accepted residual risk (ADVICE r7 pattern): Math.log vs libm log may
  * differ in the last ulp, which flips a floor only when x·2^24 sits
  * within one ulp of an integer — p ≈ 2^-29 per value, and a flip only
  * matters at the rounded 4th decimal or a rank boundary.
  *
  * At 100 TB: cost scales with Σ df of the query terms (the posting
  * lists), not corpus size; the corpus pass itself is one map-side
  * tokenize+filter with no wide exchange. Ranking ties break on doc_id
  * engine-wide (heap contract == oracle ORDER BY score DESC, doc_id).
  */
object FullText extends QModule {

  private val K1 = 1.2
  private val B = 0.75
  /** Dyadic quantization scale, 2^24 (see class doc). */
  private val Scale = 16777216.0
  /** RRF dampening constant — the standard 60 of Cormack et al. */
  private val RrfK = 60.0
  /** Registry parameters: 8 query docs, their first 5 tokens as terms. */
  private val QDocs = 8
  private val QTerms = 5

  private def toks(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // rebalanced (round 16): the doc table is ONE input split at fixture
    // scale, so every consumer's tokenize+explode ran single-task —
    // wall-exposed to per-task stalls (q63 measured 2.2 s clean but 24.6 s
    // on a degraded window, all on that one task). TextPipeline.rebalanced
    // skips the shuffle when the scan already has natural parallelism.
    TextPipeline.rebalanced(Tables(s, d, "documents"))
      .select($"doc_id", split(trim($"text"), "\\s+").as("ws"))
  }

  /** Query-term pairs (query_id, term): the first `QTerms` tokens of each
    * doc with doc_id < `QDocs`, deduplicated order-free (DISTINCT on the
    * exploded pairs — DuckDB's list_distinct does not contract ordering,
    * so dedup happens after explode in BOTH engines). */
  private def queryTerms(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    toks(s, d)
      .filter($"doc_id" < QDocs)
      .select($"doc_id".as("query_id"), explode(slice($"ws", 1, QTerms)).as("term"))
      .distinct()
  }

  /** BM25 top-k per query over a tokenized corpus (doc_id, ws).
    * @param qterms (query_id, term) pairs — small, broadcast twice
    * @return (query_id, doc_id, score, rnk); `score` is the dyadic
    *         integer sum as double (exact < 2^53) — divide by [[Scale]]
    *         for the real-valued BM25 score. */
  private[graft] def bm25(
      toksDf: DataFrame,
      qterms: DataFrame,
      k: Int,
      excludeSelf: Boolean): DataFrame = {
    val s = toksDf.sparkSession
    import s.implicits._
    // corpus stats: word counts are integer-valued doubles, so sum() is
    // exact (order-free) and avgdl = one division — identical in DuckDB
    val statsRow = toksDf
      .select(size($"ws").cast("double").as("dl"))
      .agg(count(lit(1)).as("n"), sum($"dl").as("sdl"))
      .head()
    val n = statsRow.getLong(0).toDouble
    val avgdl = statsRow.getDouble(1) / statsRow.getLong(0)

    val termSet = qterms.select($"term").distinct()
    // the ONLY shuffle input: postings of query terms (dl rides along —
    // no corpus-wide doc-length join)
    val post = toksDf
      .select($"doc_id", size($"ws").cast("double").as("dl"), explode($"ws").as("term"))
      .join(broadcast(termSet), "term")
    val tf = post
      .groupBy($"term", $"doc_id")
      .agg(count(lit(1)).cast("double").as("tf"), max($"dl").as("dl"))
    val dfF = tf.groupBy($"term").agg(count(lit(1)).cast("double").as("df"))

    // one fixed expression tree — mirrors the oracle SQL token for token
    val contrib = tf
      .join(broadcast(dfF), "term")
      .join(broadcast(qterms), "term")
      .withColumn(
        "c",
        floor(
          log((lit(n) - $"df" + 0.5) / ($"df" + 0.5) + 1.0) *
            (($"tf" * (K1 + 1.0)) /
              ($"tf" + lit(K1) * (lit(1.0 - B) + lit(B) * $"dl" / avgdl))) *
            Scale).cast("long"))
    val pairs =
      if (excludeSelf) contrib.filter($"doc_id" =!= $"query_id") else contrib
    val scored = pairs
      .groupBy($"query_id", $"doc_id")
      .agg(sum($"c").cast("double").as("score"))
    BruteForce.rerank(scored, k)
  }

  /** The oracle twin of [[bm25]] over the `documents` table — every
    * arithmetic step in the same order (see class doc). */
  private def duckBm25(k: Int, excludeSelf: Boolean): String = {
    val selfFilter = if (excludeSelf) "AND d.doc_id <> qt.query_id" else ""
    s"""ws AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
      stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                       sum(CAST(len(w) AS DOUBLE)) / count(*) AS avgdl FROM ws),
      qt AS (SELECT DISTINCT query_id, term FROM (
               SELECT doc_id AS query_id, unnest(list_slice(w, 1, $QTerms)) AS term
               FROM ws WHERE doc_id < $QDocs) qx),
      tok AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl, unnest(w) AS term FROM ws),
      tf AS (SELECT term, doc_id, CAST(count(*) AS DOUBLE) AS tf, max(dl) AS dl
             FROM tok WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
      dfc AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
      contrib AS (
        SELECT qt.query_id, d.doc_id,
               CAST(floor(
                 ln((s.n - dfc.df + 0.5) / (dfc.df + 0.5) + 1.0) *
                 ((d.tf * ${K1 + 1.0}) / (d.tf + $K1 * (1.0 - $B + $B * d.dl / s.avgdl))) *
                 $Scale) AS BIGINT) AS c
        FROM tf d
        JOIN dfc USING (term)
        JOIN qt ON qt.term = d.term $selfFilter
        CROSS JOIN stats s),
      scored AS (SELECT query_id, doc_id, CAST(sum(c) AS DOUBLE) AS score
                 FROM contrib GROUP BY 1, 2),
      bm_ranked AS (
        SELECT query_id, doc_id, score,
               row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
        FROM scored)"""
  }

  // ---------------------------------------------------------------- q63
  /** BM25 top-10: queries are each of the first $QDocs docs' first
    * $QTerms tokens. Output score is the quantized sum divided back and
    * rounded (display only; ranking uses the exact integer sum). */
  private val q63 = Q(
    "q63_bm25",
    (s, d) => {
      import s.implicits._
      bm25(toks(s, d), queryTerms(s, d), k = 10, excludeSelf = false)
        .select(
          $"query_id",
          $"rnk",
          $"doc_id",
          round($"score" / Scale, 4).as("score"))
        .orderBy($"query_id", $"rnk")
    },
    Some(s"""WITH ${duckBm25(k = 10, excludeSelf = false)}
      SELECT query_id, rnk, doc_id, round(score / $Scale, 4) AS score
      FROM bm_ranked WHERE rnk <= 10 ORDER BY query_id, rnk"""))

  // ---------------------------------------------------------------- q64
  /** Hybrid retrieval: reciprocal-rank fusion (RRF, Cormack et al. —
    * score = Σ_legs 1/(60 + rank)) of the BM25 keyword leg and the exact
    * cosine vector leg, both top-20 per query with the query doc itself
    * excluded (doc_id ≡ vec_id in the fixture corpus). The fusion sum is
    * two coalesced terms in fixed order — no float aggregation — and
    * ranking ties break on doc_id engine-wide. The legs are the engine's
    * own scale-shaped operators (bounded-shuffle BM25 above, the fused
    * brute-force kernel via [[BruteForce.topKFromFrames]]); fusion joins
    * two O(queries·k) frames — driver-scale never, corpus-scale never. */
  private val q64 = Q(
    "q64_hybrid_rrf",
    (s, d) => {
      import s.implicits._
      val bmLeg = bm25(toks(s, d), queryTerms(s, d), k = 20, excludeSelf = true)
        .select($"query_id", $"doc_id", $"rnk".as("rnk_b"))
      val e = Tables(s, d, "embeddings")
        .select($"vec_id".as("id"), $"embedding".as("vec"))
      val vecLeg = BruteForce
        .topKFromFrames(e, e.filter($"id" < QDocs), k = 20, excludeSelf = true)
        .select($"query_id", $"doc_id", $"rnk".as("rnk_v"))
      val fused = bmLeg
        .join(vecLeg, Seq("query_id", "doc_id"), "full_outer")
        .select(
          $"query_id",
          $"doc_id",
          (coalesce(lit(1.0) / (lit(RrfK) + $"rnk_b"), lit(0.0)) +
            coalesce(lit(1.0) / (lit(RrfK) + $"rnk_v"), lit(0.0))).as("score"))
      BruteForce.rerank(fused, 10)
        .select($"query_id", $"rnk", $"doc_id", round($"score", 6).as("rrf"))
        .orderBy($"query_id", $"rnk")
    },
    Some(s"""WITH ${duckBm25(k = 20, excludeSelf = true)},
      bm AS (SELECT query_id, doc_id, rnk AS rnk_b FROM bm_ranked WHERE rnk <= 20),
      q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < $QDocs),
      vscored AS (
        SELECT q.query_id, c.vec_id AS doc_id,
               ${VectorSearch.duckDot("q.qe", "c.embedding")} AS vscore
        FROM q, embeddings c WHERE c.vec_id <> q.query_id),
      vranked AS (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id ORDER BY vscore DESC, doc_id) AS rnk_v
        FROM vscored),
      vec AS (SELECT query_id, doc_id, rnk_v FROM vranked WHERE rnk_v <= 20),
      fused AS (
        SELECT coalesce(bm.query_id, vec.query_id) AS query_id,
               coalesce(bm.doc_id, vec.doc_id) AS doc_id,
               coalesce(1.0 / (CAST($RrfK AS DOUBLE) + bm.rnk_b), 0.0) +
               coalesce(1.0 / (CAST($RrfK AS DOUBLE) + vec.rnk_v), 0.0) AS score
        FROM bm FULL OUTER JOIN vec
          ON bm.query_id = vec.query_id AND bm.doc_id = vec.doc_id),
      rrf_ranked AS (
        SELECT query_id, doc_id, score,
               row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
        FROM fused)
      SELECT query_id, rnk, doc_id, round(score, 6) AS rrf
      FROM rrf_ranked WHERE rnk <= 10 ORDER BY query_id, rnk"""))

  // ---------------------------------------------------------------- q76
  /** Positional phrase search: find every document containing an exact
    * consecutive-token phrase — the full-text operator BM25's bag-of-
    * words scoring cannot express, served in production from POSITIONAL
    * postings. The phrase is the first [[PhraseLen]] tokens of doc 0
    * (fixed per dataset, guaranteed non-empty, regenerated-fixture
    * safe).
    *
    * Engine shape: tokenize map-side with positions (`posexplode`),
    * broadcast-filter to the phrase's terms (only those terms' postings
    * survive — Σ df rows, never the corpus), then the phrase is an
    * equi-join of the term postings on (doc_id, aligned position):
    * token i of the phrase must sit at `pos − i`. At 100 TB this is the
    * positional-intersection plan an inverted index runs, with postings
    * co-partitioned by doc.
    *
    * The oracle matches the SAME tokenization semantics with a word-
    * boundary regex (`(^|\s)w1\s+w2\s+w3(\s|$)`): a `LIKE '%…%'` form
    * would also match mid-word (`"xa b c"` ~ `'%a b c%'`), which
    * positional postings rightly do not. Output is the matching doc set
    * (not counts: non-overlapping regex extraction and positional
    * counting disagree on adjacent occurrences — set semantics are the
    * phrase-FILTER contract). */
  private val PhraseLen = 3

  private val q76 = Q(
    "q76_phrase_search",
    (s, d) => {
      import s.implicits._
      val docsDf = Tables(s, d, "documents")
      val phrase = docsDf.filter($"doc_id" === 0)
        .select(slice(split(trim($"text"), "\\s+"), 1, PhraseLen))
        .as[Seq[String]].head()
      require(phrase.length == PhraseLen, s"doc 0 has fewer than $PhraseLen tokens")
      val toks = docsDf.select(
        $"doc_id",
        posexplode(split(trim($"text"), "\\s+")).as(Seq("pos", "w")))
      val aligned = phrase.zipWithIndex.map { case (w, i) =>
        toks.filter($"w" === w).select($"doc_id", ($"pos" - i).as("start"))
      }
      aligned
        .reduce((a, b) => a.join(b, Seq("doc_id", "start")))
        .select($"doc_id").distinct()
        .orderBy($"doc_id")
    },
    Some(s"""WITH ph AS (
        SELECT string_split_regex(trim(text), '\\s+')[1:$PhraseLen] AS ws
        FROM documents WHERE doc_id = 0),
      rx AS (
        SELECT '(^|\\s)' || list_aggregate(ws, 'string_agg', '\\s+') || '(\\s|$$)' AS pat
        FROM ph)
    SELECT d.doc_id FROM documents d, rx
    WHERE regexp_matches(d.text, rx.pat)
    ORDER BY d.doc_id"""))

  override def all: Seq[Q] = Seq(q63, q64, q76)
}
