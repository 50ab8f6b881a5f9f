package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, QModule, Tables}

/** Deterministic, distribution-safe sampling (SURVEY §2.9): the
  * stratified subset of `000-get_data.py:291-361` (keep ALL relevant rows,
  * sample the anti-join pool, assert nothing relevant was lost) and the
  * seeded without-replacement query sample of `003:121-124`.
  *
  * `rand(seed)` is partitioning-sensitive in Spark (SURVEY §7.4 hard part
  * 3), so the uniform variate is a pure function of the row KEY — the same
  * LCG used by v07 — which makes the sample identical under any
  * partitioning, any engine, and any cluster size. That is the property
  * that matters at 100 TB: re-running the subset job on different
  * executors must reproduce the same subset.
  */
object Sampling extends QModule {

  /** U(0,1) from a row key — the shared engine-wide variate. */
  private def lcgU(key: Column): Column = graft.Functions.keyLcgU(key)

  private def duckLcgU(key: String): String = graft.Functions.duckKeyLcgU(key)

  // ---------------------------------------------------------------- q27
  /** R1 + J7: stratified subset with an EXACT-COUNT sample — keep every
    * customer with an URGENT order (the "relevant" stratum), add exactly
    * ⌈30% of the pool⌉ non-relevant customers (first-N by the key-LCG
    * variate — the reference tops its subset up to an exact target,
    * `000:291-361`), and emit the integrity summary INCLUDING the
    * missing-relevant count, which must be 0 (`000:348-359`).
    *
    * Plan (VERDICT r3 wrong #3: the old form crossJoined four single-row
    * aggregates, each recomputing the relevant/pool/sampled subtrees):
    * ONE flag frame — customer ⟕ urgent-custkeys (is_rel) ⟕ the sampled
    * id set (in_samp) — and ONE aggregation pass of conditional sums
    * over it. The exact-N sample is `orderBy(u, key).limit(take)` =
    * TakeOrdered (per-partition top-take, driver merge of p × take
    * rows — no global sort).
    *
    * Scale note: an exact-count FRACTION sample is inherently O(f·n) —
    * `take` and the sampled-id broadcast grow with the table. This is
    * the reference's own exact-target semantics reproduced faithfully;
    * at 100 TB one keeps the key-deterministic variate but replaces the
    * exact global trim with a u < f threshold (approximate count, zero
    * coordination) or per-stratum quotas. `take` is clamped to Int range
    * so a huge pool degrades to "sample everything expressible" rather
    * than overflowing limit(). */
  private val q27 = Q(
    "q27_subset_sample",
    (s, d) => {
      import s.implicits._
      val urgent = Tables(s, d, "orders")
        .filter($"o_orderpriority" === "1-URGENT")
        .select($"o_custkey".as("c_custkey"))
        .distinct()
      val flagged = graft.Memo.cached(s, s"subset-flags:$d")(
        Tables(s, d, "customer")
          .select($"c_custkey")
          .join(urgent.withColumn("is_rel", lit(1)), Seq("c_custkey"), "left_outer")
          .na.fill(0, Seq("is_rel")))
      // one bounded action to size the exact-count sample
      val nPool = flagged.filter($"is_rel" === 0).count()
      val take = math.min(math.ceil(0.3 * nPool).toLong, Int.MaxValue.toLong).toInt
      val sampledIds = flagged
        .filter($"is_rel" === 0)
        .withColumn("u", lcgU($"c_custkey"))
        .orderBy($"u", $"c_custkey")
        .limit(take)
        .select($"c_custkey", lit(1).as("in_samp"))
      flagged
        .join(broadcast(sampledIds), Seq("c_custkey"), "left_outer")
        .na.fill(0, Seq("in_samp"))
        .withColumn("in_subset", greatest($"is_rel", $"in_samp"))
        .agg(
          sum($"in_subset".cast("long")).as("n_subset"),
          sum($"is_rel".cast("long")).as("n_relevant"),
          sum($"in_samp".cast("long")).as("n_sampled"),
          sum(when($"is_rel" === 1 && $"in_subset" === 0, 1L).otherwise(0L))
            .as("n_missing_relevant"))
    },
    Some(s"""WITH relevant AS (
        SELECT c_custkey FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')),
      pool AS (SELECT c_custkey FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM relevant)),
      sampled AS (
        SELECT c_custkey FROM (
          SELECT c_custkey,
                 row_number() OVER (ORDER BY ${duckLcgU("c_custkey")}, c_custkey) AS rn
          FROM pool)
        WHERE rn <= ceiling(0.3 * (SELECT count(*) FROM pool))),
      subset AS (SELECT c_custkey FROM relevant UNION ALL SELECT c_custkey FROM sampled)
    SELECT (SELECT count(*) FROM subset) AS n_subset,
           (SELECT count(*) FROM relevant) AS n_relevant,
           (SELECT count(*) FROM sampled) AS n_sampled,
           (SELECT count(*) FROM relevant WHERE c_custkey NOT IN (SELECT c_custkey FROM subset))
             AS n_missing_relevant"""))

  // ---------------------------------------------------------------- q28
  /** R2 + P3: exactly-N without-replacement query sample — filter to
    * queries that HAVE ground truth (≥1 same-label partner, the
    * has-ground-truth semi join of `002:139`), order by the key-LCG
    * variate, take the first 100. Deterministic under any partitioning
    * (global sort on (u, key)). */
  private val q28 = Q(
    "q28_query_sample",
    (s, d) => {
      import s.implicits._
      val e = Tables(s, d, "embeddings").select($"vec_id", $"label")
      val withTruth = e
        .join(
          e.select($"vec_id".as("other_id"), $"label"),
          Seq("label"))
        .filter($"vec_id" =!= $"other_id")
        .select($"vec_id")
        .distinct()
      withTruth
        .withColumn("u", lcgU($"vec_id"))
        .orderBy($"u", $"vec_id")
        .limit(100)
        .select($"vec_id", round($"u", 6).as("u"))
        .orderBy($"vec_id")
    },
    Some(s"""WITH with_truth AS (
        SELECT DISTINCT a.vec_id FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id <> b.vec_id),
      u AS (SELECT vec_id, ${duckLcgU("vec_id")} AS u FROM with_truth)
    SELECT vec_id, round(u, 6) AS u FROM u ORDER BY u, vec_id LIMIT 100"""))

  // ---------------------------------------------------------------- q50
  /** Class-balanced sample — the training-mix primitive: exactly
    * [[BalancedPerClass]] documents PER LANGUAGE, deterministically (the
    * key-LCG variate again, so the mix is identical under any
    * partitioning or cluster size).
    *
    * The per-group trim runs on the bounded-heap `collect_top_k`
    * aggregate — map-side partial heaps of N per (task, group), no
    * per-group window sort: at 100 TB with G groups the shuffle carries
    * ≤ tasks × G × N candidate rows, not the table. Score is −u, so the
    * heap's (score DESC, id ASC) order is exactly (u ASC, doc_id ASC) —
    * the same total order the oracle's ROW_NUMBER uses. */
  val BalancedPerClass = 20

  private val q50 = Q(
    "q50_balanced_sample",
    (s, d) => {
      import s.implicits._
      Tables(s, d, "documents")
        .select($"lang", $"doc_id", (-lcgU($"doc_id")).as("negu"))
        .groupBy($"lang")
        .agg(graft.functions.TopKAgg.collectTopK($"negu", $"doc_id", BalancedPerClass).as("topk"))
        .select($"lang", posexplode($"topk").as(Seq("pos", "hit")))
        .select($"lang", ($"pos" + 1).cast("long").as("rnk"), $"hit.id".as("doc_id"))
        .orderBy($"lang", $"rnk")
    },
    Some(s"""SELECT lang, CAST(rn AS BIGINT) AS rnk, doc_id FROM (
        SELECT lang, doc_id,
               row_number() OVER (PARTITION BY lang ORDER BY ${duckLcgU("doc_id")}, doc_id) AS rn
        FROM documents)
      WHERE rn <= $BalancedPerClass ORDER BY lang, rnk"""))

  override def all: Seq[Q] = Seq(q27, q28, q50)
}
