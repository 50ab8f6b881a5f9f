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

  // ---------------------------------------------------------------- q53
  /** Sequence packing — the step that turns a cleaned corpus into
    * fixed-length training sequences: stream docs in a deterministic
    * order, accumulate token counts, and cut a new sequence every
    * [[PackSeqLen]] tokens (greedy stream packing; docs are not split,
    * so a doc whose window starts in bin b belongs to b).
    *
    * Scale shape: packing is computed on METADATA ONLY (doc_id, token
    * count — ~16 B/row), never on the text; the running-sum window runs
    * per (source, shard) with shard = doc_id % [[PackShards]], so the
    * sort is embarrassingly parallel and no shard's partition exceeds
    * 1/shards of a source even when one domain dominates the corpus. At
    * 100 TB the bin assignment joins back to the text by doc_id
    * afterwards — a co-partitioned join, not part of the window. */
  val PackSeqLen = 256
  val PackShards = 8

  private val q53 = Q(
    "q53_sequence_pack",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val toks = Tables(s, d, "documents").select(
        $"source",
        $"doc_id",
        ($"doc_id" % PackShards).as("shard"),
        size(split(trim($"text"), "\\s+")).cast("long").as("n_tok"))
      val w = Window.partitionBy($"source", $"shard").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val binned = toks
        .withColumn("cum_before", coalesce(sum($"n_tok").over(w), lit(0L)))
        .withColumn("bin", floor($"cum_before" / lit(PackSeqLen.toDouble)))
      val perBin = binned
        .groupBy($"source", $"shard", $"bin")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("bin_tokens"))
      perBin
        .groupBy($"source")
        .agg(
          count(lit(1)).as("n_bins"),
          sum($"n_docs").cast("long").as("n_docs"),
          sum($"bin_tokens").cast("long").as("total_tokens"),
          round(avg($"bin_tokens".cast("double") / PackSeqLen), 4).as("avg_fill"))
        .orderBy($"source")
    },
    Some(s"""WITH toks AS (
        SELECT source, doc_id, doc_id % $PackShards AS shard,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok
        FROM documents),
      binned AS (
        SELECT source, shard, n_tok,
               COALESCE(sum(n_tok) OVER (PARTITION BY source, shard ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        FROM toks),
      per_bin AS (
        SELECT source, shard, CAST(floor(cum_before / ${PackSeqLen.toDouble}) AS BIGINT) AS bin,
               count(*) AS n_docs, sum(n_tok) AS bin_tokens
        FROM binned GROUP BY 1, 2, 3)
    SELECT source, count(*) AS n_bins,
      CAST(sum(n_docs) AS BIGINT) AS n_docs,
      CAST(sum(bin_tokens) AS BIGINT) AS total_tokens,
      round(avg(CAST(bin_tokens AS DOUBLE) / $PackSeqLen), 4) AS avg_fill
    FROM per_bin GROUP BY source ORDER BY source"""))

  // ---------------------------------------------------------------- q54
  /** Temperature-weighted domain mixing — the pretraining-mix primitive:
    * per-domain sampling targets ∝ n^α with α = 0.5 (T = 2), flattening
    * the natural distribution so small domains are upsampled relative to
    * the dominant one. Weights are RELATIVE TO THE LARGEST domain, not
    * sum-normalized: max() is order-deterministic where a floating sum
    * over domains is not, and `floor(budget · sqrt(n/max))` amplifies
    * the 4th decimal — sqrt and one division are correctly rounded IEEE
    * ops, so the engine and the oracle compute bit-identical doubles.
    * Two tiny aggregates on a low-cardinality key; nothing scales with
    * corpus size but the first count. */
  val MixBudget = 10000.0

  private val q54 = Q(
    "q54_domain_mixture",
    (s, d) => {
      import s.implicits._
      val counts = Tables(s, d, "documents")
        .groupBy($"source").agg(count(lit(1)).as("n_docs"))
      val mx = counts.agg(max($"n_docs").as("max_docs"))
      counts
        .crossJoin(broadcast(mx))
        .select(
          $"source",
          $"n_docs",
          round(sqrt($"n_docs".cast("double") / $"max_docs"), 4).as("rel_weight"),
          floor(lit(MixBudget) * sqrt($"n_docs".cast("double") / $"max_docs"))
            .cast("long").as("target_docs"))
        .orderBy($"source")
    },
    Some(s"""WITH counts AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
      mx AS (SELECT max(n_docs) AS max_docs FROM counts)
    SELECT source, n_docs,
      round(sqrt(CAST(n_docs AS DOUBLE) / max_docs), 4) AS rel_weight,
      CAST(floor($MixBudget * sqrt(CAST(n_docs AS DOUBLE) / max_docs)) AS BIGINT) AS target_docs
    FROM counts, mx ORDER BY source"""))

  // ---------------------------------------------------------------- q59
  /** Deterministic train/val/test split — the assignment every training
    * pipeline makes before anything touches the data. The split is a
    * pure function of doc_id (the engine-wide key-LCG variate, same as
    * q27/q28/v07): identical under any partitioning, any engine, any
    * cluster size, and STABLE across reruns — a document can never
    * migrate between train and eval when the job is re-executed, which
    * is the property that prevents silent eval contamination. Output is
    * the per-(source, split) census with within-source fractions; the
    * fraction is an exact-integer ratio, so it is bit-deterministic. */
  val TrainFrac = 0.9
  val ValFrac = 0.95 // cumulative: [0.9, 0.95) = val, [0.95, 1] = test

  private val q59 = Q(
    "q59_train_split",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val u = lcgU($"doc_id")
      val split = when(u < TrainFrac, "train")
        .when(u < ValFrac, "val")
        .otherwise("test")
      Tables(s, d, "documents")
        .select($"source", split.as("split"))
        .groupBy($"source", $"split")
        .agg(count(lit(1)).as("n"))
        .withColumn(
          "frac",
          round($"n".cast("double")
            / sum($"n").over(Window.partitionBy($"source")).cast("double"), 4))
        .orderBy($"source", $"split")
    },
    Some(s"""WITH assigned AS (
        SELECT source,
               CASE WHEN u < $TrainFrac THEN 'train'
                    WHEN u < $ValFrac THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT source, ${duckLcgU("doc_id")} AS u FROM documents))
    SELECT source, split, count(*) AS n,
           round(CAST(count(*) AS DOUBLE)
                 / CAST(sum(count(*)) OVER (PARTITION BY source) AS DOUBLE), 4) AS frac
    FROM assigned GROUP BY source, split ORDER BY source, split"""))

  // ---------------------------------------------------------------- q61
  /** Deterministic corpus shuffle + shard assignment — the WRITE-side
    * step between q59's split and q53's packing: training shards must
    * each be an unbiased corpus sample and the within-shard order must
    * be pseudo-random (training-order shuffle), yet bit-reproducible
    * across reruns and engines. Two independent key-LCG variates do
    * both: `shard_id = floor(u(doc_id) · S)` buckets docs, and a second
    * variate `u2` (decorrelated by an affine key remap) orders docs
    * within each shard. Pure functions of doc_id — rerun-stable,
    * partition-invariant, no RNG state.
    *
    * Scale shape: assignment is MAP-SIDE; the census + per-shard head
    * runs on the bounded-heap `collect_top_k` aggregate (map-side
    * partial heaps, shuffle carries ≤ tasks × S × head rows — never the
    * corpus; no per-shard window sort). The actual shard WRITE at scale
    * is `repartition(S, shard_id).sortWithinPartitions(u2)` — one
    * intrinsic shuffle, the same order this query's head rows pin. */
  val ShuffleShards = 16
  val ShuffleHead = 3

  /** (doc_id → shard_id, order variate) — [[q61]]'s assignment columns,
    * exposed for the write path. */
  def shuffleShard(docId: Column): (Column, Column) = (
    floor(lcgU(docId) * ShuffleShards).cast("long"),
    lcgU(docId * 31 + 7))

  private val q61 = Q(
    "q61_corpus_shuffle",
    (s, d) => {
      import s.implicits._
      val (shard, u2) = shuffleShard($"doc_id")
      Tables(s, d, "documents")
        .select($"doc_id", shard.as("shard_id"), (-u2).as("negu"))
        .groupBy($"shard_id")
        .agg(
          count(lit(1)).as("n_docs"),
          graft.functions.TopKAgg.collectTopK($"negu", $"doc_id", ShuffleHead).as("topk"))
        .select($"shard_id", $"n_docs", posexplode($"topk").as(Seq("pos", "hit")))
        .select(
          $"shard_id", $"n_docs",
          ($"pos" + 1).cast("long").as("rnk"), $"hit.id".as("doc_id"))
        .orderBy($"shard_id", $"rnk")
    },
    Some(s"""WITH t AS (
        SELECT doc_id,
               CAST(floor(${duckLcgU("doc_id")} * $ShuffleShards) AS BIGINT) AS shard_id,
               ${duckLcgU("(doc_id * 31 + 7)")} AS u2
        FROM documents),
      c AS (SELECT shard_id, count(*) AS n_docs FROM t GROUP BY shard_id),
      r AS (SELECT shard_id, doc_id,
                   row_number() OVER (PARTITION BY shard_id ORDER BY u2, doc_id) AS rn
            FROM t)
    SELECT r.shard_id, c.n_docs, CAST(r.rn AS BIGINT) AS rnk, r.doc_id
    FROM r JOIN c USING (shard_id) WHERE r.rn <= $ShuffleHead
    ORDER BY shard_id, rnk"""))

  override def all: Seq[Q] = Seq(q27, q28, q50, q53, q54, q59, q61)
}
