package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, QModule, Tables}
import graft.functions.{KmvAgg, PortableHash}

/** Capability-headroom analytics (SURVEY §2.11: multi-level aggregation
  * and skew machinery the reference lacks but a warehouse user expects),
  * plus the skew-mitigation pattern the 100 TB design mandates.
  */
object Analytics extends QModule {

  /** Two-phase salted aggregation: for heavily skewed group keys, shuffle
    * once on (key, salt) — splitting each hot key across `salts` reducers
    * — then combine the partials with a second tiny shuffle on key alone.
    * Result is IDENTICAL to a direct groupBy (the oracle checks exactly
    * that); the win is that no single reducer ever receives a whole hot
    * key's rows. Salt is derived from a row column (deterministic), not
    * rand(), so the plan stays reproducible.
    *
    * Decomposable aggregates only (sum/count here — avg = sum/count at
    * the final step), which is precisely the class that two-phase
    * composition is valid for.
    */
  def saltedAgg(
      df: DataFrame,
      key: Column,
      saltSource: Column,
      salts: Int,
      valueCol: Column): DataFrame =
    df
      .groupBy(key.as("k"), (abs(saltSource) % salts).as("salt"))
      .agg(sum(valueCol).as("psum"), count(lit(1)).as("pcnt"))
      .groupBy(col("k"))
      .agg(
        sum(col("psum")).as("total"),
        sum(col("pcnt")).as("cnt"),
        (sum(col("psum")) / sum(col("pcnt"))).as("mean"))

  // ---------------------------------------------------------------- q35
  /** ROLLUP: revenue by (priority, orderstatus) with subtotals and a
    * grand total — the multi-level aggregation surface. */
  private val q35 = Q(
    "q35_rollup",
    (s, d) => {
      import s.implicits._
      // revenue in EXACT CENTS: at sf0.1 one rollup group's float sum
      // sits EXACTLY on a round(,4) boundary (measured margin 0.0) —
      // whether the two engines agree is a coin flip on summation order.
      // Integer cents commute; one division at the end, mirrored.
      Tables(s, d, "orders")
        .rollup($"o_orderpriority", $"o_orderstatus")
        .agg(
          round(sum(round($"o_totalprice" * 100).cast("long")).cast("double")
            / 100000.0, 4).as("rev_k"),
          count(lit(1)).as("n"))
        .select(
          coalesce($"o_orderpriority", lit("ALL")).as("priority"),
          coalesce($"o_orderstatus", lit("ALL")).as("status"),
          $"rev_k", $"n")
        .orderBy($"priority", $"status")
    },
    Some("""SELECT coalesce(o_orderpriority, 'ALL') AS priority,
      coalesce(o_orderstatus, 'ALL') AS status,
      round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
            / 100000.0, 4) AS rev_k,
      count(*) AS n
    FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    ORDER BY priority, status"""))

  // ---------------------------------------------------------------- q36
  /** CUBE over the events table: all grouping combinations of
    * (event_type, hour-of-day). */
  private val q36 = Q(
    "q36_cube",
    (s, d) => {
      import s.implicits._
      Tables(s, d, "events")
        .withColumn("hod", hour($"ts"))
        .cube($"event_type", $"hod")
        // value is 4-decimal by construction (verified ×10^4 within 5e-10
        // of integers), so summing EXACT 10^-4 units is value-identical
        // today and immune to summation-order drift at any future scale
        .agg(
          count(lit(1)).as("n"),
          round(sum(round($"value" * 10000).cast("long")).cast("double")
            / 10000.0, 4).as("total_value"))
        .select(
          coalesce($"event_type", lit("ALL")).as("event_type"),
          coalesce($"hod", lit(-1)).cast("long").as("hod"),
          $"n", $"total_value")
        .orderBy($"event_type", $"hod")
    },
    Some("""SELECT coalesce(event_type, 'ALL') AS event_type,
      CAST(coalesce(hour(ts), -1) AS BIGINT) AS hod,
      count(*) AS n,
      round(CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS DOUBLE)
            / 10000.0, 4) AS total_value
    FROM events GROUP BY CUBE (event_type, hour(ts))
    ORDER BY event_type, hod"""))

  // ---------------------------------------------------------------- q37
  /** Skew-safe aggregation: per-orderpriority revenue through
    * [[saltedAgg]] (priority has only 5 values — exactly the
    * few-hot-keys shape that melts a naive shuffle at scale). The oracle
    * is the DIRECT single-phase aggregation: salting must not change a
    * single value. */
  private val q37 = Q(
    "q37_salted_agg",
    (s, d) => {
      import s.implicits._
      saltedAgg(
        Tables(s, d, "orders"),
        key = $"o_orderpriority",
        saltSource = $"o_orderkey",
        salts = 16,
        // EXACT CENTS through the two-phase sum: integer partials
        // commute, so salted ≡ direct ≡ oracle EXACTLY — not merely "up
        // to double reordering error" as the float form was
        valueCol = round($"o_totalprice" * 100).cast("long"))
        .select(
          $"k".as("priority"),
          round($"total".cast("double") / 100000.0, 2).as("rev_k"),
          $"cnt",
          round($"total".cast("double") / $"cnt" / 100.0, 2).as("avg_price"))
        .orderBy($"priority")
    },
    Some("""SELECT o_orderpriority AS priority,
      round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
            / 100000.0, 2) AS rev_k,
      count(*) AS cnt,
      round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
            / count(*) / 100.0, 2) AS avg_price
    FROM orders GROUP BY 1 ORDER BY priority"""))

  // ---------------------------------------------------------------- q41
  /** K-Minimum-Values distinct sketch ([[graft.functions.KmvAgg]]) vs the
    * exact distinct count, at four sketch sizes: the k=4096 row exercises
    * the exact under-filled branch (sf0.01 has ~2k distinct partkeys),
    * the smaller k's the estimator. The oracle replays the identical
    * sketch in SQL — k smallest distinct [[PortableHash]] values, same
    * (k−1)·P/h₍ₖ₎ arithmetic — so the check is exact, not tolerance. */
  private val KmvKs = Seq(64, 256, 1024, 4096)
  private val q41 = Q(
    "q41_kmv_distinct",
    (s, d) => {
      import s.implicits._
      val li = Tables(s, d, "lineitem")
        .select($"l_partkey", PortableHash.hash($"l_partkey".cast("string")).as("hv"))
      val aggCols = KmvKs.map(k => KmvAgg.kmvDistinct($"hv", k).as(s"est_$k")) :+
        countDistinct($"l_partkey").as("exact_nd")
      li.agg(aggCols.head, aggCols.tail: _*)
        .select(
          explode(array(KmvKs.map(k =>
            struct(lit(k).as("k"), col(s"est_$k").as("est_raw"))): _*)).as("e"),
          $"exact_nd")
        .select(
          $"e.k".as("k"),
          round($"e.est_raw", 4).as("kmv_estimate"),
          $"exact_nd".as("exact_distinct"),
          round(abs($"e.est_raw" - $"exact_nd") / $"exact_nd", 4).as("rel_err"))
        .orderBy($"k")
    },
    Some(s"""WITH h AS (
        SELECT DISTINCT ${PortableHash.duckHash("CAST(l_partkey AS VARCHAR)")} AS hv
        FROM lineitem),
      ex AS (SELECT count(DISTINCT l_partkey) AS exact_nd FROM lineitem),
      ranked AS (
        SELECT ks.k, hv, row_number() OVER (PARTITION BY ks.k ORDER BY hv) AS rn
        FROM h CROSS JOIN (VALUES ${KmvKs.map(k => s"($k)").mkString(",")}) ks(k)),
      est AS (
        SELECT k,
               CASE WHEN count(*) < k THEN CAST(count(*) AS DOUBLE)
                    ELSE (k - 1) * 2147483647.0 / max(hv) END AS est_raw
        FROM ranked WHERE rn <= k GROUP BY k)
    SELECT k, round(est_raw, 4) AS kmv_estimate,
           exact_nd AS exact_distinct,
           round(abs(est_raw - exact_nd) / exact_nd, 4) AS rel_err
    FROM est CROSS JOIN ex ORDER BY k"""))

  override def all: Seq[Q] = Seq(q35, q36, q37, q41)
}
