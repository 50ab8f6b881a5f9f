package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, QModule, Tables}

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
      Tables(s, d, "orders")
        .rollup($"o_orderpriority", $"o_orderstatus")
        .agg(
          round(sum($"o_totalprice") / 1000.0, 4).as("rev_k"),
          count(lit(1)).as("n"))
        .select(
          coalesce($"o_orderpriority", lit("ALL")).as("priority"),
          coalesce($"o_orderstatus", lit("ALL")).as("status"),
          $"rev_k", $"n")
        .orderBy($"priority", $"status")
    },
    Some("""SELECT coalesce(o_orderpriority, 'ALL') AS priority,
      coalesce(o_orderstatus, 'ALL') AS status,
      round(sum(o_totalprice) / 1000.0, 4) AS rev_k, count(*) AS n
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
        .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("total_value"))
        .select(
          coalesce($"event_type", lit("ALL")).as("event_type"),
          coalesce($"hod", lit(-1)).cast("long").as("hod"),
          $"n", $"total_value")
        .orderBy($"event_type", $"hod")
    },
    Some("""SELECT coalesce(event_type, 'ALL') AS event_type,
      CAST(coalesce(hour(ts), -1) AS BIGINT) AS hod,
      count(*) AS n, round(sum(value), 4) AS total_value
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
        valueCol = $"o_totalprice")
        .select(
          $"k".as("priority"),
          // round(2): the salted two-phase sum adds in a different order
          // than the oracle's single-phase sum, so agreement is only up
          // to double reordering error (~1e-7 relative)
          round($"total" / 1000.0, 2).as("rev_k"),
          $"cnt",
          round($"mean", 2).as("avg_price"))
        .orderBy($"priority")
    },
    Some("""SELECT o_orderpriority AS priority,
      round(sum(o_totalprice) / 1000.0, 2) AS rev_k,
      count(*) AS cnt,
      round(avg(o_totalprice), 2) AS avg_price
    FROM orders GROUP BY 1 ORDER BY priority"""))

  override def all: Seq[Q] = Seq(q35, q36, q37)
}
