package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, QModule, Tables}

/** Relational operator inventory over the driver-provided TPC-H-ish tables
  * (TESTDATA.md), covering SURVEY.md §2's deterministic rows: projections
  * P1-P5, joins J1-J7, top-k T1-T5, aggregations A4-A5/A7/A9, windows
  * W1-W2, set ops O1-O3, scalar functions F1-F5/F10-F11.
  *
  * Numeric-parity conventions (driver hash-compares against DuckDB):
  *  - counts are BIGINT on both sides;
  *  - double aggregates are rounded to 4 decimals; sums over >10k rows of
  *    large values are scaled down first (order-dependent double summation
  *    differs ~1e-5 across engines, measured, so raw round(sum,4) would be
  *    flaky);
  *  - every query ends with a deterministic ORDER BY on both sides.
  */
object Relational extends QModule {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  // ---------------------------------------------------------------- q01
  /** TPC-H Q1-shaped pricing summary: scan + filter + hash aggregate
    * (SURVEY A4-style stats; reference stats at `000:200-231`). */
  private val q01 = Q(
    "q01_pricing_summary",
    (s, d) => {
      import s.implicits._
      // money sums ride EXACT INTEGER units (cents; 10^-4 dollars for the
      // discounted price, a 2-dec × 2-dec product): float sums commute
      // only approximately, and the measured sf0.1 margin between the
      // true sum and its nearest round(,4) boundary was as low as 5.7e-6
      // — one summation-order difference away from an oracle mismatch.
      // Integer sums are order-free; quantity is integer-VALUED double,
      // so its sums/avgs are exact in any order already.
      val centsBase = round($"l_extendedprice" * 100).cast("long")
      val units4Disc = round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 10000).cast("long")
      val centsDisc = round($"l_discount" * 100).cast("long")
      t(s, d, "lineitem")
        .filter($"l_shipdate" <= lit(Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 4).as("sum_qty"),
          round(sum(centsBase).cast("double") / 100000000.0, 4).as("sum_base_price_m"),
          round(sum(units4Disc).cast("double") / 10000000000.0, 4).as("sum_disc_price_m"),
          round(avg($"l_quantity"), 4).as("avg_qty"),
          round(sum(centsDisc).cast("double") / 100.0 / count(lit(1)), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
      round(sum(l_quantity), 4) AS sum_qty,
      round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
            / 100000000.0, 4) AS sum_base_price_m,
      round(CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS DOUBLE)
            / 10000000000.0, 4) AS sum_disc_price_m,
      round(avg(l_quantity), 4) AS avg_qty,
      round(CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
            / 100.0 / count(*), 4) AS avg_disc,
      count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""))

  // ---------------------------------------------------------------- q02
  /** TPC-H Q6-shaped selective filter + single aggregate — exercises
    * predicate pushdown to the parquet scan (SURVEY §4.2). */
  private val q02 = Q(
    "q02_filter_revenue",
    (s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .filter(
          $"l_shipdate" >= lit(Timestamp.valueOf("1995-01-01 00:00:00")) &&
          $"l_shipdate" < lit(Timestamp.valueOf("1996-01-01 00:00:00")) &&
          $"l_discount" >= 0.03 && $"l_discount" <= 0.07 &&
          $"l_quantity" < 24)
        .agg(
          round(sum($"l_extendedprice" * $"l_discount") / 1000.0, 4).as("revenue_k"),
          count(lit(1)).as("n_rows"))
    },
    Some("""SELECT round(sum(l_extendedprice * l_discount) / 1000.0, 4) AS revenue_k,
      count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24"""))

  // ---------------------------------------------------------------- q03
  /** Broadcast hash join orders⋈customer + aggregate per market segment
    * (SURVEY J1/J2: small-dim lookup joins are broadcast). */
  private val q03 = Q(
    "q03_segment_revenue",
    (s, d) => {
      import s.implicits._
      val orders = t(s, d, "orders")
      val cust = t(s, d, "customer")
      orders
        .join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
        .groupBy($"c_mktsegment")
        .agg(
          round(sum($"o_totalprice") / 1000000.0, 4).as("revenue_m"),
          count(lit(1)).as("n_orders"))
        .orderBy($"c_mktsegment")
    },
    Some("""SELECT c_mktsegment,
      round(sum(o_totalprice) / 1000000.0, 4) AS revenue_m,
      count(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  // ---------------------------------------------------------------- q04
  /** Left-semi join: customers having at least one URGENT order (SURVEY
    * P3/J3 — the has-ground-truth filter pattern, `002:139`). */
  private val q04 = Q(
    "q04_semi_join",
    (s, d) => {
      import s.implicits._
      val cust = t(s, d, "customer")
      val urgent = t(s, d, "orders")
        .filter($"o_orderpriority" === "1-URGENT")
        .select($"o_custkey".as("c_custkey"))
      cust
        .join(urgent, Seq("c_custkey"), "left_semi")
        .select($"c_custkey", $"c_mktsegment")
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q05
  /** Left-anti join: customers with no URGENT order (SURVEY J4 — the
    * non-relevant sampling pool, `000:328-329`). */
  private val q05 = Q(
    "q05_anti_join",
    (s, d) => {
      import s.implicits._
      val cust = t(s, d, "customer")
      val urgent = t(s, d, "orders")
        .filter($"o_orderpriority" === "1-URGENT")
        .select($"o_custkey".as("c_custkey"))
      cust
        .join(urgent, Seq("c_custkey"), "left_anti")
        .select($"c_custkey")
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q06
  /** Per-group top-k (SURVEY T1/W1 — the core search shape): top-2 line
    * items per order by extended price, deterministic tie-break. */
  private val q06 = Q(
    "q06_topk_per_order",
    (s, d) => {
      import s.implicits._
      val w = Window
        .partitionBy($"l_orderkey")
        .orderBy($"l_extendedprice".desc, $"l_linenumber".asc)
      t(s, d, "lineitem")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter($"rnk" <= 2)
        .select($"l_orderkey", $"rnk", $"l_linenumber", round($"l_extendedprice", 4).as("price"))
        .orderBy($"l_orderkey", $"rnk")
    },
    Some("""SELECT l_orderkey, rnk, l_linenumber, round(l_extendedprice, 4) AS price
    FROM (SELECT l_orderkey, l_linenumber, l_extendedprice,
            row_number() OVER (PARTITION BY l_orderkey
                               ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rnk
          FROM lineitem)
    WHERE rnk <= 2 ORDER BY l_orderkey, rnk"""))

  // ---------------------------------------------------------------- q07
  /** Latest-per-group (SURVEY W2/T4 — `005:62` latest report per method):
    * most recent order per customer. */
  private val q07 = Q(
    "q07_latest_order",
    (s, d) => {
      import s.implicits._
      val w = Window
        .partitionBy($"o_custkey")
        .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"o_custkey", $"o_orderkey", $"o_orderstatus")
        .orderBy($"o_custkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderstatus
    FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders)
    WHERE rn = 1 ORDER BY o_custkey"""))

  // ---------------------------------------------------------------- q08
  /** Set algebra (SURVEY O1-O3): parts both large and shipped, plus
    * expensive-but-never-shipped parts. */
  private val q08 = Q(
    "q08_set_ops",
    (s, d) => {
      import s.implicits._
      val shipped = t(s, d, "lineitem").select($"l_partkey".as("p_partkey"))
      val part = t(s, d, "part")
      val bigShipped = part.filter($"p_size" > 40).select($"p_partkey").intersect(shipped)
      val pricyUnshipped =
        part.filter($"p_retailprice" > 1900).select($"p_partkey").except(shipped)
      bigShipped.union(pricyUnshipped).distinct().orderBy($"p_partkey")
    },
    Some("""SELECT p_partkey FROM (
      SELECT p_partkey FROM part WHERE p_size > 40
      INTERSECT SELECT l_partkey FROM lineitem
      UNION
      (SELECT p_partkey FROM part WHERE p_retailprice > 1900
       EXCEPT SELECT l_partkey FROM lineitem)
    ) ORDER BY p_partkey"""))

  // ---------------------------------------------------------------- q09
  /** Value counts / histogram (SURVEY A5, `000:248-250`). */
  private val q09 = Q(
    "q09_value_counts",
    (s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS cnt
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  // ---------------------------------------------------------------- q10
  /** Two-level averaging (SURVEY A9 — per-query mean then unweighted mean
    * over queries, `utils.py:46`): per-customer avg order value, then the
    * unweighted mean of those. NOT a flat avg. */
  private val q10 = Q(
    "q10_two_level_avg",
    (s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .groupBy($"o_custkey")
        .agg(avg($"o_totalprice").as("cavg"))
        .agg(
          round(avg($"cavg"), 4).as("mean_of_means"),
          count(lit(1)).as("n_customers"))
    },
    Some("""SELECT round(avg(cavg), 4) AS mean_of_means, count(*) AS n_customers
    FROM (SELECT o_custkey, avg(o_totalprice) AS cavg FROM orders GROUP BY o_custkey)"""))

  // ---------------------------------------------------------------- q11
  /** argmax (SURVEY T5, `005:493-503`): priority with highest revenue. */
  private val q11 = Q(
    "q11_argmax",
    (s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .groupBy($"o_orderpriority")
        .agg(sum($"o_totalprice").as("rev"))
        .orderBy($"rev".desc, $"o_orderpriority")
        .limit(1)
        .select($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority FROM orders GROUP BY o_orderpriority
    ORDER BY sum(o_totalprice) DESC, o_orderpriority LIMIT 1"""))

  // ---------------------------------------------------------------- q12
  /** Ratio-to-total (SURVEY A7 — speedup/relative-quality vs a baseline
    * row, `005:469-487`): per-nation revenue share of the grand total. */
  private val q12 = Q(
    "q12_revenue_share",
    (s, d) => {
      import s.implicits._
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      val n = t(s, d, "nation")
      val perNation = o
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy($"n_name")
        .agg(sum($"o_totalprice").as("rev"))
      perNation
        .withColumn("pct", round($"rev" * 100.0 / sum($"rev").over(Window.partitionBy()), 4))
        .select($"n_name", round($"rev" / 1000000.0, 4).as("revenue_m"), $"pct")
        .orderBy($"n_name")
    },
    Some("""WITH per_nation AS (
      SELECT n_name, sum(o_totalprice) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name)
    SELECT n_name, round(rev / 1000000.0, 4) AS revenue_m,
           round(rev * 100.0 / sum(rev) OVER (), 4) AS pct
    FROM per_nation ORDER BY n_name"""))

  // ---------------------------------------------------------------- q13
  /** Dataset statistics (SURVEY A4, `000:200-231`): word/char stats over
    * the documents table (P2 word-count projection). */
  private val q13 = Q(
    "q13_doc_stats",
    (s, d) => {
      import s.implicits._
      t(s, d, "documents")
        .select(size(split(trim($"text"), "\\s+")).cast("long").as("n_words"), $"n_chars")
        .agg(
          count(lit(1)).as("n_docs"),
          min($"n_words").as("min_words"),
          max($"n_words").as("max_words"),
          round(avg($"n_words"), 4).as("avg_words"),
          round(avg($"n_chars"), 4).as("avg_chars"))
    },
    Some("""SELECT count(*) AS n_docs,
      min(n_words) AS min_words, max(n_words) AS max_words,
      round(avg(n_words), 4) AS avg_words, round(avg(n_chars), 4) AS avg_chars
    FROM (SELECT CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_words, n_chars
          FROM documents)"""))

  // ---------------------------------------------------------------- q14
  /** Scalar string functions (SURVEY F1-F5/P4-P5): trim, substring,
    * concat_ws, upper, length on documents. */
  private val q14 = Q(
    "q14_string_funcs",
    (s, d) => {
      import s.implicits._
      t(s, d, "documents")
        .filter($"doc_id" < 20)
        .select(
          $"doc_id",
          upper(substring(trim($"text"), 1, 20)).as("snippet"),
          concat_ws("-", $"lang", $"source").as("tag"),
          length($"text").cast("long").as("text_len"))
        .orderBy($"doc_id")
    },
    Some("""SELECT doc_id,
      upper(substring(trim(text), 1, 20)) AS snippet,
      concat_ws('-', lang, source) AS tag,
      CAST(length(text) AS BIGINT) AS text_len
    FROM documents WHERE doc_id < 20 ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q15
  /** Time-bucketed aggregation over the events table (tumbling-window
    * analog; capability headroom per SURVEY §2.11). */
  private val q15 = Q(
    "q15_events_hourly",
    (s, d) => {
      import s.implicits._
      // exact 10^-4 units, not float sums — see q36's rationale
      t(s, d, "events")
        .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
        .agg(
          count(lit(1)).as("cnt"),
          round(sum(round($"value" * 10000).cast("long")).cast("double")
            / 10000.0, 4).as("total_value"))
        .orderBy($"hour", $"event_type")
    },
    Some("""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
      count(*) AS cnt,
      round(CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS DOUBLE)
            / 10000.0, 4) AS total_value
    FROM events GROUP BY 1, 2 ORDER BY hour, event_type"""))

  // ---------------------------------------------------------------- q16
  /** Latest event per user (SURVEY W2 over the stream table — the
    * upsert/compaction shape of streaming dedup). */
  private val q16 = Q(
    "q16_latest_event",
    (s, d) => {
      import s.implicits._
      // µs-truncated ordering: the oracle ranks DuckDB's µs TIMESTAMP,
      // so the engine must not break ties on sub-µs nanos it alone sees
      val w = Window
        .partitionBy($"user_id")
        .orderBy(expr("ts_ns div 1000").desc, $"event_id".desc)
      t(s, d, "events")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_id", $"event_type")
        .orderBy($"user_id")
    },
    Some("""SELECT user_id, event_id, event_type
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1 ORDER BY user_id"""))

  override def all: Seq[Q] =
    Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q13, q14, q15, q16)
}
