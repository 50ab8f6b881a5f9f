package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, QModule, Tables}

/** Temporal operators over the events table — the two shapes every event
  * pipeline needs that naive Spark plans get catastrophically wrong at
  * scale:
  *
  *  - RANGE JOIN: plain Spark executes an inequality-only join as a
  *    broadcast nested loop (all pairs). [[q38]] runs it as a BUCKETED
  *    range join: both sides bucket by coarse time window, candidates
  *    come from an EQUI-join on (key, bucket) for the two buckets a range
  *    can span, and the exact inequality filters candidates — shuffle
  *    cost Σ bucket², never n².
  *
  *  - SESSIONIZATION: gap-based session assignment via the
  *    lag + cumulative-sum window idiom (a new session starts where the
  *    gap from the previous event exceeds the threshold).
  *
  *  - AS-OF JOIN: "latest right row at or before each left row" executed
  *    as UNION + running `last(ignoreNulls)` window ([[asofJoin]]) — one
  *    shuffle by key, no inequality-join candidate explosion.
  */
object Temporal extends QModule {

  private val GapMinutes = 30L
  private val BucketSeconds = 3600L

  /** Scale-safe AS-OF join: for every `left` row, attach the payload of
    * the latest `right` row with `right.tsCol <= left.tsCol` on the same
    * `keyCol` (inclusive match, like DuckDB `ASOF JOIN ... ON l.ts >=
    * r.ts`); unmatched left rows get a null payload (left-outer).
    *
    * Plan shape: tag right rows side=0 / left rows side=1, union, then a
    * running `last(payload, ignoreNulls)` over
    * `partitionBy(key).orderBy(ts, side, tieBreak)` and keep the left
    * side. At equal `ts` the right row sorts first (side 0 < 1), which is
    * exactly the inclusive semantics; among right rows sharing a `ts`,
    * the greatest `tieBreak` wins (deterministic).
    *
    * 100 TB design: a naive inequality join plans as a nested loop (all
    * pairs per key — quadratic); the union form is ONE hash exchange on
    * the key plus a per-partition sort, the same cost as any windowed
    * aggregate, and AQE can split skewed keys. `payload` is carried as a
    * single struct column so the window computes one running value no
    * matter how many right columns ride along.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payload: Seq[String],
      tieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    // internal plumbing columns must not exist in either input, and the
    // attached payload must not shadow a left column (ADVICE r3: a silent
    // collision would corrupt the running-last window or the final select)
    val reserved = Seq("__asof", "__side", "__match")
    val inputCols = (leftCols ++ right.columns).toSet
    require(
      reserved.forall(!inputCols.contains(_)),
      s"asofJoin: inputs must not contain reserved columns ${reserved.mkString(", ")}")
    val payloadClash = payload.filter(leftCols.contains)
    require(
      payloadClash.isEmpty,
      s"asofJoin: payload columns ${payloadClash.mkString(", ")} collide with left's columns")
    val r = right.select(
      col(keyCol),
      col(tsCol),
      struct((tieBreak +: payload.filterNot(_ == tieBreak)).map(col): _*).as("__asof"))
      .withColumn("__side", lit(0))
    val l = left.withColumn("__side", lit(1))
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"), col(s"__asof.$tieBreak"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l, allowMissingColumns = true)
      .withColumn("__match", last(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col(s"__match.$p").as(p)): _*)
  }

  // ---------------------------------------------------------------- q38
  /** For each user's event, count that user's OTHER events in the
    * preceding hour (exclusive of self): a self range join keyed on
    * user_id with predicate ts − 1h ≤ other.ts < ts. Bucketing by hour
    * means candidates come from the event's bucket and the previous one
    * only, via equi-join. Output: events with ≥1 predecessor. */
  private val q38 = Q(
    "q38_range_join",
    (s, d) => {
      import s.implicits._
      // MICROS precision (q39/q40 contract): the oracle's interval
      // predicate runs on DuckDB's µs-truncated TIMESTAMP, so the range
      // bounds must not consult sub-µs nanos — a pair within 1 µs of the
      // exact 1 h boundary would otherwise split the engines
      val ev = Tables(s, d, "events")
        .select($"event_id", $"user_id", expr("ts_ns div 1000").as("ts_us"))
      val probe = ev
        .withColumn("bucket", expr(s"ts_us div ${BucketSeconds * 1000000L}"))
      // each probe row looks in its own and the previous bucket
      val probeExp = probe
        .withColumn("b", explode(array($"bucket", $"bucket" - 1)))
        .select($"event_id", $"user_id", $"ts_us", $"b")
      val build = ev
        .select(
          $"user_id",
          $"event_id".as("other_id"),
          $"ts_us".as("other_ts"),
          expr(s"ts_us div ${BucketSeconds * 1000000L}").as("b"))
      probeExp
        .join(build, Seq("user_id", "b"))
        .filter(
          $"other_ts" >= $"ts_us" - lit(BucketSeconds * 1000000L) &&
          $"other_ts" < $"ts_us" &&
          $"other_id" =!= $"event_id")
        .groupBy($"event_id")
        .agg(count(lit(1)).as("n_prior_events"))
        .orderBy($"event_id")
    },
    Some(s"""SELECT a.event_id, count(*) AS n_prior_events
      FROM events a JOIN events b
        ON a.user_id = b.user_id
       AND b.ts >= a.ts - INTERVAL 1 HOUR
       AND b.ts < a.ts
       AND b.event_id <> a.event_id
      GROUP BY a.event_id ORDER BY a.event_id"""))

  // ---------------------------------------------------------------- q39
  /** Gap-based sessionization: order each user's events by time, start a
    * new session when the gap from the previous event exceeds 30 min
    * (lag + cumulative sum of session-start flags), then aggregate
    * per-user session stats. */
  private val q39 = Q(
    "q39_sessionize",
    (s, d) => {
      import s.implicits._
      // MICROS precision throughout, like q40: DuckDB truncates the
      // fixture's TIMESTAMP(NANOS) to µs, so ordering, gap tests and
      // durations must all run on `ts_ns div 1000` for the two engines
      // to see the same instants (at full nanos, sub-µs duration
      // residue pushed one sf0.1 user's mean across a round(…,4)
      // boundary: engine 61.75065000…, oracle 61.75064997…).
      val wOrd = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val wCum = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gapUs = GapMinutes * 60L * 1000000L
      val sessions = Tables(s, d, "events")
        .select($"user_id", $"event_id", expr("ts_ns div 1000").as("ts_us"))
        .withColumn("prev_ts", lag($"ts_us", 1).over(wOrd))
        .withColumn("new_session",
          when($"prev_ts".isNull || $"ts_us" - $"prev_ts" > gapUs, 1).otherwise(0))
        .withColumn("session_id", sum($"new_session").over(wCum))
        .groupBy($"user_id", $"session_id")
        .agg(
          count(lit(1)).as("n_events"),
          (max($"ts_us") - min($"ts_us")).as("dur_us"))
      // the averages are stated as exact-integer sums divided ONCE —
      // `avg(dur_us / 1e6)` would sum doubles in partition order, and a
      // mean landing near a round(…,4) tie would round apart across
      // engines. Integer sums are order-free, so the pre-round double
      // is bit-identical on both sides by construction.
      sessions
        .groupBy($"user_id")
        .agg(
          count(lit(1)).as("n_sessions"),
          round(sum($"n_events").cast("double") / count(lit(1)), 4)
            .as("avg_events_per_session"),
          round(sum($"dur_us").cast("double") / count(lit(1)) / 1e6, 4)
            .as("avg_session_sec"))
        .orderBy($"user_id")
    },
    Some(s"""WITH ordered AS (
        SELECT user_id, event_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events),
      flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN prev_ts IS NULL
                         OR ts - prev_ts > INTERVAL ${GapMinutes} MINUTES
                    THEN 1 ELSE 0 END AS new_session
        FROM ordered),
      numbered AS (
        SELECT user_id, event_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged),
      sessions AS (
        SELECT user_id, session_id, count(*) AS n_events,
               epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
        FROM numbered GROUP BY 1, 2)
    SELECT user_id, count(*) AS n_sessions,
           round(CAST(sum(n_events) AS DOUBLE) / count(*), 4) AS avg_events_per_session,
           round(CAST(sum(dur_us) AS DOUBLE) / count(*) / 1e6, 4) AS avg_session_sec
    FROM sessions GROUP BY user_id ORDER BY user_id"""))

  // ---------------------------------------------------------------- q40
  /** AS-OF join on the events stream: for each purchase, the user's
    * latest click at or before it, plus the gap in seconds. Timestamps
    * compare at MICROS precision (`ts_ns div 1000`): the fixture carries
    * sub-microsecond nanos that DuckDB's TIMESTAMP truncates away, so the
    * engine must round the same way for the oracle to be meaningful.
    * Clicks are first deduped to max event_id per (user, ts) — DuckDB's
    * ASOF picks an arbitrary row among equal timestamps; the dedup makes
    * both sides deterministic. */
  private val q40 = Q(
    "q40_asof_join",
    (s, d) => {
      import s.implicits._
      val ev = Tables(s, d, "events")
        .withColumn("ts_us", expr("ts_ns div 1000"))
      val purchases = ev
        .filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts_us")
      val clicks = ev
        .filter($"event_type" === "click")
        .groupBy($"user_id", $"ts_us")
        .agg(max($"event_id").as("click_id"))
        .select($"user_id", $"ts_us", $"click_id", $"ts_us".as("click_ts_us"))
      asofJoin(purchases, clicks, "user_id", "ts_us", Seq("click_id", "click_ts_us"), "click_id")
        .select(
          $"event_id",
          $"user_id",
          coalesce($"click_id", lit(-1L)).as("click_id"),
          // exact integer micros, not rounded seconds: a round(x, 4) of
          // the quotient can land on a half-way double where Spark
          // (HALF_UP) and DuckDB disagree in the last digit
          coalesce($"ts_us" - $"click_ts_us", lit(-1L)).as("gap_us"))
        .orderBy($"event_id")
    },
    Some("""WITH clicks AS (
        SELECT user_id, ts, max(event_id) AS click_id
        FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id,
           coalesce(c.click_id, -1) AS click_id,
           coalesce(epoch_us(p.ts) - epoch_us(c.ts), -1) AS gap_us
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id"""))

  override def all: Seq[Q] = Seq(q38, q39, q40)
}
