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
  */
object Temporal extends QModule {

  private val GapMinutes = 30L
  private val BucketSeconds = 3600L

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
      val ev = Tables(s, d, "events")
        .select($"event_id", $"user_id", $"ts_ns")
      val probe = ev
        .withColumn("bucket", expr(s"ts_ns div ${BucketSeconds * 1000000000L}"))
      // each probe row looks in its own and the previous bucket
      val probeExp = probe
        .withColumn("b", explode(array($"bucket", $"bucket" - 1)))
        .select($"event_id", $"user_id", $"ts_ns", $"b")
      val build = ev
        .select(
          $"user_id",
          $"event_id".as("other_id"),
          $"ts_ns".as("other_ts"),
          expr(s"ts_ns div ${BucketSeconds * 1000000000L}").as("b"))
      probeExp
        .join(build, Seq("user_id", "b"))
        .filter(
          $"other_ts" >= $"ts_ns" - lit(BucketSeconds * 1000000000L) &&
          $"other_ts" < $"ts_ns" &&
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
      val wOrd = Window.partitionBy($"user_id").orderBy($"ts_ns", $"event_id")
      val wCum = Window.partitionBy($"user_id").orderBy($"ts_ns", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gapNs = GapMinutes * 60L * 1000000000L
      val sessions = Tables(s, d, "events")
        .select($"user_id", $"event_id", $"ts_ns")
        .withColumn("prev_ts", lag($"ts_ns", 1).over(wOrd))
        .withColumn("new_session",
          when($"prev_ts".isNull || $"ts_ns" - $"prev_ts" > gapNs, 1).otherwise(0))
        .withColumn("session_id", sum($"new_session").over(wCum))
        .groupBy($"user_id", $"session_id")
        .agg(
          count(lit(1)).as("n_events"),
          (max($"ts_ns") - min($"ts_ns")).as("dur_ns"))
      sessions
        .groupBy($"user_id")
        .agg(
          count(lit(1)).as("n_sessions"),
          round(avg($"n_events"), 4).as("avg_events_per_session"),
          round(avg($"dur_ns" / 1e9), 4).as("avg_session_sec"))
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
               epoch_ns(max(ts)) - epoch_ns(min(ts)) AS dur_ns
        FROM numbered GROUP BY 1, 2)
    SELECT user_id, count(*) AS n_sessions,
           round(avg(n_events), 4) AS avg_events_per_session,
           round(avg(dur_ns / 1e9), 4) AS avg_session_sec
    FROM sessions GROUP BY user_id ORDER BY user_id"""))

  override def all: Seq[Q] = Seq(q38, q39)
}
