package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._

import graft.operators.Temporal

/** [[Temporal.asofJoin]] — union + running-last window as-of join. The
  * reference for semantics is the naive inequality-join formulation
  * (computed here over small frames only); the operator must match it
  * exactly, including inclusive ties and unmatched-left nulls, while
  * planning as window + exchange, never a nested loop.
  */
class AsOfSpec extends SparkSpec {

  import spark.implicits._

  private def left = Seq(
    (1L, 10L, 100L), // key 10: matches r at ts 90
    (2L, 10L, 90L),  // inclusive: right row AT ts 90 matches
    (3L, 10L, 50L),  // before all right rows -> null
    (4L, 20L, 500L), // key 20: matches latest of two candidates
    (5L, 30L, 7L)    // key absent on the right -> null
  ).toDF("id", "k", "ts")

  private def right = Seq(
    (10L, 90L, 901L),
    (10L, 60L, 601L),
    (20L, 400L, 401L),
    (20L, 450L, 451L),
    (20L, 450L, 452L) // same ts twice: greatest tieBreak must win
  ).toDF("k", "ts", "rid")

  test("matches the naive inequality-join semantics, inclusive ties") {
    val got = Temporal
      .asofJoin(left, right, "k", "ts", Seq("rid"), "rid")
      .select($"id", $"rid")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got == Map(1L -> 901L, 2L -> 901L, 3L -> -1L, 4L -> 452L, 5L -> -1L))
  }

  test("carries multiple payload columns through the struct") {
    val r2 = right.withColumn("tag", concat(lit("r"), $"rid"))
    val row = Temporal
      .asofJoin(left.filter($"id" === 4), r2, "k", "ts", Seq("rid", "tag"), "rid")
      .select($"rid", $"tag")
      .head()
    assert(row.getLong(0) == 452L && row.getString(1) == "r452")
  }

  test("plans as window + shuffle, not a nested-loop join") {
    val plan = Temporal
      .asofJoin(left, right, "k", "ts", Seq("rid"), "rid")
      .queryExecution.executedPlan
    def nodes(p: SparkPlan): Seq[SparkPlan] = p +: p.children.flatMap(nodes)
    val all = nodes(plan)
    assert(!all.exists(n =>
      n.isInstanceOf[BroadcastNestedLoopJoinExec] || n.isInstanceOf[CartesianProductExec]))
    assert(all.count(_.isInstanceOf[ShuffleExchangeExec]) <= 2) // union legs
  }

  test("rejects reserved internal names and payload collisions") {
    val clash = left.withColumn("__side", lit(1))
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(clash, right, "k", "ts", Seq("rid"), "rid")
    }
    val clashPayload = left.withColumn("rid", lit(0L))
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(clashPayload, right, "k", "ts", Seq("rid"), "rid")
    }
  }

  test("q40 oracle parity shape: every purchase appears exactly once") {
    val q40 = SparkEntry.queries("q40_asof_join")(spark, sf0001)
    val purchases = Tables(spark, sf0001, "events")
      .filter($"event_type" === "purchase").count()
    assert(q40.count() == purchases)
    assert(q40.select("event_id").distinct().count() == purchases)
    // matched rows must have a non-negative gap (click at or before purchase)
    assert(q40.filter($"click_id" =!= -1L && $"gap_us" < 0).count() == 0)
  }
}
