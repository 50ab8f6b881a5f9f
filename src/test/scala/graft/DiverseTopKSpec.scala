package graft

import org.apache.spark.sql.functions._

/** v22 diversified top-k: the label cap must hold in every query's
  * results, k must be met, and the plan must be the two-heap-aggregate
  * shape — no per-query window sort anywhere. */
class DiverseTopKSpec extends SparkSpec {

  import spark.implicits._

  private lazy val result = SparkEntry.queries("v22_diverse_topk")(spark, sf0001)

  test("no label exceeds the cap in any query's results; k is met") {
    val labels = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val rows = result.select($"query_id", $"doc_id").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    val perQ = rows.groupBy(_._1)
    assert(perQ.values.forall(_.length == 10), "k not met")
    perQ.foreach { case (q, hits) =>
      val byLabel = hits.groupBy(h => labels(h._2)).view.mapValues(_.length)
      assert(byLabel.values.forall(_ <= 2),
        s"query $q: label over cap: ${byLabel.toMap}")
    }
  }

  test("plan is heap aggregates only — no window sort") {
    val plan = result.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window sort leaked into the plan:\n$plan")
  }

  test("diversified set differs from the plain top-10 when a label dominates") {
    // the cap must actually bite somewhere across 20 queries: the plain
    // exact top-10 (v03 oracle semantics) has at least one query with >2
    // hits of one label, and v22 replaces the overflow
    val labels = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val plain = graft.operators.VectorSearch.searchFrame(spark, sf0001)
      .filter($"rnk" <= 10 && $"query_id" < 20)
      .select($"query_id", $"doc_id").as[(Long, Long)].collect()
    val overCap = plain.groupBy(_._1).exists { case (_, hits) =>
      hits.groupBy(h => labels(h._2)).values.exists(_.length > 2)
    }
    assert(overCap, "fixture never exercises the cap — test is vacuous")
    val diverse = result.select($"query_id", $"doc_id").as[(Long, Long)].collect().toSet
    assert(diverse != plain.toSet)
  }
}
