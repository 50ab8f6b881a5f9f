package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg

/** collect_top_k must agree with the window row_number formulation on
  * every input — including across partial/merge boundaries (many input
  * partitions) and on ties (score desc, id asc). */
class TopKAggSpec extends SparkSpec {

  test("collect_top_k == window row_number on random data, many partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(5000) { i =>
      (i % 37L, rnd.nextInt(50).toDouble, i.toLong) // few groups, many ties
    }
    val df = rows.toDF("query_id", "score", "doc_id").repartition(13).cache()
    val agg = graft.operators.BruteForce.rerank(df, 5)
      .select($"query_id", $"rnk", $"doc_id", $"score")
    val w = Window.partitionBy($"query_id").orderBy($"score".desc, $"doc_id".asc)
    val win = df.withColumn("rnk", row_number().over(w).cast("long")).filter($"rnk" <= 5)
      .select($"query_id", $"rnk", $"doc_id", $"score")
    assert(agg.collect().map(_.toSeq).toSet == win.collect().map(_.toSeq).toSet)
    assert(agg.count() == 37 * 5)
  }

  test("collect_top_k is callable from SQL") {
    import spark.implicits._
    Seq((1L, 3.0, 10L), (1L, 5.0, 11L), (1L, 4.0, 12L))
      .toDF("q", "score", "id").createOrReplaceTempView("tk_in")
    val out = spark.sql(
      "SELECT q, collect_top_k(score, id, 2) AS topk FROM tk_in GROUP BY q")
      .select($"q", $"topk").collect().head
    val hits = out.getSeq[org.apache.spark.sql.Row](1)
    assert(hits.map(h => (h.getDouble(0), h.getLong(1))) == Seq((5.0, 11L), (4.0, 12L)))
  }

  test("the aggregate plan has partial top-k before the shuffle (no window sort)") {
    import spark.implicits._
    val df = spark.range(1000).select(
      ($"id" % 10).as("query_id"), rand(1).as("score"), $"id".as("doc_id"))
    val plan = graft.operators.BruteForce.rerank(df, 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_collecttopk") || plan.contains("partial_topkagg"),
      s"no map-side partial aggregation:\n${plan.take(1500)}")
    assert(!plan.contains("Window"), "re-rank fell back to a window sort")
  }
}
