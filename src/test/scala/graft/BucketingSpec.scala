package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.operators.Bucketing

/** [[graft.operators.Bucketing]] — the join must be co-located (zero
  * exchanges) and the layout must not change any value. */
class BucketingSpec extends SparkSpec {

  private def collectNodes(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => collectNodes(a.executedPlan)
      case other => Seq(other)
    }
    self ++ p.children.flatMap(collectNodes)
  }

  test("bucketed join plans with zero shuffle exchanges") {
    // disable broadcast so the assertion exercises the bucketed SMJ path,
    // not a broadcast join that would also be exchange-free on one side
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.coLocatedJoin(spark, sf0001)
      joined.collect()
      val nodes = collectNodes(joined.queryExecution.executedPlan)
      val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
      assert(shuffles == 0, s"expected co-located join, found $shuffles exchanges")
      assert(joined.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bucketed join row count matches the raw-parquet join") {
    val bucketed = Bucketing.coLocatedJoin(spark, sf0001).count()
    val raw = Tables(spark, sf0001, "orders")
      .join(
        Tables(spark, sf0001, "lineitem"),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"))
      .count()
    assert(bucketed == raw)
  }

  test("q43 aggregates equal the direct-join aggregation") {
    import spark.implicits._
    val viaBuckets = SparkEntry.queries("q43_bucketed_join")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val direct = Tables(spark, sf0001, "orders")
      .join(Tables(spark, sf0001, "lineitem"), $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderpriority")
      .agg(
        org.apache.spark.sql.functions.count($"l_orderkey").as("n_items"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.sum($"l_extendedprice" * (org.apache.spark.sql.functions.lit(1.0) - $"l_discount")) / 1000.0, 2).as("rev_k"))
      .orderBy($"o_orderpriority")
      .collect().map(_.toSeq).toSeq
    assert(viaBuckets == direct)
  }
}
