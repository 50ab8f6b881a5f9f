package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, KmvAgg, L2NormExpr, TopKAgg}

/** The standard extension entry point: start any Spark application with
  * `--conf spark.sql.extensions=graft.GraftExtensions` and the engine's
  * functions are injected at session build — no imperative registration
  * call needed. ([[Functions.register]] remains for sessions the library
  * builds itself, e.g. [[GraftSession]]; both register the identical
  * builders.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.CosineStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PruneCosineQueries)
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[L2NormExpr].getName, "vec_norm"),
      (exprs: Seq[Expression]) => L2NormExpr(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("collect_top_k"),
      new ExpressionInfo(classOf[TopKAgg].getName, "collect_top_k"),
      (exprs: Seq[Expression]) => TopKAgg.fromExprs(exprs)))
    ext.injectFunction((
      FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[KmvAgg].getName, "kmv_distinct"),
      (exprs: Seq[Expression]) => KmvAgg.fromExprs(exprs)))
    // table-valued search surfaces: SELECT * FROM ann_search(dir, maxQ,
    // k, nProbe) / cosine_topk(dir, maxQ, k)
    ext.injectTableFunction((
      FunctionIdentifier("ann_search"),
      new ExpressionInfo(Functions.getClass.getName, "ann_search"),
      (exprs: Seq[Expression]) => Functions.annSearchPlan(exprs)))
    ext.injectTableFunction((
      FunctionIdentifier("cosine_topk"),
      new ExpressionInfo(Functions.getClass.getName, "cosine_topk"),
      (exprs: Seq[Expression]) => Functions.cosineTopKPlan(exprs)))
    ext.injectTableFunction((
      FunctionIdentifier("range_search"),
      new ExpressionInfo(Functions.getClass.getName, "range_search"),
      (exprs: Seq[Expression]) => Functions.rangeSearchPlan(exprs)))
    ext.injectTableFunction((
      FunctionIdentifier("parent_search"),
      new ExpressionInfo(Functions.getClass.getName, "parent_search"),
      (exprs: Seq[Expression]) => Functions.parentSearchPlan(exprs)))
    ext.injectTableFunction((
      FunctionIdentifier("graph_search"),
      new ExpressionInfo(Functions.getClass.getName, "graph_search"),
      (exprs: Seq[Expression]) => Functions.graphSearchPlan(exprs)))
    ext.injectTableFunction((
      FunctionIdentifier("ivfpq_search"),
      new ExpressionInfo(Functions.getClass.getName, "ivfpq_search"),
      (exprs: Seq[Expression]) => Functions.ivfpqSearchPlan(exprs)))
    ext.injectTableFunction((
      FunctionIdentifier("binary_search"),
      new ExpressionInfo(Functions.getClass.getName, "binary_search"),
      (exprs: Seq[Expression]) => Functions.binarySearchPlan(exprs)))
    ext.injectTableFunction((
      FunctionIdentifier("ivfsq_search"),
      new ExpressionInfo(Functions.getClass.getName, "ivfsq_search"),
      (exprs: Seq[Expression]) => Functions.ivfsqSearchPlan(exprs)))
  }
}
