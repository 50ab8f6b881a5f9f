package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's `private[sql]` Column↔Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`): Spark 4 removed the
  * public `Column(expr)` constructor, and a library shipping custom
  * Catalyst expressions (graft.functions.TopKAgg) still needs to surface
  * them as Columns. One of two files outside the `graft` namespace (the
  * other: `org.apache.spark.GraftSparkInternal`, the bench telemetry's
  * listener-bus drain).
  */
object GraftInternal {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame from a catalyst LogicalPlan (classic
    * `Dataset.ofRows` is `private[sql]`) — needed to surface custom
    * logical nodes like graft.plans.CosineCandidates. */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Apply an extensions object's injected functions to a registry —
    * `SparkSessionExtensions.registerFunctions` is `private[sql]`; tests
    * use this to observe injection without building a second session. */
  def registerFunctions(
      ext: SparkSessionExtensions,
      registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry)
    : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    ext.registerFunctions(registry)

  /** Same bridge for injected TABLE functions (`registerTableFunctions`
    * is `private[sql]` too) — observes ann_search's injection. */
  def registerTableFunctions(
      ext: SparkSessionExtensions,
      registry: org.apache.spark.sql.catalyst.analysis.TableFunctionRegistry)
    : org.apache.spark.sql.catalyst.analysis.TableFunctionRegistry =
    ext.registerTableFunctions(registry)
}
