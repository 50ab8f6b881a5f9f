package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

import graft.functions.{DotProduct, L2NormExpr}

/** SQL-surface registration of the engine's native vector expressions, so
  * `spark.sql("SELECT vec_dot(a, b) ...")` works alongside the Column API.
  */
object Functions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_norm", exprs => L2NormExpr(exprs(0)), "built-in")
    // collect_top_k(score, id, k) — k must be a foldable integer literal;
    // the shared builder validates and reports clearly if it is not.
    reg.createOrReplaceTempFunction(
      "collect_top_k", graft.functions.TopKAgg.fromExprs, "built-in")
    // kmv_distinct(hash, k) — K-Minimum-Values distinct sketch.
    reg.createOrReplaceTempFunction(
      "kmv_distinct", graft.functions.KmvAgg.fromExprs, "built-in")
  }

  /** Codegen'd dot product (register first — [[GraftSession.build]] does). */
  def vecDot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** Codegen'd L2 norm. */
  def vecNorm(a: Column): Column = call_function("vec_norm", a)
}
