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
    // ann_search(dir, max_query_id, k, n_probe) — the TABLE-VALUED entry
    // point: `SELECT * FROM ann_search(...)` expands to the engine's
    // partition-pruned IVF search plan at analysis time.
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "ann_search", annSearchPlan, "built-in")
  }

  /** Table-function builder for `ann_search(dir, max_query_id, k,
    * n_probe)`: evaluates the four foldable arguments and expands to the
    * ANALYZED logical plan of [[operators.Ann.search]] — the same
    * partition-pruned, broadcast-probed plan the Column API produces, so
    * the SQL surface inherits every pushdown and the bounded-heap
    * re-rank rather than re-deriving search semantics in the parser.
    * (The closest public analog is Spark's own range(...) TVF expanding
    * to a logical Range node.) Index build-if-absent runs at expansion,
    * like any view materialization side effect. */
  private[graft] def annSearchPlan(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    require(exprs.length == 4,
      s"ann_search(dir, max_query_id, k, n_probe) takes 4 arguments, got ${exprs.length}")
    def arg(i: Int, what: String): Any = {
      require(exprs(i).foldable, s"ann_search $what must be a literal, got ${exprs(i)}")
      val v = exprs(i).eval()
      require(v != null, s"ann_search $what must not be null")
      v
    }
    val dir = arg(0, "dir").toString
    def intArg(i: Int, what: String): Int = arg(i, what) match {
      case n: java.lang.Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"ann_search $what must be an integer literal, got $other")
    }
    val spark = SparkSession.active
    operators.Ann
      .search(spark, dir, intArg(1, "max_query_id"), intArg(2, "k"), intArg(3, "n_probe"))
      .queryExecution.analyzed
  }

  /** Codegen'd dot product (register first — [[GraftSession.build]] does). */
  def vecDot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** Codegen'd L2 norm. */
  def vecNorm(a: Column): Column = call_function("vec_norm", a)

  /** U(0,1) from a row KEY — the engine-wide deterministic variate (same
    * LCG as v07's layer assignment). A pure function of the key, so any
    * selection built on it is identical under any partitioning and any
    * engine. ONE definition (was triplicated across Sampling/Ann/Pq —
    * the cross-engine constants are load-bearing for oracle parity). */
  def keyLcgU(key: Column): Column = {
    import org.apache.spark.sql.functions.lit
    (((key * lit(1103515245L) + lit(12345L)) % lit(2147483648L)) + lit(1.0)) / lit(2147483649.0)
  }

  /** DuckDB rendering of [[keyLcgU]] — identical arithmetic. */
  def duckKeyLcgU(key: String): String =
    s"((($key * 1103515245 + 12345) % 2147483648) + 1.0) / 2147483649.0"
}
