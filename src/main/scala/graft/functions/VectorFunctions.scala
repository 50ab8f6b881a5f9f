package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ARRAY<FLOAT>/ARRAY<DOUBLE> columns, expressed with
  * codegen'd higher-order functions so Catalyst keeps them inside
  * whole-stage codegen. All accumulation is done in DOUBLE regardless of
  * the element type, for cross-engine numeric parity (the reference
  * computes cosine in float32 BLAS, `002:189`; we standardize on double).
  *
  * These HOF forms are the correctness baseline; the hot path uses the
  * fused kernel in [[graft.operators.BruteForce]].
  */
object VectorFunctions {

  /** Σ a_i * b_i with double accumulation (reference: cosine numerator,
    * `notebooks/002-brute_force_similarity.py:189`). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** ||a||_2 (reference: `notebooks/004-faiss_demo.py:193-196`). */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** cosine(a, b) = dot / (||a|| ||b||). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** a / ||a||_2 — normalize-once so cosine becomes a plain dot product
    * downstream (reference: `004:187-196`). Returns ARRAY<DOUBLE>. */
  def l2Normalize(a: Column): Column = {
    val n = l2Norm(a)
    transform(a, x => x.cast("double") / n)
  }
}
