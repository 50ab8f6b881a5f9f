package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** V1 — embedding generation as a pluggable encoder stage (SURVEY §2.10:
  * "capability exposed as pluggable encoder …; deterministic
  * hash-projection featurizer for tests, real model optional"). The
  * reference encodes with sentence-transformers on GPU
  * (`001-get_embeddings.py:178-209`); that crosses into a model runtime
  * this build intentionally excludes, so the shipped implementation is
  * the HASHING-TRICK text featurizer: token → portable hash → signed
  * bucket contribution → L2-normalized dense vector. It is a real
  * (if crude) text embedding — similar token multisets land near each
  * other in cosine space — fully deterministic, executor-side, and a
  * narrow per-row operation (NO shuffle: the whole encode is one
  * projection, which is exactly the execution shape a real batched model
  * encoder plugs into via mapPartitions).
  */
trait TextEncoder {
  def dim: Int

  /** Add `outCol` (ARRAY<DOUBLE> length [[dim]], L2-normalized) encoding
    * `textCol`. Frame-level rather than a single Column expression so the
    * implementation can stage intermediate projections — higher-order
    * functions inline their argument expressions, and a one-expression
    * encode would re-evaluate the token-hash pass once per referencing
    * lambda (measured 2× on the norm division alone). */
  def encode(df: DataFrame, textCol: String, outCol: String): DataFrame
}

/** The hashing-trick encoder: bucket = hash(token) mod dim, sign = bit 4
  * of the hash (disjoint from low bucket bits when dim ≤ 16); vector is
  * the signed token-count per bucket, L2-normalized. */
final case class HashProjectionEncoder(dim: Int) extends TextEncoder {
  require(dim > 0 && dim <= 16, "sign bit must not overlap bucket bits")

  override def encode(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    // stage 1: hash tokens once per row (bound column, not inlined into
    // downstream lambdas)
    val hsCol = s"__${outCol}_hs"
    val sumsCol = s"__${outCol}_sums"
    val withHs = df.withColumn(
      hsCol,
      transform(split(trim(col(textCol)), "\\s+"), w => PortableHash.hash(w)))
    // stage 2: ONE aggregate pass with an array accumulator (per-dim
    // conditional sums as separate aggregate() calls would re-scan and
    // re-hash `dim` times)
    val withSums = withHs.withColumn(
      sumsCol,
      aggregate(
        col(hsCol),
        array_repeat(lit(0.0), dim),
        (acc, h) => {
          val sign = when(shiftright(h, 4) % 2 === 0, lit(1.0)).otherwise(lit(-1.0))
          transform(acc, (v, i) => v + when(h % dim === i.cast("long"), sign).otherwise(0.0))
        }))
    // stage 3: normalize; the norm aggregate re-evaluates per element but
    // over the BOUND 16-element sums column — trivial
    withSums
      .withColumn(
        outCol,
        transform(
          col(sumsCol),
          s => {
            val nrm = sqrt(aggregate(col(sumsCol), lit(0.0), (a, x) => a + x * x))
            // all-cancelling (or empty) token sets yield a zero vector,
            // not 0/0 nulls — documented contract exception
            when(nrm === 0.0, lit(0.0)).otherwise(s / nrm)
          }))
      .drop(hsCol, sumsCol)
  }

  /** DuckDB replication: same per-dim signed sums + normalization over
    * expression `textExpr`, emitted as one projection list. Returns the
    * SQL snippets for each dimension given a CTE exposing `hs` (a LIST of
    * hashed tokens). */
  def duckSums(hsExpr: String): Seq[String] =
    (0 until dim).map { i =>
      s"list_sum([CASE WHEN h % $dim = $i THEN (CASE WHEN (h // 16) % 2 = 0 THEN 1.0 ELSE -1.0 END) ELSE 0.0 END for h in $hsExpr])"
    }
}
