package graft.functions

import org.apache.spark.sql.Column
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

  /** text column → ARRAY<DOUBLE> of length [[dim]], L2-normalized. */
  def encode(text: Column): Column
}

/** The hashing-trick encoder: bucket = hash(token) mod dim, sign = bit 4
  * of the hash (disjoint from low bucket bits when dim ≤ 16); vector is
  * the signed token-count per bucket, L2-normalized. */
final case class HashProjectionEncoder(dim: Int) extends TextEncoder {
  require(dim > 0 && dim <= 16, "sign bit must not overlap bucket bits")

  override def encode(text: Column): Column = {
    val hs = transform(split(trim(text), "\\s+"), w => PortableHash.hash(w))
    val sums = (0 until dim).map { i =>
      aggregate(
        hs,
        lit(0.0),
        (acc, h) =>
          acc + when(h % dim === i,
            when(shiftright(h, 4) % 2 === 0, 1.0).otherwise(-1.0)).otherwise(0.0))
    }
    val norm = sqrt(sums.map(s => s * s).reduce(_ + _))
    array(sums.map(s => s / norm): _*)
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
