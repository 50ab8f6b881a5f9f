package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared HyperLogLog arithmetic (Flajolet et al. 2007) in the engine's
  * portable-integer style — used by the batch vocabulary sketch (q77)
  * and the streaming distinct-user sketch (q80), and replayed verbatim
  * by their DuckDB oracles. All state is (register, max-rank) pairs;
  * `max` is monotone, which is exactly why the same declarative
  * aggregation is valid in batch AND as incremental streaming state.
  *
  * Layout: h = [[PortableHash]] ∈ [0, 2³¹−1); register = h mod [[M]];
  * w = h div M < 2^[[WBits]]; rank ρ(w) = leading-zero count within
  * WBits bits + 1, via an integer comparison chain (no float log in
  * either engine). The harmonic sum Σ 2^−M_j is published scaled by
  * 2^(WBits+1) (exact integer; empty registers contribute the full
  * 2^(WBits+1)), and the raw estimate α_m·m²/Z is the all-integer
  * floor division [[EstNum]] div (1000·S) with α_64 = 0.709 carried as
  * the per-mille 709. */
object Hll {

  val M = 64
  val WBits = 25 // h div 64 < 2^25 since h < P < 2^31

  /** Numerator of the raw estimate: 709 · m² · 2^(WBits+1); the
    * estimate is `EstNum div (1000 · s_scaled)`. */
  val EstNum: Long = 709L * M * M * (1L << (WBits + 1))

  def reg(h: Column): Column = h % M

  /** w = h div M as a Column expression (`h` must be the column name). */
  def w(hName: String): Column = expr(s"$hName div $M")

  /** ρ(w): position of the highest set bit from the top of the WBits
    * window, 1-based; w = 0 → WBits + 1. */
  def rhoOf(w: Column): Column = {
    val first: Column = when(w >= (1L << (WBits - 1)), 1)
    (2 to WBits)
      .foldLeft(first)((c, j) => c.when(w >= (1L << (WBits - j)), j))
      .otherwise(WBits + 1)
  }

  /** Scaled per-register indicator 2^(WBits+1−mrho) (`mrho` must be the
    * column name; 0 for an empty register). */
  def indicator(mrhoName: String): Column =
    expr(s"shiftleft(CAST(1 AS BIGINT), ${WBits + 1} - $mrhoName)")

  /** The raw-estimate expression over an `s_scaled` column name. */
  def estimate(sScaledName: String): Column =
    expr(s"${EstNum}L div (1000 * $sScaledName)")

  // ---------------------------------------------------------- DuckDB SQL

  def duckReg(h: String): String = s"($h % $M)"
  def duckW(h: String): String = s"($h // $M)"

  def duckRhoCase(w: String): String =
    (1 to WBits)
      .map(j => s"WHEN $w >= ${1L << (WBits - j)} THEN $j")
      .mkString("CASE ", " ", s" ELSE ${WBits + 1} END")

  def duckIndicator(mrho: String): String =
    s"(CAST(1 AS BIGINT) << (${WBits + 1} - $mrho))"

  def duckEstimate(sScaled: String): String =
    s"($EstNum // (1000 * $sScaled))"
}
