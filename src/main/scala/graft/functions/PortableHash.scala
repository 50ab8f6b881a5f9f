package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A string hash defined in plain arithmetic that Spark and DuckDB
  * evaluate identically (the cross-engine oracle contract): base-31
  * Horner chain over the first [[Chars]] chars (right-padded/truncated
  * with '_' via rpad, identical in both engines), reduced mod P = 2^31−1
  * at every step, then a Knuth multiplicative mix mod P. Per-step values
  * stay below P·31 + 127 < 2^36 and the final mix below (P−1)·2654435761
  * ≈ 5.7e18 < 2^63, so no overflow under Spark ANSI mode or DuckDB
  * BIGINT. ASCII inputs only (the fixtures are verified pure ASCII;
  * `ascii()` semantics diverge across engines beyond code point 127).
  *
  * 24 chars cover nearly the whole of a word-3-gram shingle — an earlier
  * 8-char-prefix variant collided 16.5k fixture shingles down to 1.2k
  * hash values (shingles share leading words), which inflated LSH
  * candidate sets ~100×.
  */
object PortableHash {

  val P: Long = 2147483647L
  private val Mix = 2654435761L
  val Chars = 24

  /** Spark Column form: hash in [0, P). */
  def hash(x: Column): Column = {
    val padded = rpad(x, Chars, "_")
    val horner = (1 to Chars).foldLeft(lit(0L): Column) { (acc, i) =>
      (acc * lit(31L) + ascii(substring(padded, i, 1)).cast("long")) % lit(P)
    }
    (horner * lit(Mix)) % lit(P)
  }

  /** DuckDB SQL form over expression `x` — identical arithmetic. */
  def duckHash(x: String): String = {
    val padded = s"rpad($x, $Chars, '_')"
    val horner = (1 to Chars).foldLeft("CAST(0 AS BIGINT)") { (acc, i) =>
      s"((($acc) * 31 + CAST(ascii(substring($padded, $i, 1)) AS BIGINT)) % $P)"
    }
    s"((($horner) * $Mix) % $P)"
  }
}
