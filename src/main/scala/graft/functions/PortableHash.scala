package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A string hash defined in plain arithmetic that Spark and DuckDB
  * evaluate identically (the cross-engine oracle contract): base-31
  * polynomial over the first 8 chars (padded with '_'), reduced mod
  * P = 2^31−1, then a Knuth multiplicative mix mod P. All intermediate
  * products stay below 2^63 (max ≈ (P−1) × 2654435761 ≈ 5.7e18), so no
  * overflow under Spark ANSI mode or DuckDB BIGINT. ASCII inputs only
  * (the fixtures are verified pure ASCII; `ascii()` semantics diverge
  * across engines beyond code point 127).
  */
object PortableHash {

  val P: Long = 2147483647L
  private val Mix = 2654435761L

  /** Spark Column form: hash in [0, P). */
  def hash(x: Column): Column = {
    val padded = concat(x, lit("________"))
    val poly = (1 to 8)
      .map(i => ascii(substring(padded, i, 1)).cast("long") * lit(math.pow(31, i - 1).toLong))
      .reduce(_ + _)
    ((poly % lit(P)) * lit(Mix)) % lit(P)
  }

  /** DuckDB SQL form over expression `x` — identical arithmetic. */
  def duckHash(x: String): String = {
    val poly = (1 to 8)
      .map(i => s"CAST(ascii(substring($x || '________', $i, 1)) AS BIGINT) * ${math.pow(31, i - 1).toLong}")
      .mkString("(", " + ", ")")
    s"((($poly % $P) * $Mix) % $P)"
  }
}
