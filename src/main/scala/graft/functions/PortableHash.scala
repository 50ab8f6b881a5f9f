package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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
  *
  * Spark-side implementation (round 16, guide §1.2 "per-task work"): the
  * original Column form built a 24-deep `ascii(substring(rpad(x),i,1))`
  * chain — each `substring` re-walks the string to char i (O(Chars²)
  * byte-steps) and each codegen'd `Ascii` round-trips through
  * `UTF8String.toString` (sampled as the top task-CPU frames of q79/q73:
  * `UTF8String.toString`/`substring`/`getNumChars`). [[PortableHashExpr]]
  * computes the identical value in ONE walk over the UTF-8 bytes;
  * PortableHashSpec pins value equality against the retained HOF chain
  * ([[hashHof]]) on fixtures and edge strings. The DuckDB twin
  * [[duckHash]] is untouched.
  */
object PortableHash {

  val P: Long = 2147483647L
  private val Mix = 2654435761L
  val Chars = 24

  /** Spark Column form: hash in [0, P) — one-pass codegen expression. */
  def hash(x: Column): Column =
    org.apache.spark.sql.GraftInternal.column(
      PortableHashExpr(org.apache.spark.sql.GraftInternal.expression(x)))

  /** The original 24-node expression chain — kept as the parity oracle
    * for PortableHashSpec (it IS the published cross-engine contract,
    * token for token with [[duckHash]]). */
  private[graft] def hashHof(x: Column): Column = {
    val padded = rpad(x, Chars, "_")
    val horner = (1 to Chars).foldLeft(lit(0L): Column) { (acc, i) =>
      (acc * lit(31L) + ascii(substring(padded, i, 1)).cast("long")) % lit(P)
    }
    (horner * lit(Mix)) % lit(P)
  }

  /** One-pass kernel: Horner over the first [[Chars]] code points
    * (Spark `ascii` values — full code point, byte on ASCII), '_'-padded
    * past the end, then the Knuth mix. Static forwarder (object with no
    * companion class) so janino can call it. */
  def hashUtf8(s: UTF8String): Long = {
    val bytes = s.getBytes
    val nb = bytes.length
    var acc = 0L
    var off = 0
    var i = 0
    while (i < Chars) {
      var v = 95 // '_' pad
      if (off < nb) {
        val b = bytes(off)
        if ((b & 0x80) == 0) { v = b.toInt; off += 1 }
        else {
          val len = UTF8String.numBytesForFirstByte(b)
          v = new String(bytes, off, math.min(len, nb - off),
            java.nio.charset.StandardCharsets.UTF_8).codePointAt(0)
          off += len
        }
      }
      acc = (acc * 31L + v) % P
      i += 1
    }
    (acc * Mix) % P
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

/** Codegen wrapper for [[PortableHash.hashUtf8]]. */
case class PortableHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"portable_hash needs a STRING arg, got $other")
  }

  override protected def nullSafeEval(s: Any): Any =
    PortableHash.hashUtf8(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PortableHash.hashUtf8($c);")

  override protected def withNewChildInternal(newChild: Expression): PortableHashExpr =
    copy(child = newChild)
}
