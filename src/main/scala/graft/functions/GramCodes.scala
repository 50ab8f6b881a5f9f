package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Packed char-trigram codes of a string in ONE codegen-friendly pass —
  * the whole-stage-codegen replacement for q62's interpreted
  * higher-order form
  *
  *   `transform(sequence(1, length(t) - 2), i =>
  *      ascii(substr(t, i, 1))*65536 + ascii(substr(t, i+1, 1))*256
  *        + ascii(substr(t, i+2, 1)))`
  *
  * which evaluates ~15 interpreted expression nodes PER GRAM (`transform`
  * is CodegenFallback, and each `substr` re-scans the string to find the
  * code-point offset): measured 4-5 µs/gram — the dominant cost of q62 at
  * sf0.1 (~7 s for 1.5M grams, guide §1.2 "per-task work"). This
  * expression walks the UTF-8 bytes once per ROW, so the per-gram cost is
  * a rolling-window multiply-add.
  *
  * Value semantics match the HOF form exactly: per code-point position,
  * the value is Spark `Ascii`'s — the position's full code point
  * (`ascii('😀')` = 128512; the byte value on ASCII, U+FFFD replacement
  * on invalid bytes); codes are `v_i·2^16 + v_{i+1}·2^8 +
  * v_{i+2}` for i in [0, numChars-3]; fewer than 3 chars yields the empty
  * array. The ONLY intended divergence: NULL input evaluates to NULL
  * here, where the `when(length >= 3, …).otherwise(empty)` wrapper gave
  * an empty array — identical downstream of the `explode` both paths
  * feed (neither emits a row). GramCodesSpec pins all of this against
  * the HOF form, eval vs codegen.
  */
case class TriGramCodes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tri_gram_codes needs a STRING arg, got $other")
  }

  override protected def nullSafeEval(s: Any): Any =
    GramCodes.triCodes(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static call per ROW (the array is built in compiled scala, not
    // per-element generated java) — the point is escaping the interpreted
    // per-element HOF path, not inlining the loop
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramCodes.triCodes($c);")

  override protected def withNewChildInternal(newChild: Expression): TriGramCodes =
    copy(child = newChild)
}

/** Distinct word-3-gram shingles of a token array in ONE pass — the
  * codegen replacement for the shingle HOF
  *
  *   `when(n >= 3, array_distinct(transform(sequence(1, n - 2), i =>
  *      concat_ws(" ", element_at(ws,i), element_at(ws,i+1),
  *                element_at(ws,i+2))))).otherwise(empty)`
  *
  * whose per-shingle interpreted evaluation (transform is
  * CodegenFallback) was a top task-CPU cost of the whole near-dup family
  * (q21-q26, q46-q49, q75, q79 share the memoized shingle frame).
  * Semantics pinned by GramCodesSpec against the HOF form: shingles are
  * `UTF8String.concatWs` (null words skipped — concat_ws semantics) and
  * dedup preserves FIRST-occurrence order exactly like `array_distinct`.
  * NULL input evaluates to NULL (HOF form: empty array) — identical
  * downstream of the `explode` both feed.
  */
case class WordTriShingles(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_tri_shingles needs an ARRAY<STRING> arg, got $other")
  }

  override protected def nullSafeEval(ws: Any): Any =
    GramCodes.triShingles(ws.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramCodes.triShingles($c);")

  override protected def withNewChildInternal(newChild: Expression): WordTriShingles =
    copy(child = newChild)
}

/** Static kernel for [[TriGramCodes]] / [[WordTriShingles]] (plain object
  * with no companion class → Java-visible static forwarder, callable
  * from janino). */
object GramCodes {

  private val Space = UTF8String.fromString(" ")

  /** Distinct word-3-gram shingles, first-occurrence order. */
  def triShingles(ws: ArrayData): ArrayData = {
    val n = ws.numElements()
    if (n < 3)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + 2 < n) {
      // concat_ws semantics: null inputs skipped, no doubled separator
      seen.add(UTF8String.concatWs(Space,
        ws.getUTF8String(i), ws.getUTF8String(i + 1), ws.getUTF8String(i + 2)))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  private val Empty = UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)

  /** Packed trigram codes of `s`; the empty array when `numChars < 3`. */
  def triCodes(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    // pass 1: count code points (same walk as UTF8String.numChars)
    var n = 0
    var off = 0
    while (off < nb) {
      off += UTF8String.numBytesForFirstByte(bytes(off))
      n += 1
    }
    if (n < 3) return Empty
    // pass 2: per-char Ascii value — byte value on the ASCII fast path,
    // Spark Ascii's substring(p,p+1).toString.charAt(0) otherwise
    val vals = new Array[Int](n)
    var i = 0
    off = 0
    while (off < nb && i < n) {
      val b = bytes(off)
      val len = UTF8String.numBytesForFirstByte(b)
      vals(i) =
        if ((b & 0x80) == 0) b.toInt
        else new String(bytes, off, math.min(len, nb - off),
          java.nio.charset.StandardCharsets.UTF_8).codePointAt(0)
      off += len
      i += 1
    }
    val out = new Array[Long](n - 2)
    var j = 0
    while (j < n - 2) {
      out(j) = vals(j) * 65536L + vals(j + 1) * 256L + vals(j + 2)
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
