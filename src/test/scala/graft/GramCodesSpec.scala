package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.functions._

import graft.functions.TriGramCodes

/** Pins [[graft.functions.TriGramCodes]] — the one-pass codegen trigram
  * kernel that replaced q62's interpreted HOF form (round 16) — against
  * that HOF form, which stays here as the correctness oracle. */
class GramCodesSpec extends SparkSpec {

  private def fast(c: Column): Column =
    GraftInternal.column(TriGramCodes(GraftInternal.expression(c)))

  /** q62's original expression, verbatim. */
  private def hof(t: Column): Column =
    when(length(t) >= 3,
      transform(sequence(lit(1), length(t) - 2), i =>
        ascii(t.substr(i, lit(1))) * 65536L +
          ascii(t.substr(i + 1, lit(1))) * 256L +
          ascii(t.substr(i + 2, lit(1)))))
      .otherwise(array().cast("array<long>"))

  private val edge = Seq(
    "", "a", "ab", "abc", "abcd", "hello world", "  spaced  out  ",
    "tab\tand\nnewline", "ascii only text 0123456789",
    "café au lait", "éééé", // 2-byte UTF-8
    "丁丂七丄", // 3-byte UTF-8
    "a😀b😁c", // supplementary (4-byte) code points
    "mixed ü中 ascii")

  test("TriGramCodes == the interpreted HOF form on edge strings and the fixture") {
    import spark.implicits._
    val edgeDf = edge.toDF("text")
    val fixture = Tables(spark, sf001, "documents").select(lower($"text").as("text"))
    for (df <- Seq(edgeDf, fixture)) {
      val mismatch = df
        .select(hof($"text").as("a"), fast($"text").as("b"))
        .filter(not($"a" <=> $"b"))
        .count()
      assert(mismatch === 0)
    }
  }

  test("TriGramCodes eval (interpreted) matches codegen") {
    import spark.implicits._
    // a projection too wide for WholeStageCodegen is hard to force; pin
    // the interpreted path directly via the expression's eval instead
    val rows = edge.map(org.apache.spark.unsafe.types.UTF8String.fromString)
    val fromEval = rows.map { s =>
      graft.functions.GramCodes.triCodes(s).toLongArray().toSeq
    }
    val fromDf = edge.toDF("text")
      .select(fast($"text").as("b")).as[Seq[Long]].collect().toSeq
    assert(fromEval === fromDf)
  }

  test("TriGramCodes is null-safe (null in, null out; explode drops both forms)") {
    import spark.implicits._
    val df = Seq(Some("abc"), None, Some("xy")).toDF("text")
    val viaFast = df.select(explode(fast($"text"))).as[Long].collect().toSeq
    val viaHof = df.select(explode(hof($"text"))).as[Long].collect().toSeq
    assert(viaFast === viaHof)
  }
}
