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

  test("WordTriShingles == the interpreted HOF form on edge and fixture docs") {
    import spark.implicits._
    def hofShingles(text: Column): Column = {
      val ws = split(trim(text), "\\s+")
      val n = size(ws)
      when(n >= 3,
        array_distinct(transform(
          sequence(lit(1), n - 2),
          i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2)))))
        .otherwise(array().cast("array<string>"))
    }
    def fastShingles(text: Column): Column =
      GraftInternal.column(graft.functions.WordTriShingles(
        GraftInternal.expression(split(trim(text), "\\s+"))))
    val edgeDocs = Seq(
      "", "one", "one two", "one two three", "a b c d e",
      "dup dup dup dup dup", // repeated shingles → distinct must dedup
      "x y z x y z x y z", // repeats later — first-occurrence order matters
      "  leading and trailing  ", "tabs\tand spaces mixed")
      .toDF("text")
    val fixture = Tables(spark, sf001, "documents").select($"text")
    for (df <- Seq(edgeDocs, fixture)) {
      // exact ARRAY equality — content AND order (array_distinct keeps
      // first occurrence; the kernel must too)
      val mismatch = df
        .select(hofShingles($"text").as("a"), fastShingles($"text").as("b"))
        .filter(not($"a" <=> $"b"))
        .count()
      assert(mismatch === 0)
    }
  }

  test("PortableHashExpr == the 24-node expression chain on fixture tokens and edges") {
    import spark.implicits._
    val edge = Seq("", "_", "a", "exactly_24_chars_stringg", "longer than twenty four characters total",
      "short", "with spaces in it", "0123456789", "über-token", "丁丂七", "a😀b")
      .toDF("x")
    val fixtureTokens = Tables(spark, sf001, "documents")
      .select(explode(split(trim($"text"), "\\s+")).as("x"))
      .filter(length($"x") > 0)
    val fixtureShingles = Tables(spark, sf001, "documents")
      .select(explode(graft.operators.TextPipeline.shingleArray($"text")).as("x"))
    for (df <- Seq(edge, fixtureTokens, fixtureShingles)) {
      val mismatch = df
        .select(
          graft.functions.PortableHash.hashHof($"x").as("a"),
          graft.functions.PortableHash.hash($"x").as("b"))
        .filter(not($"a" <=> $"b"))
        .count()
      assert(mismatch === 0)
    }
  }

  test("SortedLongIntersectSize == size(array_intersect) on generated sorted-distinct arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { _ =>
      def arr() = Array.fill(rnd.nextInt(60))(rnd.nextInt(40).toLong).distinct.sorted.toSeq
      (arr(), arr())
    }
    val df = rows.toDF("a", "b")
    val kernel = GraftInternal.column(graft.functions.SortedLongIntersectSize(
      GraftInternal.expression($"a"), GraftInternal.expression($"b")))
    val mismatch = df
      .select(size(array_intersect($"a", $"b")).as("x"), kernel.as("y"))
      .filter(not($"x" <=> $"y"))
      .count()
    assert(mismatch === 0)
  }

  test("TriGramCodes is null-safe (null in, null out; explode drops both forms)") {
    import spark.implicits._
    val df = Seq(Some("abc"), None, Some("xy")).toDF("text")
    val viaFast = df.select(explode(fast($"text"))).as[Long].collect().toSeq
    val viaHof = df.select(explode(hof($"text"))).as[Long].collect().toSeq
    assert(viaFast === viaHof)
  }
}
