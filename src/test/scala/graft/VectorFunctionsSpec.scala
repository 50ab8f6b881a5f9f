package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** HOF vector functions, their native codegen'd Expression counterparts,
  * and the fixture invariant the search path relies on (embeddings are
  * pre-normalized so dot ≡ cosine — claimed in [[graft.operators.VectorSearch]],
  * asserted here as promised). */
class VectorFunctionsSpec extends SparkSpec {

  test("dot / l2Norm / cosine on known vectors") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, -5.0f, 6.0f))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.dot($"a", $"b").as("d"),
      VectorFunctions.l2Norm($"a").as("na"),
      VectorFunctions.cosine($"a", $"b").as("c")).collect().head
    assert(r.getAs[Double]("d") == 12.0) // 4 - 10 + 18
    assert(math.abs(r.getAs[Double]("na") - math.sqrt(14.0)) < 1e-12)
    val expected = 12.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(r.getAs[Double]("c") - expected) < 1e-12)
  }

  test("native vec_dot/vec_norm expressions == HOF forms on the fixture") {
    import spark.implicits._
    val e = Tables(spark, sf0001, "embeddings")
    val a = e.select($"vec_id".as("qid"), $"embedding".as("qe")).filter($"qid" < 8)
    val pairs = a.crossJoin(
      e.select($"vec_id".as("did"), $"embedding".as("de")).filter($"did" < 30))
    val diff = pairs.select(
      VectorFunctions.dot($"qe", $"de").as("hof"),
      Functions.vecDot($"qe", $"de").as("native"),
      VectorFunctions.l2Norm($"qe").as("hofN"),
      Functions.vecNorm($"qe").as("nativeN"))
    // Both accumulate double in array order → bitwise equality expected.
    assert(diff.filter($"hof" =!= $"native" || $"hofN" =!= $"nativeN").count() == 0)
    assert(diff.count() == 8 * 30)
  }

  test("vec_dot is callable from SQL") {
    val r = spark.sql("SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d")
      .collect().head.getDouble(0)
    assert(r == 11.0)
  }

  test("l2Normalize produces unit vectors") {
    import spark.implicits._
    val df = Seq(Tuple1(Array(3.0f, 4.0f))).toDF("a")
    val n = df.select(VectorFunctions.l2Norm(VectorFunctions.l2Normalize($"a")).as("n"))
      .collect().head.getAs[Double]("n")
    assert(math.abs(n - 1.0) < 1e-12)
  }

  test("fixture invariant: embedding tables are L2-pre-normalized (dot ≡ cosine)") {
    import spark.implicits._
    for (d <- Seq(sf0001, sf001)) {
      val bounds = Tables(spark, d, "embeddings")
        .select(VectorFunctions.l2Norm($"embedding").as("n"))
        .agg(min($"n").as("lo"), max($"n").as("hi")).collect().head
      assert(math.abs(bounds.getAs[Double]("lo") - 1.0) < 1e-5, s"min norm in $d")
      assert(math.abs(bounds.getAs[Double]("hi") - 1.0) < 1e-5, s"max norm in $d")
    }
  }
}
