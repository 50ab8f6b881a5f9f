package graft

import org.apache.spark.sql.functions._

import graft.functions.{HashProjectionEncoder, VectorFunctions}

/** The hashing-trick encoder must behave like an embedding: unit-norm
  * output, determinism, and SEMANTIC signal — near-duplicate documents
  * (the planted Jaccard pairs) must land measurably closer in cosine
  * space than random pairs. */
class FeaturizerSpec extends SparkSpec {

  private val enc = HashProjectionEncoder(16)

  test("encoded vectors are unit-norm and deterministic") {
    import spark.implicits._
    val e = enc.encode(Tables(spark, sf001, "documents"), "text", "emb")
      .select($"doc_id", $"emb")
    val norms = e.select(VectorFunctions.l2Norm($"emb").as("n"))
      .agg(min($"n").as("lo"), max($"n").as("hi")).collect().head
    assert(math.abs(norms.getAs[Double]("lo") - 1.0) < 1e-9)
    assert(math.abs(norms.getAs[Double]("hi") - 1.0) < 1e-9)
    val a = e.orderBy($"doc_id").limit(5).collect().map(_.getSeq[Double](1))
    val b = e.orderBy($"doc_id").limit(5).collect().map(_.getSeq[Double](1))
    assert(a.zip(b).forall { case (x, y) => x == y })
  }

  test("near-dup documents are closer in encoder space than random pairs") {
    import spark.implicits._
    val emb = enc.encode(Tables(spark, sf001, "documents"), "text", "emb")
      .select($"doc_id", $"emb").cache()
    def cosOf(pairs: org.apache.spark.sql.DataFrame): Double =
      pairs
        .join(emb.select($"doc_id".as("doc_a"), $"emb".as("ea")), Seq("doc_a"))
        .join(emb.select($"doc_id".as("doc_b"), $"emb".as("eb")), Seq("doc_b"))
        .select(avg(VectorFunctions.dot($"ea", $"eb")).as("c"))
        .collect().head.getAs[Double]("c")
    val dupPairs = SparkEntry.queries("q22_jaccard_neardup")(spark, sf001)
      .select($"doc_a", $"doc_b")
    val randomPairs = Tables(spark, sf001, "documents")
      .select($"doc_id".as("doc_a"))
      .crossJoin(Tables(spark, sf001, "documents").select($"doc_id".as("doc_b")))
      .filter($"doc_a" + 137 === $"doc_b") // arbitrary disjoint offset pairs
    val dupCos = cosOf(dupPairs)
    val randCos = cosOf(randomPairs)
    assert(dupCos > randCos + 0.1,
      s"no semantic signal: dup=$dupCos rand=$randCos")
  }
}
