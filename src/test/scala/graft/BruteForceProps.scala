package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.BruteForce

/** ScalaCheck: the distributed kernel must agree with a plain-Scala
  * reference top-k on arbitrary vector sets — scores (double, array
  * order), ranks, and the (score desc, id asc) tie-break. */
object BruteForceProps extends Properties("BruteForce") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.shared

  private val vecGen: Gen[Array[Float]] =
    Gen.choose(2, 6).flatMap { d =>
      Gen.listOfN(d, Gen.choose(-8, 8).map(_.toFloat / 4.0f)).map(_.toArray)
    }

  private val caseGen: Gen[(Seq[(Long, Array[Float])], Seq[(Long, Array[Float])], Int)] =
    for {
      dim <- Gen.choose(2, 6)
      nc <- Gen.choose(1, 40)
      nq <- Gen.choose(1, 5)
      k <- Gen.choose(1, 8)
      cvs <- Gen.listOfN(nc, Gen.listOfN(dim, Gen.choose(-8, 8).map(_.toFloat / 4.0f)))
      qvs <- Gen.listOfN(nq, Gen.listOfN(dim, Gen.choose(-8, 8).map(_.toFloat / 4.0f)))
    } yield (
      cvs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) },
      qvs.zipWithIndex.map { case (v, i) => (100L + i, v.toArray) },
      k)

  private def refTopK(
      corpus: Seq[(Long, Array[Float])],
      queries: Seq[(Long, Array[Float])],
      k: Int): Set[(Long, Long, Long)] =
    queries.flatMap { case (qid, qv) =>
      corpus
        .map { case (did, dv) =>
          var s = 0.0
          var i = 0
          val n = math.min(qv.length, dv.length)
          while (i < n) { s += qv(i).toDouble * dv(i).toDouble; i += 1 }
          (did, s)
        }
        .sortBy { case (did, s) => (-s, did) }
        .take(k)
        .zipWithIndex
        .map { case ((did, _), pos) => (qid, (pos + 1).toLong, did) }
    }.toSet

  property("kernel == plain-Scala reference on arbitrary inputs") =
    Prop.forAll(caseGen) { case (corpus, queries, k) =>
      import spark.implicits._
      val ds = corpus.toDS().repartition(3)
      val got = BruteForce.topK(ds, queries.toArray, k, excludeSelf = false)
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"), r.getAs[Long]("doc_id")))
        .toSet
      got == refTopK(corpus, queries, k)
    }
}
