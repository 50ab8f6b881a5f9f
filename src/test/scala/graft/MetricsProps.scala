package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.Metrics

/** ScalaCheck properties for the metric operators (SURVEY §5.2): bounds,
  * monotonicity of recall in K (visible in every reference golden report,
  * e.g. reports/hnswlib/hnswlib_20251002_184417.json:12-19), and MRR
  * bounds. Frames are small (Spark job per case) — capped case count. */
object MetricsProps extends Properties("Metrics") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = SparkSpec.shared
  import spark.implicits._

  /** Generate a hit frame: up to 4 queries, each with k retrieved rows at
    * ranks 1..k, random hit flags, n_rel ≥ max(1, hits). */
  private val hitFrameGen: Gen[Seq[(Long, Long, Int, Long)]] =
    for {
      nq <- Gen.choose(1, 4)
      rows <- Gen.sequence[Seq[Seq[(Long, Long, Int, Long)]], Seq[(Long, Long, Int, Long)]](
        (1 to nq).map { q =>
          for {
            k <- Gen.choose(1, 8)
            hits <- Gen.listOfN(k, Gen.oneOf(0, 1))
            extra <- Gen.choose(0, 5)
          } yield {
            val nRel = math.max(1, hits.sum + extra).toLong
            hits.zipWithIndex.map { case (h, i) => (q.toLong, (i + 1).toLong, h, nRel) }
          }
        })
    } yield rows.flatten

  property("recall ∈ [0,1] and monotone non-decreasing in K") = Prop.forAll(hitFrameGen) { rows =>
    val df = rows.toDF("query_id", "rnk", "hit", "n_rel")
    val ks = Seq(1, 3, 8)
    val r = Metrics.recallAtK(df, ks).collect().head
    val vals = ks.map(k => r.getAs[Double](s"recall_$k"))
    vals.forall(v => v >= 0.0 && v <= 1.0) &&
      vals.sliding(2).forall { case Seq(a, b) => a <= b; case _ => true }
  }

  property("precision ∈ [0,1]") = Prop.forAll(hitFrameGen) { rows =>
    val df = rows.toDF("query_id", "rnk", "hit", "n_rel")
    val p = Metrics.precisionAtK(df, Seq(1, 5)).collect().head
    Seq("precision_1", "precision_5").map(p.getAs[Double]).forall(v => v >= 0.0 && v <= 1.0)
  }

  property("mrr ∈ [0,1]; 0 iff no query has any hit") = Prop.forAll(hitFrameGen) { rows =>
    val df = rows.toDF("query_id", "rnk", "hit", "n_rel")
    val m = Metrics.mrr(df).collect().head.getAs[Double]("mrr")
    val anyHit = rows.exists(_._3 == 1)
    m >= 0.0 && m <= 1.0 && (if (anyHit) m > 0.0 else m == 0.0)
  }
}
