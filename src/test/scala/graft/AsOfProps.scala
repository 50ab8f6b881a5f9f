package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.Temporal

/** ScalaCheck: the union + running-last window as-of join must agree with
  * the naive per-row reference semantics on arbitrary inputs — inclusive
  * ties, greatest-tieBreak-wins among equal timestamps, null for
  * unmatched lefts. */
object AsOfProps extends Properties("asofJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.shared

  private val caseGen: Gen[(Seq[(Long, Long, Long)], Seq[(Long, Long, Long)])] =
    for {
      nl <- Gen.choose(1, 12)
      nr <- Gen.choose(0, 12)
      lks <- Gen.listOfN(nl, Gen.choose(1L, 4L))
      lts <- Gen.listOfN(nl, Gen.choose(0L, 20L))
      rks <- Gen.listOfN(nr, Gen.choose(1L, 4L))
      rts <- Gen.listOfN(nr, Gen.choose(0L, 20L))
    } yield (
      lks.zip(lts).zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
      rks.zip(rts).zipWithIndex.map { case ((k, t), i) => (k, t, 1000L + i) })

  private def refAsof(
      left: Seq[(Long, Long, Long)],   // (id, k, ts)
      right: Seq[(Long, Long, Long)]): Map[Long, Long] = // id -> rid or -1
    left.map { case (id, k, ts) =>
      val candidates = right.filter(r => r._1 == k && r._2 <= ts)
      if (candidates.isEmpty) id -> -1L
      else id -> candidates.maxBy(r => (r._2, r._3))._3 // latest ts, greatest tieBreak
    }.toMap

  property("matches the naive reference on arbitrary frames") =
    Prop.forAll(caseGen) { case (l, r) =>
      import spark.implicits._
      val left = l.toDF("id", "k", "ts")
      val right = r.toDF("k", "ts", "rid")
      val got = Temporal
        .asofJoin(left, right, "k", "ts", Seq("rid"), "rid")
        .select($"id", $"rid")
        .collect()
        .map(row => row.getLong(0) -> (if (row.isNullAt(1)) -1L else row.getLong(1)))
        .toMap
      val want = refAsof(l, r)
      Prop(got == want) :| s"got $got want $want"
    }
}
