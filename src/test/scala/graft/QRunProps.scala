package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.operators.VectorBlocks.QRun

/** ScalaCheck: the treeReduce merge element must agree with the plain
  * sort-take reference on arbitrary runs — it is the step that turns
  * per-partition candidate sets into the global answer, so an ordering
  * bug here silently corrupts every fused-kernel result. */
object QRunProps extends Properties("QRun") {

  private val runGen: Gen[QRun] =
    for {
      n <- Gen.choose(0, 30)
      entries <- Gen.listOfN(n, for {
        s <- Gen.choose(-16, 16).map(_.toDouble / 4.0)
        id <- Gen.choose(0L, 40L)
      } yield (s, id))
    } yield {
      // runs arrive sorted desc (score desc, id asc) — the heap contract
      val sorted = entries.distinct.sortBy { case (s, i) => (-s, i) }
      QRun(sorted.map(_._1).toArray, sorted.map(_._2).toArray)
    }

  property("merge == sort-take over the concatenation") =
    Prop.forAll(runGen, runGen, Gen.choose(1, 20)) { (a, b, r) =>
      val got = QRun.merge(a, b, r)
      val want = (a.scores.zip(a.ids) ++ b.scores.zip(b.ids))
        .sortBy { case (s, i) => (-s, i) }
        .take(r)
      got.scores.toSeq == want.map(_._1).toSeq && got.ids.toSeq == want.map(_._2).toSeq
    }

  property("merge is commutative on disjoint-id runs") =
    Prop.forAll(runGen, runGen, Gen.choose(1, 20)) { (a, b0, r) =>
      // shift b's ids out of a's range so ties can't depend on source
      val b = QRun(b0.scores, b0.ids.map(_ + 1000L))
      val ab = QRun.merge(a, b, r)
      val ba = QRun.merge(b, a, r)
      ab.ids.toSeq == ba.ids.toSeq && ab.scores.toSeq == ba.scores.toSeq
    }
}
