package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.operators.VectorBlocks

/** ScalaCheck: the graph build's counting-select pool (threshold +
  * id-order quota at the boundary, [[VectorBlocks.poolThreshold]]) must
  * select EXACTLY the members a (-hd, idx)-ordered bounded heap would —
  * it replaced that heap in pqKnnGraph's stage-1 hot loop (round 12),
  * so a boundary bug here silently changes every nominated edge pool. */
object GraphPoolProps extends Properties("GraphPool") {

  private val caseGen: Gen[(Array[Int], Int, Int)] =
    for {
      maxHd <- Gen.choose(1, 48)
      n <- Gen.choose(1, 200)
      hds <- Gen.listOfN(n, Gen.choose(0, maxHd))
      hpool <- Gen.choose(1, n)
    } yield (hds.toArray, hpool, maxHd)

  property("threshold+quota selection == (-hd, idx)-ordered bounded heap") =
    Prop.forAll(caseGen) { case (hds, hpool, maxHd) =>
      // reference: what a bounded heap ordered by (-hd, idx) retains
      val want = hds.zipWithIndex
        .sortBy { case (hd, idx) => (hd, idx) }
        .take(hpool)
        .map(_._2)
        .toSet
      // counting-select, exactly as the reducer composes it
      val hist = new Array[Int](maxHd + 2)
      hds.foreach(hd => hist(hd) += 1)
      val (t, q0) = VectorBlocks.poolThreshold(hist, hpool, maxHd)
      var quota = q0
      val got = scala.collection.mutable.Set.empty[Int]
      var i = 0
      while (i < hds.length) {
        val hd = hds(i)
        if (hd < t || (hd == t && quota > 0)) {
          if (hd == t) quota -= 1
          got += i
        }
        i += 1
      }
      Prop(got == want) :| s"got=$got want=$want t=$t q0=$q0" &&
        Prop(got.size == math.min(hpool, hds.length)) :| "pool size"
    }
}
