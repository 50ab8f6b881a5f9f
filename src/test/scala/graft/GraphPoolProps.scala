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

  // ------------------------------------------------- probe-row SQ8
  // pqKnnGraph ships its probe rows SQ8-quantized (round 16) — the
  // shuffle-width win is only safe if the byte can never wrap and the
  // dequantized vector stays within half a quantum of the input.
  // Adversarial component gen: denormals, huge/tiny magnitudes, exact
  // zeros — the regimes where scale division misbehaves.
  private val componentGen: Gen[Float] = Gen.oneOf(
    Gen.choose(-1.0, 1.0).map(_.toFloat),
    Gen.choose(-1e30, 1e30).map(_.toFloat),
    Gen.choose(-1e-40, 1e-40).map(_.toFloat), // subnormals: mx/127 can underflow
    Gen.const(0f),
    Gen.const(java.lang.Float.MIN_VALUE),
    Gen.const(-java.lang.Float.MIN_VALUE),
    Gen.const(java.lang.Float.MAX_VALUE),
    Gen.const(-java.lang.Float.MAX_VALUE))

  private val vecGen: Gen[Array[Float]] =
    Gen.choose(1, 64).flatMap(n => Gen.listOfN(n, componentGen)).map(_.toArray)

  property("sq8: bytes never wrap, round-trip error <= scale/2, deterministic") =
    Prop.forAll(vecGen) { v =>
      val (scale, q) = VectorBlocks.sq8Quantize(v, 0, v.length)
      val (scale2, q2) = VectorBlocks.sq8Quantize(v, 0, v.length)
      val noWrap = q.forall(b => b >= -127 && b <= 127)
      // error computed in DOUBLE: q*scale in float can overflow to Inf
      // at MAX_VALUE magnitudes, which is a test artifact, not a claim
      // the kernel needs (unit-norm embeddings sit ~38 decades below)
      val halfQuantum = scale.toDouble / 2.0
      val maxErr = v.indices.map(i => math.abs(q(i) * scale.toDouble - v(i))).max
      Prop(noWrap) :| s"wrap: scale=$scale q=${q.mkString(",")}" &&
        Prop(scale > 0f && !scale.isNaN) :| s"scale=$scale" &&
        // half a quantum plus the scale division's own rounding slack
        Prop(maxErr <= halfQuantum * 1.0001) :|
          s"err=$maxErr > scale/2=$halfQuantum" &&
        Prop(scale == scale2 && java.util.Arrays.equals(q, q2)) :| "determinism"
    }

  property("sq8: offset addressing quantizes exactly the [off, off+dim) slice") =
    Prop.forAll(vecGen, vecGen, vecGen) { (pre, v, post) =>
      val flat = pre ++ v ++ post
      val (sA, qA) = VectorBlocks.sq8Quantize(flat, pre.length, v.length)
      val (sB, qB) = VectorBlocks.sq8Quantize(v, 0, v.length)
      Prop(sA == sB && java.util.Arrays.equals(qA, qB)) :| "slice independence"
    }
}
